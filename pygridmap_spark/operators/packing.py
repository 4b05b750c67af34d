"""Sequence packing for training-data preparation: map documents to
fixed-capacity training sequences by concatenate-then-split bookkeeping.

The standard LM-training layout concatenates documents (in a
deterministic order) and splits the token stream at exact ``max_tokens``
boundaries — documents MAY straddle a boundary. This operator computes,
per document, where its tokens land: first sequence id, offset within
that sequence, and how many sequences it spans. Pure window cumsum —
no Python, fully SQL-expressible (DuckDB oracle twin in the driver).

Scale: the cumulative sum runs PER SHARD (``partitionBy(shard)`` window).
A global order over 100 TB would be a total sort; sharding bounds each
window to one partition's data and is how training pipelines shard
anyway (sequences never cross file/shard boundaries). Sequence ids are
(shard, seq_id) pairs — dense within a shard, disjoint across shards.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def chunk_documents(
    df: DataFrame,
    window: int,
    overlap: int = 0,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document into windows of
    ``window`` tokens advancing by ``window - overlap`` (sliding-window
    pretraining chunks). Emits one row per chunk:
    ``(input columns, chunk_idx, chunk_start, chunk_end)`` with
    ``chunk_end = min(start + window, len)`` — the final chunk is short,
    never empty. Zero-token documents emit no chunks.

    Pure projection + ``explode`` of a per-row ``sequence`` — NO shuffle
    at any scale; chunk counts are data-parallel row arithmetic.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if not 0 <= overlap < window:
        raise ValueError(f"overlap must be in [0, window), got {overlap}")
    stride = window - overlap
    t = F.col(token_col)
    # chunks whose start < len and (start == 0 or start advances coverage):
    # n = 1 + ceil(max(len - window, 0) / stride)   for len > 0
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(t - window, F.lit(0)) / F.lit(stride)
    ).cast("long")
    # filter BEFORE the explode: zero/NULL-token rows would otherwise
    # materialize phantom exploded rows (sequence(0, -1) = [0, -1] — Spark
    # infers step -1 — and NULL tokens would slip through greatest/least's
    # NULL-skipping into a fabricated [0, window) chunk)
    out = df.filter(t.isNotNull() & (t > 0)).withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))),
    )
    start = F.col("chunk_idx") * stride
    return out.withColumns(
        {
            "chunk_start": start.cast("long"),
            "chunk_end": F.least(start + window, t).cast("long"),
        }
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Append packing coordinates for a concatenate-then-split layout:

    - ``seq_id`` — sequence index (within the shard) where the document's
      first token lands: ``floor(cum_before / max_tokens)``;
    - ``seq_offset`` — token offset of the document inside that sequence;
    - ``n_seqs`` — number of sequences the document touches (1 = fits
      without straddling).

    Documents with 0 tokens get ``n_seqs = 0`` at the boundary position.
    Deterministic given (shard_col, order_col) — re-running on any
    partitioning yields identical packing.

    The floor arithmetic goes through double division: exact while a
    shard's cumulative token count stays below 2^53 (~9e15 tokens —
    petabytes of text PER SHARD; shard finer if you ever approach it).
    ``shard_col=None`` uses a global single-partition window (a warning is
    logged) — fine for driver-scale inputs, not for a lake table; shard by
    e.g. ``F.pmod(F.xxhash64(id), F.lit(64))`` as jobs/dedup_pipeline.py
    does.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if shard_col is None:
        log.warning(
            "pack_sequences: shard_col=None plans a GLOBAL single-partition "
            "window (one reducer sorts everything) — fine at driver scale, "
            "a scale-killer on a lake table; pass shard_col (e.g. "
            "pmod(xxhash64(%s), 64))",
            order_col,
        )
        w = Window.orderBy(order_col)
    else:
        w = Window.partitionBy(shard_col).orderBy(order_col)
    cum_before = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    t = F.col(token_col)
    seq_id = F.floor(cum_before / max_tokens)
    seq_offset = cum_before % max_tokens
    last_seq = F.floor((cum_before + t - 1) / max_tokens)
    n_seqs = F.when(t <= 0, F.lit(0)).otherwise(last_seq - seq_id + 1)
    return df.withColumns(
        {
            "seq_id": seq_id.cast("long"),
            "seq_offset": seq_offset.cast("long"),
            "n_seqs": n_seqs.cast("long"),
        }
    )
