"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
``hll_sketch_agg`` family) — the lakehouse pre-aggregation pattern for
distinct counts at 100-TB scale.

``countDistinct`` must shuffle every distinct value; an HLL sketch
partial-aggregates to a FIXED-SIZE binary per group on the map side, and
sketches MERGE exactly (union is associative/commutative), so per-shard /
per-day rollups can be stored as columns and combined later without
touching raw data — distinct urls per domain per day -> distinct urls per
domain per month is one ``hll_union_agg`` over the stored sketches.

Estimates carry the standard HLL relative error (~1.6 % at lgK=12 /
~0.8 % at lgK=14); error bounds shrink with lgK at 2^lgK bytes per
sketch. Tested: estimate-vs-exact tolerance and the shard-merge identity
(merging per-shard sketches equals sketching the whole input EXACTLY —
the sketch is deterministic in the value set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` + its estimate.
    Output: ``(*group_cols, sketch: binary, approx_distinct: long)`` —
    keep ``sketch`` in the stored rollup so later periods can merge."""
    sk = F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    return (
        df.groupBy(*group_cols)
        .agg(sk)
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )


def merge_sketch_rollups(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union previously stored sketch rollups to a coarser grouping
    (per-day -> per-month, per-shard -> global): one ``hll_union_agg``
    over fixed-size binaries — the raw data is never re-read."""
    return (
        df.groupBy(*group_cols)
        # allowDifferentLgConfigK: rollups written in different periods may
        # have used different lgk (the function exposes it per call); the
        # union downgrades to the coarser precision instead of throwing
        .agg(F.hll_union_agg(sketch_col, F.lit(True)).alias(sketch_col))
        .withColumn("approx_distinct", F.hll_sketch_estimate(sketch_col))
    )


def _cm_probe_cols(item, depth: int, width: int):
    """The d probe columns of the count-min sketch: 60-bit md5 prefix of
    ``'cm{r}:{item}'`` mod width, one per hash row. md5 exists in BOTH
    Spark and DuckDB (the engine-wide oracle-checkable-hash idiom,
    functions/text.fingerprint), so sketches built here are bit-for-bit
    reproducible in SQL. 15 hex chars = 60 bits keeps the conv() result
    inside a signed long on every engine."""
    cols = []
    for r in range(depth):
        hx = F.md5(F.concat(F.lit(f"cm{r}:"), item))
        cols.append(
            (F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % F.lit(width))
            .cast("int")
        )
    return cols


def cm_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
    by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) of the
    ``item_col`` frequency distribution as a ``(*by, row, col, cnt)``
    table — the mergeable FREQUENCY summary next to HLL's distinct-count
    one. Point estimates overestimate only (min over d rows), with the
    standard (e/width)-mass error bound at depth-driven confidence.

    Scale shape: the facts pass is ONE partial-aggregated shuffle whose
    key space is AT MOST ``depth * width`` per group — map-side combine
    collapses any corpus, 100 TB included, to a fixed-size exchange, and
    the stored sketch is a broadcast-sized dimension for later lookups.
    Counts are exact longs (no float, no decimal needed): the whole
    sketch algebra is integer, which is what lets the driver oracle
    hash-gate it rather than tolerance-check it."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    probes = df.select(
        *by,
        F.posexplode(
            F.array(*_cm_probe_cols(F.col(item_col), depth, width))
        ).alias("row", "col"),
        w.alias("__w__"),
    )
    return probes.groupBy(*by, "row", "col").agg(F.sum("__w__").alias("cnt"))


def cm_merge(
    sketches: DataFrame, by: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """Merge stored count-min sketches to a coarser grouping (per-shard
    -> global, per-day -> per-month): cell-wise sum — exact, associative,
    commutative, so ``cm_merge(per_shard) == cm_sketch(whole input)``
    row-for-row (pinned in tests). The raw data is never re-read."""
    return sketches.groupBy(*by, "row", "col").agg(F.sum("cnt").alias("cnt"))


def cm_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int,
    width: int,
    by: list[str] | tuple[str, ...] = (),
    out_col: str = "cm_est",
) -> DataFrame:
    """Point-query ``items`` against a count-min sketch: est = min over
    the d probe cells, absent cells counting 0 (an item never sketched
    estimates 0, never NULL). ``depth``/``width`` must match the build —
    they are the sketch's identity, stored alongside it in any catalog.
    The sketch side is dimension-sized (<= depth*width rows per group),
    so this is a broadcast join against any number of probe items."""
    probes = items.select(
        *by,
        F.col(item_col),
        F.posexplode(
            F.array(*_cm_probe_cols(F.col(item_col), depth, width))
        ).alias("row", "col"),
    )
    keys = [*by, "row", "col"]
    j = probes.join(F.broadcast(sketch), on=keys, how="left")
    return j.groupBy(*by, item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(out_col)
    )
