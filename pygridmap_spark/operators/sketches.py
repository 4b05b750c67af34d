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


# Bloom words carry 63 usable bits (positions 0..62): bit 63 stays clear
# because a signed 64-bit left shift by 63 overflows in DuckDB (the oracle
# engine), and the sketch contract is bit-for-bit cross-engine parity.
BLOOM_WORD_BITS = 63


def _bloom_bit_cols(item, k: int, n_bits: int):
    """The k probe BIT POSITIONS of the Bloom filter: 60-bit md5 prefix of
    ``'bf{r}:{item}'`` mod n_bits — the same oracle-checkable-hash idiom
    as the count-min probes (md5 + conv exist in both Spark and DuckDB,
    15 hex chars keep the value inside a signed long on every engine)."""
    cols = []
    for r in range(k):
        hx = F.md5(F.concat(F.lit(f"bf{r}:"), item))
        cols.append(
            F.conv(F.substring(hx, 1, 15), 16, 10).cast("long") % F.lit(n_bits)
        )
    return cols


def bloom_sketch(
    df: DataFrame,
    item_col: str,
    words: int = 1024,
    k: int = 4,
    by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Bloom filter (Bloom 1970, public) of the ``item_col`` value SET as
    a ``(*by, word, bits)`` table — the MEMBERSHIP member of the sketch
    family next to HLL (distinct counts), count-min (frequencies) and HDR
    (quantiles). m = words*63 bits, k probes per item; no false
    negatives ever, false positives at the standard (1-e^(-kn/m))^k rate.

    Scale shape: ONE partial-aggregated shuffle whose key space is AT
    MOST ``words`` per group — map-side ``bit_or`` collapses any corpus
    to a fixed-size exchange, and the stored sketch is a broadcast-sized
    dimension for later membership probes (the crawl-frontier /
    seen-URL-set pattern: yesterday's sketch filters today's candidates
    without re-reading yesterday's corpus). The whole algebra is integer
    bit-ops, so the driver oracle hash-gates it rather than
    tolerance-checks it. NULL items are dropped (a NULL probes NULL)."""
    n_bits = words * BLOOM_WORD_BITS
    it = F.col(item_col)
    bits = df.filter(it.isNotNull()).select(
        *by,
        F.explode(F.array(*_bloom_bit_cols(it, k, n_bits))).alias("bit"),
    )
    return (
        bits.select(
            *by,
            F.expr(f"bit DIV {BLOOM_WORD_BITS}").alias("word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("bit") % BLOOM_WORD_BITS).cast("int"),
            ).alias("__m__"),
        )
        .groupBy(*by, "word")
        .agg(F.bit_or("__m__").alias("bits"))
    )


def bloom_merge(
    sketches: DataFrame, by: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """Union stored Bloom sketches to a coarser grouping (per-shard ->
    global, per-day -> per-month): word-wise ``bit_or`` — exact,
    associative, commutative, so ``bloom_merge(per_shard) ==
    bloom_sketch(whole input)`` row-for-row (pinned in tests). Merged
    sketches MUST share ``words``/``k`` (they are the sketch's identity,
    stored alongside it in any catalog)."""
    return sketches.groupBy(*by, "word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    words: int,
    k: int,
    by: list[str] | tuple[str, ...] = (),
    out_col: str = "maybe_present",
) -> DataFrame:
    """Membership-probe ``items`` against a Bloom sketch: TRUE iff ALL k
    probe bits are set (maybe present — FP rate per the build's n/m/k),
    FALSE means definitely absent; a NULL item verdicts NULL. Absent
    words count as zero bits, so probing an empty/partial sketch is
    well-defined. The sketch side is dimension-sized (<= ``words`` rows
    per group), so this is a broadcast join against any number of probe
    items — the scan-side pre-filter shape (join pruning without a
    shuffle)."""
    n_bits = words * BLOOM_WORD_BITS
    probes = items.select(
        *by,
        F.col(item_col),
        F.explode(
            F.array(*_bloom_bit_cols(F.col(item_col), k, n_bits))
        ).alias("bit"),
    ).select(
        *by,
        item_col,
        F.expr(f"bit DIV {BLOOM_WORD_BITS}").alias("word"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.col("bit") % BLOOM_WORD_BITS).cast("int"),
        ).alias("__m__"),
    )
    keys = [*by, "word"]
    j = probes.join(F.broadcast(sketch), on=keys, how="left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0).cast("long"))
        .bitwiseAND(F.col("__m__"))
        == F.col("__m__")
    )
    return j.groupBy(*by, item_col).agg(F.bool_and(hit).alias(out_col))


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
