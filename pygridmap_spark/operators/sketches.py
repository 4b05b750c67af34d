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
