"""Trajectory statistics over timestamped point streams (pings, check-ins,
request logs with geolocation): per-entity great-circle travel distance,
hop lengths, speeds.

Shape at scale: ONE exchange — the window shuffle on the entity key (the
same partitioning a downstream per-entity rollup reuses); every hop metric
is pure Catalyst trig on lag() columns (functions/geodesy.py), and the
rollup is a partial-aggregated hash agg on the already-co-located key, so
the whole operator is window-shuffle + map-side math at any corpus size.
Hop sums accumulate as DECIMAL(38,3) of mm-rounded meters (exact, order-
independent — the repo-wide invariant for cross-engine sums), cast to
double at the end.

Reference parity: pygridmap has no temporal ops (grids are static); this is
the moving-points member of the engine's webtext family — the same lag
pattern as streaming sessionization (streaming/pipeline.py) applied to
space instead of gaps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pygridmap_spark.functions import geodesy as GD


def with_hop_distance(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
    out_col: str = "hop_m",
) -> DataFrame:
    """Append the great-circle distance (meters) from each row's
    predecessor in (``entity_col`` partition, ``ts_col`` order) — null on
    each entity's first ping. ``tiebreak`` adds a second ordering column
    so equal timestamps stay deterministic (pass the event id)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    plon, plat = F.lag(lon).over(w), F.lag(lat).over(w)
    return df.withColumn(
        out_col, GD.gc_distance_m(plon, plat, F.col(lon), F.col(lat))
    )


def _exact_m(hop: Column) -> Column:
    # mm-rounded exact accumulator: order-independent across engines
    return F.round(hop, 3).cast("decimal(38,3)")


def travel_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-entity trajectory rollup: ``n_pings``, ``n_hops``,
    ``travel_m`` (exact mm-rounded sum), ``max_hop_m``. One window
    shuffle; the agg rides the window's co-partitioning."""
    hops = with_hop_distance(df, entity_col, ts_col, lon, lat, tiebreak)
    return hops.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.count("hop_m").alias("n_hops"),
        F.coalesce(F.sum(_exact_m(F.col("hop_m"))), F.lit(0).cast("decimal(38,3)"))
        .cast("double")
        .alias("travel_m"),
        F.max(F.round(F.col("hop_m"), 3)).alias("max_hop_m"),
    )


def stay_points(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    radius_m: float = 200.0,
    max_gap_s: int = 3600,
    min_dwell_s: int = 900,
    tiebreak: str | None = None,
) -> DataFrame:
    """Stay-point / dwell detection: maximal runs of consecutive pings
    where every hop stays within ``radius_m`` and no time gap exceeds
    ``max_gap_s``, kept when the run spans at least ``min_dwell_s``.
    Returns per (entity, seg_id): ``n_pings, t_start, t_end, dwell_s,
    ctr_lon, ctr_lat`` (the centroid via exact micro-degree-rounded
    decimal sums — the repo-wide cross-engine invariant).

    This is the successive-hop variant of the classic stay-point scan
    (Li et al. 2008, "Mining user similarity based on location history" —
    public; their anchor-distance variant is order-sequential and
    anti-Spark): a segment breaks on the FIRST ping that moved more than
    the radius since the previous one. For dwell detection at sensible
    ping rates the two agree; the hop form is one lag + one running sum
    in the SAME entity/ts window the hop distance already shuffled for —
    so the whole operator is still exactly ONE exchange at any scale,
    and the per-segment rollup rides the window's co-partitioning.

    Rows with NULL/NaN coordinates produce NULL hops, which BREAK the
    segment (a blind spot is not evidence of staying); filter them
    upstream if they should be transparent. seg_id numbers every raw
    segment 1..k per entity — gaps in the surviving ids reveal discarded
    travel segments, deliberately.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    hops = with_hop_distance(df, entity_col, ts_col, lon, lat, tiebreak)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_break = (
        F.col("hop_m").isNull()
        | (F.col("hop_m") > F.lit(float(radius_m)))
        | (gap_s > F.lit(int(max_gap_s)))
    )
    segd = hops.withColumn(
        "seg_id", F.sum(F.when(is_break, 1).otherwise(0)).over(w)
    )
    dec6 = lambda c: F.round(F.col(c), 6).cast("decimal(21,6)")  # noqa: E731
    out = segd.groupBy(entity_col, "seg_id").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        F.sum(dec6(lon)).alias("__slon__"),
        F.sum(dec6(lat)).alias("__slat__"),
    )
    dwell = F.unix_timestamp(F.col("t_end")) - F.unix_timestamp(F.col("t_start"))
    return (
        out.withColumn("dwell_s", dwell)
        .filter(F.col("dwell_s") >= F.lit(int(min_dwell_s)))
        .select(
            entity_col,
            "seg_id",
            "n_pings",
            "t_start",
            "t_end",
            "dwell_s",
            (F.col("__slon__").cast("double") / F.col("n_pings")).alias("ctr_lon"),
            (F.col("__slat__").cast("double") / F.col("n_pings")).alias("ctr_lat"),
        )
    )
