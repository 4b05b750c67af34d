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
