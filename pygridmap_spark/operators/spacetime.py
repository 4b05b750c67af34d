"""Space-time cube + Mann-Kendall trends — emerging-hotspot analysis.

The grid family answers "where is the mass" (`hotspots.hotspot_cells`) and
"where is it significantly hot" (`hotspots.gi_star_cells`); this module
adds the time axis: bin events into (cell, time-bin) counts, zero-fill the
cube, score each time slice with Gi*, and test each cell's score series
for monotone trend with the Mann-Kendall statistic (Mann 1945 / Kendall
1975, public; the tie-corrected variance is Kendall's). The composition
(`emerging_hotspots`) is the same analysis ArcGIS ships as "Emerging Hot
Spot Analysis" on its space-time cube — new/intensifying/diminishing
hotspot classes from per-slice Gi* + the MK trend over them.

Scale shape:

- the only pass over the facts is ONE partially-aggregated
  ``groupBy(cell, t_bin).count()`` (map-side combine absorbs dense-cell
  skew exactly like `core_cells`);
- everything downstream runs on the cube, bounded by
  |occupied cells| x |bins| — orders below the event count;
- Mann-Kendall is a cube self-join on (cell, t1 < t2): |bins|^2/2 rows
  per cell, with |bins| a small analysis constant (days/weeks of a
  window), never data-sized;
- all trend arithmetic is exact integer (counts, pair signs, tie groups)
  until the final variance division, so results are engine-reproducible
  bit-for-bit — the driver oracle hash-gates them against DuckDB.

Reference parity: pygridmap has no temporal operator; this extends the
grid family the way SURVEY §2.11 extends the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex as CI
from pygridmap_spark.operators import hotspots as HS


def space_time_cube(
    points: DataFrame,
    z: int,
    ts: str = "ts",
    bin_seconds: int = 86400,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Facts -> (cell_ix, cell_iy, cell_id, t_bin, n): Morton cell at zoom
    ``z`` x integer time bin (``floor(epoch_seconds / bin_seconds)`` —
    epoch-aligned, engine-portable). One partially aggregated shuffle;
    rows with NULL/NaN coordinates or NULL timestamps drop (same contract
    as ``core_cells``)."""
    ix, iy = CI.lonlat_to_cell_xy(F.col(lon), F.col(lat), z)
    idx = points.withColumns({"cell_ix": ix, "cell_iy": iy})
    t_bin = F.floor(
        F.unix_timestamp(F.col(ts)) / F.lit(int(bin_seconds))
    ).cast("long")
    # Morton AFTER the aggregation — cell_id is a function of the group
    # key, so it belongs on the |cells x bins| cube rows, not on every
    # fact row (same rationale as hotspots.core_cells)
    return (
        idx.filter(F.col("cell_ix").isNotNull() & F.col(ts).isNotNull())
        .groupBy("cell_ix", "cell_iy", t_bin.alias("t_bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cell_id", CI.morton(F.col("cell_ix"), F.col("cell_iy")))
        .select("cell_ix", "cell_iy", "cell_id", "t_bin", "n")
    )


def zero_fill_cube(cube: DataFrame, materialize: bool = True) -> DataFrame:
    """Densify: every (ever-occupied cell) x (every bin in [min, max])
    gets a row, absent combinations with n = 0. A trend test without the
    zero slices is blind to exactly the cells that emerge (their early
    bins are missing, not zero). Cost: |cells| x |bins| rows — the cube's
    own bound; both dimension frames are tiny aggregates/distincts and
    the fill is a broadcastable cross of the two.

    The input feeds THREE plan branches (cell dim, bin span, the join
    back); ``materialize`` (default) localCheckpoints it so the facts
    pass underneath runs once, not three times — pass False only if the
    input is already materialized."""
    if materialize:
        cube = cube.localCheckpoint(eager=True)
    cells = cube.select("cell_ix", "cell_iy", "cell_id").distinct()
    bins = (
        cube.agg(F.min("t_bin").alias("b0"), F.max("t_bin").alias("b1"))
        .select(F.explode(F.sequence("b0", "b1")).alias("t_bin"))
    )
    return (
        cells.crossJoin(F.broadcast(bins))
        .join(cube, ["cell_ix", "cell_iy", "cell_id", "t_bin"], "left")
        .select(
            "cell_ix",
            "cell_iy",
            "cell_id",
            "t_bin",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def mann_kendall_trend(
    cube: DataFrame,
    cell: str = "cell_id",
    t: str = "t_bin",
    x: str = "n",
) -> DataFrame:
    """Per-cell Mann-Kendall trend over the time series ``x`` ordered by
    ``t``: returns (cell, t_bins, s_stat, var_s, mk_z).

        S      = sum over pairs t_i < t_j of sign(x_j - x_i)
        var(S) = [T(T-1)(2T+5) - sum_g tg(tg-1)(2tg+5)] / 18   (tie-corrected)
        mk_z   = (S -/+ 1) / sqrt(var)   (continuity correction; 0 when S = 0)

    mk_z is NULL when var == 0 (T < 2 or all values tied) — never
    Infinity/NaN. S and the tie sums are exact integers (the pair join is
    |bins|^2/2 per cell, bounded by the analysis window); the variance
    cubic overflows long only past ~2M bins, where ANSI mode raises
    rather than corrupting."""
    a = cube.select(
        F.col(cell).alias("__c__"), F.col(t).alias("__t1__"), F.col(x).alias("__x1__")
    )
    b = cube.select(
        F.col(cell).alias("__c__"), F.col(t).alias("__t2__"), F.col(x).alias("__x2__")
    )
    sgn = (
        F.when(F.col("__x2__") > F.col("__x1__"), 1)
        .when(F.col("__x2__") < F.col("__x1__"), -1)
        .otherwise(0)
    )
    pairs = (
        a.join(b, "__c__")
        .filter(F.col("__t1__") < F.col("__t2__"))
        .groupBy("__c__")
        .agg(F.sum(sgn).alias("s_stat"))
    )
    tg = F.col("__tg__")
    ties = (
        cube.groupBy(F.col(cell).alias("__c__"), F.col(x).alias("__v__"))
        .agg(F.count(F.lit(1)).alias("__tg__"))
        .groupBy("__c__")
        .agg(
            F.count(F.lit(1)).alias("__groups__"),
            F.sum("__tg__").alias("t_bins"),
            F.sum(tg * (tg - 1) * (2 * tg + 5)).alias("__tie_sum__"),
        )
    )
    tt = F.col("t_bins")
    var_s = (
        (tt * (tt - 1) * (2 * tt + 5) - F.col("__tie_sum__")).cast("double")
        / F.lit(18.0)
    )
    s = F.col("s_stat")
    mk = (
        F.when(s > 0, (s - F.lit(1)).cast("double") / F.sqrt(F.col("var_s")))
        .when(s < 0, (s + F.lit(1)).cast("double") / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return (
        pairs.join(ties, "__c__")
        .withColumn("var_s", var_s)
        .select(
            F.col("__c__").alias(cell),
            "t_bins",
            "s_stat",
            "var_s",
            F.when(F.col("var_s") > 0, mk).alias("mk_z"),
        )
    )


#: two-sided 90% / 95% normal critical values — the ArcGIS hotspot bins
Z90 = 1.645
Z95 = 1.96


def emerging_hotspots(
    points: DataFrame,
    z: int,
    ts: str = "ts",
    bin_seconds: int = 86400,
    lon: str = "lon",
    lat: str = "lat",
    z_hot: float = Z90,
) -> DataFrame:
    """ArcGIS-style emerging-hotspot classification: per-slice Gi* on the
    zero-filled cube, Mann-Kendall over each cell's gi_z series, and the
    final slice's score decides current heat. Returns
    (cell_ix, cell_iy, cell_id, t_bins, mk_z, gi_last, trend, category):

    - ``trend``: 'up' / 'down' (|mk_z| >= z_hot) else 'flat';
    - ``category``: 'intensifying' (hot now, up), 'diminishing' (hot now,
      down), 'persistent' (hot now, flat), 'emerging' (not hot yet,
      up), else 'none'.

    Slices where Gi* is degenerate (all-equal counts — e.g. an all-zero
    bin under zero-fill... impossible once any cell has mass, but also a
    single-cell universe) carry NULL gi_z; MK treats NULL-vs-anything
    pairs as no-evidence (sign comparisons with NULL are NULL -> summed
    as 0) and the tie correction groups NULLs together, so degenerate
    slices dilute rather than poison the trend."""
    # both frames are bounded (|cells| x |bins|) and multi-consumer: the
    # cube feeds the per-bin Gi* three ways (moments, neighbor gather,
    # base) and gi feeds MK pairs + ties + the last slice — materialize
    # once instead of re-running the facts pass per consumer
    # zero_fill_cube already materializes the raw cube under the fill join
    # (the facts pass runs once); re-checkpointing the FILLED frame was a
    # second eager job for no recompute protection — the fill is one cheap
    # broadcast cross of two bounded dims per consumer (measured equal
    # without it, one job fewer)
    cube = zero_fill_cube(
        space_time_cube(points, z, ts=ts, bin_seconds=bin_seconds, lon=lon, lat=lat)
    )
    gi = HS.gi_star_cells(cube, z, value="n", by="t_bin").localCheckpoint(eager=True)
    trend = mann_kendall_trend(gi, cell="cell_id", t="t_bin", x="gi_z")
    last_bin = gi.agg(F.max("t_bin").alias("__lb__"))
    gi_last = (
        gi.join(F.broadcast(last_bin), gi["t_bin"] == F.col("__lb__"))
        .select("cell_ix", "cell_iy", "cell_id", F.col("gi_z").alias("gi_last"))
    )
    hot = F.col("gi_last") >= F.lit(float(z_hot))
    up = F.col("mk_z") >= F.lit(float(z_hot))
    down = F.col("mk_z") <= F.lit(-float(z_hot))
    return (
        gi_last.join(trend, "cell_id")
        .select(
            "cell_ix",
            "cell_iy",
            "cell_id",
            "t_bins",
            "mk_z",
            "gi_last",
            F.when(up, F.lit("up")).when(down, F.lit("down")).otherwise(F.lit("flat")).alias("trend"),
            F.when(hot & up, F.lit("intensifying"))
            .when(hot & down, F.lit("diminishing"))
            .when(hot, F.lit("persistent"))
            .when(up, F.lit("emerging"))
            .otherwise(F.lit("none"))
            .alias("category"),
        )
    )
