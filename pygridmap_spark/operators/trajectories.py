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


def _dp_keep_mask(xs, ys, tol2):
    """Iterative Douglas-Peucker keep-mask over an ordered polyline.

    Exact-twin contract (the oracle restates this in a DuckDB recursive
    CTE): squared planar point-to-SEGMENT distance with the expression
    tree `t = ((px-ax)*dx + (py-ay)*dy)/L2`, clamped to [0,1], residual
    `(px-(ax+t*dx))^2 + (py-(ay+t*dy))^2` — every operation in the same
    order on both engines so near-threshold splits can't diverge by a
    ULP. Ties at the max deviation split at the EARLIEST point
    (np.argmax == ORDER BY d DESC, idx). Split when d2 > tol2 (strict)."""
    import numpy as np

    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        px, py = xs[i + 1 : j], ys[i + 1 : j]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            rx, ry = px - ax, py - ay
        else:
            t = ((px - ax) * dx + (py - ay) * dy) / L2
            t = np.minimum(1.0, np.maximum(0.0, t))
            rx, ry = px - (ax + t * dx), py - (ay + t * dy)
        d2 = rx * rx + ry * ry
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_trajectory(
    df: DataFrame,
    tolerance: float,
    entity_col: str | list[str] = "user_id",
    ts_col: str = "ts",
    x: str = "lon",
    y: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-entity Douglas-Peucker polyline simplification: keep the
    subset of each entity's pings (ordered by ``ts_col``) whose polyline
    stays within ``tolerance`` of the original everywhere — the classic
    trajectory-compression pass before storage or map rendering.
    ``entity_col`` may be a list for composite polyline keys (e.g.
    ``["poly_id", "ring"]`` — the vertex-rows path under
    operators/simplify.simplify_wkb). Returns
    the KEPT original rows, all columns intact (a per-group filter).

    Distance is planar Euclidean point-to-segment in coordinate units:
    reproject first (``functions.reproject``) when metric fidelity
    matters; in raw degrees the tolerance is anisotropic away from the
    equator — fine for rendering-grade compression, documented here so
    nobody mistakes it for geodesic. Ties at the max deviation split at
    the earliest point; first and last pings are always kept; a
    single-ping entity survives.

    NULL/NaN coordinates RAISE (fail closed, the engine's ANSI-mode
    posture): a blind spot inside a polyline is not evidence the path
    was straight, so the caller must segment or filter upstream
    (``stay_points`` breaks on them for the same reason).

    Scale shape: exactly ONE exchange — the entity hash repartition +
    within-partition (entity, ts) sort from util.grouped_frames_sorted —
    then a streaming Arrow pass paying per BATCH, not per group (the
    ~1-4 ms/group applyInPandas fee would dominate at web-scale user
    counts). Memory is bounded by the largest single trajectory, and
    the O(n log n)-expected DP stack is numpy over zero-copy slices.
    Reference parity: pygridmap has no polyline ops (grids are static);
    this is GEOS ``simplify`` re-expressed for the moving-points family.
    """
    import numpy as np

    from pygridmap_spark import util

    keys = [entity_col] if isinstance(entity_col, str) else list(entity_col)
    tol2 = float(tolerance) * float(tolerance)
    if not tol2 >= 0.0:  # NaN-proof
        raise ValueError("simplify_trajectory: tolerance must be a number >= 0")

    def _kern(sub):
        xs = sub[x].to_numpy(dtype=np.float64)
        ys = sub[y].to_numpy(dtype=np.float64)
        if np.isnan(xs).any() or np.isnan(ys).any():
            raise ValueError(
                "simplify_trajectory: NULL/NaN coordinates in entity "
                f"{sub[keys[0]].iloc[0]!r} — filter or segment upstream"
            )
        return sub.iloc[_dp_keep_mask(xs, ys, tol2)]

    order = [ts_col] + ([tiebreak] if tiebreak else [])
    return util.grouped_frames_sorted(
        df, keys, _kern, util.schema_with(df), order_by=order
    )


def od_flows(
    stays: DataFrame,
    z: int,
    entity_col: str = "user_id",
    t_col: str = "t_start",
    lon: str = "ctr_lon",
    lat: str = "ctr_lat",
    drop_self: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Origin-destination flow matrix from a stay-point table: assign each
    stay's centroid to a zoom-``z`` Morton cell, pair consecutive stays
    per entity (ordered by ``t_col``), and count trips per (origin cell,
    destination cell; ``tiebreak`` breaks equal-``t_col`` ordering
    deterministically, e.g. ``seg_id``) — the canonical
    trajectory-mining composition
    (Zheng 2015, "Trajectory Data Mining", public): raw pings ->
    ``stay_points`` -> flows.

    Returns ``(o_ix, o_iy, o_cell, d_ix, d_iy, d_cell, n_trips,
    n_entities)``; ``drop_self=True`` removes same-cell flows (returns to
    the same place). Stays with NULL/NaN centroids get NULL cells and are
    dropped (they can neither originate nor receive a trip).

    Scale shape: the stays frame is already orders below the ping count;
    the pairing is ONE window exchange on the entity key (lead over the
    per-entity timeline — stay intervals are disjoint, so ``t_col`` is a
    strict order), and the matrix rollup is a partially-aggregated hash
    agg on the (o, d) key. n_entities is count(DISTINCT entity) per pair
    — the expand-distinct rides the same exchange.
    """
    from pygridmap_spark.functions import cellindex as CI

    idx = CI.with_cell_index(stays, z, lon=lon, lat=lat).filter(
        F.col("cell_ix").isNotNull()
    )
    order = [F.col(t_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    paired = idx.select(
        F.col(entity_col).alias("__e__"),
        F.col("cell_ix").alias("o_ix"),
        F.col("cell_iy").alias("o_iy"),
        F.col("cell_id").alias("o_cell"),
        F.lead("cell_ix").over(w).alias("d_ix"),
        F.lead("cell_iy").over(w).alias("d_iy"),
        F.lead("cell_id").over(w).alias("d_cell"),
    ).filter(F.col("d_cell").isNotNull())
    if drop_self:
        paired = paired.filter(F.col("o_cell") != F.col("d_cell"))
    return paired.groupBy("o_ix", "o_iy", "o_cell", "d_ix", "d_iy", "d_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.count_distinct(F.col("__e__")).alias("n_entities"),
    )
