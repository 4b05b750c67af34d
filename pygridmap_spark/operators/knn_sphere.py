"""Geodesic kNN on the sphere via S2 cell-ring expansion.

The planar operator (operators/knn.py) is exact for points already in a
projected plane; web-scale page coordinates live on the sphere, where
equirectangular cell rings stop being distance-correct at high latitudes
and across the antimeridian. This operator runs the same two-phase design
over the S2 (face, i, j) grid (functions/s2.py) with GREAT-CIRCLE
distance, and is exact (== brute force, pinned by tests and a driver
oracle):

1. **Grow**: same-face Chebyshev ring doubling on (face, i, j) — each
   round ONE equi-join on offset cell keys, annulus-only (no candidate
   generated twice), counts accumulated per query until >= k. Face-edge
   clipping only slows counting (correctness does not depend on it).
2. **Guarantee**: the kth candidate angle theta is an upper bound on the
   true kth distance. Pick the cover level L_q with cell st-width
   ``2^-L_q >= theta * ST_GRAD_BOUND`` — then every point within theta of
   the query lies in the query's level-L_q cell or one of its 8 cube-wrap
   neighbors (the gradient bound caps st displacement per radian; pinned
   by test_s2). Join those <= 9 cells (one equi-join per distinct cover
   level — ancestors are ij shiftrights, no Hilbert anywhere) and take
   the exact top-k by great-circle distance.
3. **Backstop**: queries the index never satisfies (sparse faces,
   theta too large for any cover level) get broadcast brute force —
   the north star's broadcast-join fallback, applied per-straggler.

Distances are unit-sphere RADIANS (multiply by EARTH_RADIUS_M for
meters); ordering is computed on the chord (monotone in angle, cheaper).
Ties break on (dist, point_id) like the planar operator.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygridmap_spark.functions import s2 as S2

EARTH_RADIUS_M = 6371008.8  # IUGG mean radius


def _with_unit_vec(df: DataFrame, lon: str, lat: str, prefix: str) -> DataFrame:
    lam = F.radians(F.col(lon))
    phi = F.radians(F.col(lat))
    cp = F.cos(phi)
    return df.withColumns(
        {
            f"{prefix}x": cp * F.cos(lam),
            f"{prefix}y": cp * F.sin(lam),
            f"{prefix}z": F.sin(phi),
        }
    )


def _chord(qp: str = "_q", pp: str = "_p"):
    dx = F.col(f"{qp}x") - F.col(f"{pp}x")
    dy = F.col(f"{qp}y") - F.col(f"{pp}y")
    dz = F.col(f"{qp}z") - F.col(f"{pp}z")
    return F.sqrt(dx * dx + dy * dy + dz * dz)


def _angle(chord):
    return 2.0 * F.asin(F.least(chord / 2.0, F.lit(1.0)))


def knn_s2_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "point_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Broadcast brute-force geodesic kNN — exact, O(|Q| x |P|); the
    verification twin. Returns (query_id, point_id, dist, rank) with
    ``dist`` in radians."""
    p = _with_unit_vec(points.select(point_id, lon, lat), lon, lat, "_p").drop(lon, lat)
    q = _with_unit_vec(queries.select(query_id, lon, lat), lon, lat, "_q").drop(lon, lat)
    w = Window.partitionBy(query_id).orderBy(F.col("_c").asc(), F.col(point_id).asc())
    return (
        q.crossJoin(F.broadcast(p))
        .withColumn("_c", _chord())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, _angle(F.col("_c")).alias("dist"), "rank")
    )


def estimate_knn_level(points: DataFrame, k: int) -> int:
    """Index level such that an average level-L cell holds ~k points:
    6·4^L cells on the sphere. One tiny count aggregation."""
    n = points.count()
    if n == 0:
        raise ValueError("empty points layer: cannot estimate an index level")
    lvl = 1
    while lvl < S2.MAX_LEVEL and 6 * (4 ** (lvl + 1)) * max(k, 1) <= n:
        lvl += 1
    return lvl


def knn_s2(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    level: int | None = None,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "point_id",
    query_id: str = "query_id",
    max_radius: int = 64,
) -> DataFrame:
    """S2 cell-ring-expansion geodesic kNN. Exact (== knn_s2_bruteforce).

    ``level`` is the index level (cells should hold O(k) points on
    average); ``None`` estimates it from the data. Returns
    (query_id, point_id, dist, rank), ``dist`` in radians.
    """
    if level is None:
        level = estimate_knn_level(points, k)
    S2._check_level(level)
    n = 1 << level

    p = S2.with_s2_face_ij(
        _with_unit_vec(points.select(point_id, lon, lat), lon, lat, "_p"),
        level, lon, lat, prefix="_pc_",
    ).drop(lon, lat)
    q_all = S2.with_s2_face_ij(
        _with_unit_vec(queries.select(query_id, lon, lat), lon, lat, "_q"),
        level, lon, lat, prefix="_qc_",
    ).drop(lon, lat)
    p.persist()
    q_all.persist()
    try:
        return _knn_s2_inner(
            p, q_all, k, level, n, point_id, query_id, max_radius
        )
    finally:
        p.unpersist()
        q_all.unpersist()


def _ring_join(pending, p, prev_r, r, point_id, query_id, n):
    """Same-face annulus join (prev_r < chebyshev <= r; prev_r=0 includes
    the center cell); generated keys clipped to the face bounds before the
    exchange."""
    qe = (
        pending.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .filter(
            (F.greatest(F.abs(F.col("_dx")), F.abs(F.col("_dy"))) > prev_r)
            | F.lit(prev_r == 0)
        )
        .withColumns(
            {"_pi": F.col("_qc_i") + F.col("_dx"), "_pj": F.col("_qc_j") + F.col("_dy")}
        )
        .filter(
            (F.col("_pi") >= 0) & (F.col("_pi") < n)
            & (F.col("_pj") >= 0) & (F.col("_pj") < n)
        )
        .withColumn("_pf", F.col("_qc_face"))
    )
    return qe.join(
        p.select(
            point_id,
            F.col("_pc_face").alias("_pf"),
            F.col("_pc_i").alias("_pi"),
            F.col("_pc_j").alias("_pj"),
        ),
        ["_pf", "_pi", "_pj"],
    ).select(query_id, point_id)


def _knn_s2_inner(p, q_all, k, level, n, point_id, query_id, max_radius):
    # ---- phase 1: same-face ring doubling until >= k candidates
    pending = q_all.withColumn("_cnt", F.lit(0).cast("long")).localCheckpoint(eager=True)
    satisfied_parts: list[DataFrame] = []
    stragglers = None
    prev_r, r = 0, 1
    while r <= max_radius:
        ring_count = (
            _ring_join(pending, p, prev_r, r, point_id, query_id, n)
            .groupBy(query_id)
            .count()
        )
        pending = (
            pending.join(ring_count, query_id, "left")
            .withColumn("_cnt", F.col("_cnt") + F.coalesce(F.col("count"), F.lit(0)))
            .drop("count")
            .localCheckpoint(eager=True)
        )
        satisfied_parts.append(
            pending.filter(F.col("_cnt") >= k).drop("_cnt").withColumn("_r", F.lit(r))
        )
        # a plain filter over the frame checkpointed above: lineage is
        # already flat, so a second eager materialization per round was
        # one pure job fee per ring (dropped r6; the isEmpty probe and
        # the next round's explode read the checkpoint through it)
        pending = pending.filter(F.col("_cnt") < k)
        if pending.isEmpty():
            pending = None
            break
        prev_r, r = r, r * 2
    if pending is not None and not pending.isEmpty():
        stragglers = pending.drop("_cnt")
    if not satisfied_parts:
        return _bruteforce_part(p, q_all.drop("_cnt"), k, point_id, query_id)
    q_r = satisfied_parts[0]
    for part in satisfied_parts[1:]:
        q_r = q_r.unionByName(part)

    # ---- phase 2: kth candidate chord within the satisfying same-face
    # disk -> cover level -> <= 9-cell cube-wrap cover join -> exact top-k
    rc = F.col("_r")
    disk = (
        q_r.withColumn("_dx", F.explode(F.sequence(-rc, rc)))
        .withColumn("_dy", F.explode(F.sequence(-rc, rc)))
        .withColumns(
            {"_pi": F.col("_qc_i") + F.col("_dx"), "_pj": F.col("_qc_j") + F.col("_dy")}
        )
        .filter(
            (F.col("_pi") >= 0) & (F.col("_pi") < n)
            & (F.col("_pj") >= 0) & (F.col("_pj") < n)
        )
        .withColumn("_pf", F.col("_qc_face"))
        .join(
            p.select(
                point_id,
                F.col("_pc_face").alias("_pf"),
                F.col("_pc_i").alias("_pi"),
                F.col("_pc_j").alias("_pj"),
                "_px", "_py", "_pz",
            ),
            ["_pf", "_pi", "_pj"],
        )
        .withColumn("_c", _chord())
    )
    w = Window.partitionBy(query_id).orderBy(F.col("_c").asc(), F.col(point_id).asc())
    kth = (
        disk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == k)
        .select(query_id, F.col("_c").alias("_ckth"))
    )
    q_cov = q_r.join(kth, query_id).withColumns(
        {
            "_theta": _angle(F.greatest(F.col("_ckth"), F.lit(1e-15))),
        }
    )
    # cover level: largest L_q with 2^-L_q >= theta * grad (clamped to the
    # index level; below level 1 the cover is most of the sphere -> brute)
    lq = F.least(
        F.lit(level),
        F.floor(-F.log2(F.col("_theta") * F.lit(S2.ST_GRAD_BOUND))).cast("int"),
    )
    q_cov = q_cov.withColumn("_lq", lq).localCheckpoint(eager=True)
    too_wide = q_cov.filter(F.col("_lq") < 1)
    q_cov = q_cov.filter(F.col("_lq") >= 1)

    # cube-wrap 9-cell covers (Arrow kernel; ids + 3 doubles per row)
    cover_schema = (
        f"{_q_id_field(q_cov, query_id)}, _lq int, _cf int, _ci long, _cj long, "
        "_qx double, _qy double, _qz double, _ckth double"
    )

    def _cover_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_parts = []
            for lv, g in pdf.groupby("_lq"):
                lv = int(lv)
                shift = level - lv
                fc = g["_qc_face"].to_numpy()
                ic = g["_qc_i"].to_numpy() >> shift
                jc = g["_qc_j"].to_numpy() >> shift
                row, f2, i2, j2 = S2.py_s2_neighbors_ij(fc, ic, jc, lv)
                base = pd.DataFrame(
                    {
                        query_id: g[query_id].to_numpy(),
                        "_lq": np.full(len(g), lv, dtype=np.int32),
                        "_cf": fc.astype(np.int32),
                        "_ci": ic,
                        "_cj": jc,
                        "_qx": g["_qx"].to_numpy(),
                        "_qy": g["_qy"].to_numpy(),
                        "_qz": g["_qz"].to_numpy(),
                        "_ckth": g["_ckth"].to_numpy(),
                    }
                )
                nbr = pd.DataFrame(
                    {
                        query_id: g[query_id].to_numpy()[row],
                        "_lq": np.full(len(row), lv, dtype=np.int32),
                        "_cf": f2.astype(np.int32),
                        "_ci": i2,
                        "_cj": j2,
                        "_qx": g["_qx"].to_numpy()[row],
                        "_qy": g["_qy"].to_numpy()[row],
                        "_qz": g["_qz"].to_numpy()[row],
                        "_ckth": g["_ckth"].to_numpy()[row],
                    }
                )
                out_parts.append(base)
                out_parts.append(nbr)
            yield pd.concat(out_parts, ignore_index=True)

    covers = q_cov.mapInPandas(_cover_kernel, cover_schema).localCheckpoint(eager=True)
    levels = [row["_lq"] for row in covers.select("_lq").distinct().collect()]

    parts = []
    for lv in sorted(levels):
        shift = level - lv
        cov_lv = covers.filter(F.col("_lq") == lv).drop("_lq")
        pk = p.select(
            point_id,
            F.col("_pc_face").alias("_cf"),
            F.shiftright(F.col("_pc_i"), shift).alias("_ci"),
            F.shiftright(F.col("_pc_j"), shift).alias("_cj"),
            "_px", "_py", "_pz",
        )
        parts.append(
            cov_lv.join(pk, ["_cf", "_ci", "_cj"])
            .withColumn("_c", _chord())
            .filter(F.col("_c") <= F.col("_ckth"))
            .select(query_id, point_id, "_c")
        )
    out = None
    if parts:
        cands = parts[0]
        for part in parts[1:]:
            cands = cands.unionByName(part)
        # a cell can appear in two covers of different levels only for
        # DIFFERENT queries (each query has exactly one cover), so no
        # dedup is needed; top-k is exact within theta_kth
        out = (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, point_id, _angle(F.col("_c")).alias("dist"), "rank")
            .localCheckpoint(eager=True)
        )

    # ---- backstop: stragglers + too-wide covers + any query short of k
    n_points = p.count()
    want = min(k, n_points)
    brute_q = None
    for extra in (stragglers, too_wide):
        if extra is not None and not extra.isEmpty():
            sel = extra.select(query_id, "_qx", "_qy", "_qz")
            brute_q = sel if brute_q is None else brute_q.unionByName(sel)
    if out is not None:
        got = out.groupBy(query_id).count()
        short = (
            q_all.join(got.filter(F.col("count") >= want).select(query_id),
                       query_id, "left_anti")
            .join(brute_q.select(query_id) if brute_q is not None else _empty_ids(q_all, query_id),
                  query_id, "left_anti")
            .select(query_id, "_qx", "_qy", "_qz")
        )
        if not short.isEmpty():
            brute_q = short if brute_q is None else brute_q.unionByName(short)
    if brute_q is not None and not brute_q.isEmpty():
        bf = _bruteforce_vec(p, brute_q, k, point_id, query_id)
        if out is None:
            return bf
        out = out.join(brute_q.select(query_id), query_id, "left_anti").unionByName(bf)
    return out if out is not None else _empty_result(q_all, point_id, query_id)


def _q_id_field(df, query_id):
    return f"{query_id} {dict(df.dtypes)[query_id]}"


def _empty_ids(q_all, query_id):
    return q_all.select(query_id).limit(0)


def _empty_result(q_all, point_id, query_id):
    spark = q_all.sparkSession
    return spark.createDataFrame(
        [], f"{_q_id_field(q_all, query_id)}, {point_id} long, dist double, rank int"
    )


def _bruteforce_vec(p, brute_q, k, point_id, query_id):
    w = Window.partitionBy(query_id).orderBy(F.col("_c").asc(), F.col(point_id).asc())
    return (
        p.select(point_id, "_px", "_py", "_pz")
        .crossJoin(F.broadcast(brute_q))
        .withColumn("_c", _chord())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, _angle(F.col("_c")).alias("dist"), "rank")
    )


def _bruteforce_part(p, q, k, point_id, query_id):
    return _bruteforce_vec(p, q.select(query_id, "_qx", "_qy", "_qz"), k, point_id, query_id)


# ---------------------------------------------------------------------------
# Geodesic radius join (fixed-radius great-circle neighbor search)
# ---------------------------------------------------------------------------

def radius_cover_level(radius_m: float) -> int:
    """Deepest S2 level whose cells still satisfy the cover guarantee for
    ``radius_m``: cell st-width ``2^-L >= theta * ST_GRAD_BOUND`` means
    every point within great-circle angle theta of a query lies in the
    query's level-L cell or one of its <= 8 cube-wrap neighbors (the same
    bound phase 2 of :func:`knn_s2` relies on; pinned by
    test_gradient_bound_holds). May be < 1 for near-hemisphere radii (no
    usable cover level) or > MAX_LEVEL for sub-meter radii (callers clamp).
    """
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m}")
    theta = radius_m / EARTH_RADIUS_M
    return math.floor(-math.log2(theta * S2.ST_GRAD_BOUND))


def within_radius_s2_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    radius_m: float,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "point_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Broadcast brute-force geodesic radius join — exact, O(|Q| x |P|);
    the verification twin. Returns (query_id, point_id, dist) with ``dist``
    the great-circle angle in radians, inclusive of ``dist == radius``."""
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m}")
    theta = min(radius_m / EARTH_RADIUS_M, math.pi)
    chord_max = 2.0 * math.sin(theta / 2.0)
    p = _with_unit_vec(points.select(point_id, lon, lat), lon, lat, "_p").drop(lon, lat)
    q = _with_unit_vec(queries.select(query_id, lon, lat), lon, lat, "_q").drop(lon, lat)
    return (
        p.crossJoin(F.broadcast(q))
        .withColumn("_c", _chord())
        .filter(F.col("_c") <= F.lit(chord_max))
        .select(query_id, point_id, _angle(F.col("_c")).alias("dist"))
    )


def within_radius_s2(
    points: DataFrame,
    queries: DataFrame,
    radius_m: float,
    level: int | None = None,
    lon: str = "lon",
    lat: str = "lat",
    point_id: str = "point_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact geodesic radius join via a single-level S2 cell cover.

    Because the radius is a constant (unlike kNN's per-query kth
    distance), the cover level is one number for the whole job:
    ``L = radius_cover_level(radius_m)`` guarantees every match for a
    query lies in the query's level-L cell or its <= 8 cube-wrap
    neighbors. The plan is then exactly three steps, all
    shuffle-minimal at 100-TB scale:

    1. index both sides at level L — pure Catalyst trig on (lon, lat),
       no exchange;
    2. expand each query to its <= 9 cover cells (one Arrow kernel,
       ids + 3 doubles per row, output <= 9x|Q|);
    3. ONE (face, i, j) equi-join — the big points side shuffles once
       on its cell key (or not at all if the 9x|Q| cover side is small
       enough for AQE to broadcast it) — then a chord refine.

    ``level`` may be passed to REUSE an existing coarser index (it must
    be <= the guarantee level, else the cover would miss matches —
    raises). Radii too large for any cover level (theta near pi/2 and
    beyond) fall back to the broadcast brute-force twin.

    Returns (query_id, point_id, dist): every point within ``radius_m``
    great-circle meters of each query, ``dist`` the great-circle angle in
    RADIANS (multiply by EARTH_RADIUS_M for meters), inclusive bound.
    Reference parity: pygridmap's proximity joins are planar-CRS only
    (gridtiler/base run in a projected CRS); this is the spherical
    counterpart the web-scale page-geolocation domain needs.
    """
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m}")
    theta = radius_m / EARTH_RADIUS_M
    lc = radius_cover_level(radius_m) if theta < math.pi else 0
    if level is None:
        level = min(lc, S2.MAX_LEVEL)
    elif level > lc:
        raise ValueError(
            f"level={level} is finer than the cover guarantee level {lc} for "
            f"radius_m={radius_m}: a 9-cell cover at that level can miss "
            "matches. Pass level <= the guarantee level (or None)."
        )
    if level < 1:
        # no usable cover level (radius a significant fraction of the
        # sphere) -> the broadcast fallback IS the right plan
        return within_radius_s2_bruteforce(
            points, queries, radius_m, lon, lat, point_id, query_id
        )
    chord_max = 2.0 * math.sin(theta / 2.0)

    p = S2.with_s2_face_ij(
        _with_unit_vec(points.select(point_id, lon, lat), lon, lat, "_p"),
        level, lon, lat, prefix="_pc_",
    ).drop(lon, lat)
    q = S2.with_s2_face_ij(
        _with_unit_vec(queries.select(query_id, lon, lat), lon, lat, "_q"),
        level, lon, lat, prefix="_qc_",
    ).drop(lon, lat)

    cover_schema = (
        f"{_q_id_field(q, query_id)}, _cf int, _ci long, _cj long, "
        "_qx double, _qy double, _qz double"
    )

    def _cover_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            fc = pdf["_qc_face"].to_numpy()
            ic = pdf["_qc_i"].to_numpy()
            jc = pdf["_qc_j"].to_numpy()
            row, f2, i2, j2 = S2.py_s2_neighbors_ij(fc, ic, jc, level)
            qid = pdf[query_id].to_numpy()
            qx = pdf["_qx"].to_numpy()
            qy = pdf["_qy"].to_numpy()
            qz = pdf["_qz"].to_numpy()
            yield pd.concat(
                [
                    pd.DataFrame(
                        {
                            query_id: qid,
                            "_cf": fc.astype(np.int32),
                            "_ci": ic,
                            "_cj": jc,
                            "_qx": qx, "_qy": qy, "_qz": qz,
                        }
                    ),
                    pd.DataFrame(
                        {
                            query_id: qid[row],
                            "_cf": f2.astype(np.int32),
                            "_ci": i2,
                            "_cj": j2,
                            "_qx": qx[row], "_qy": qy[row], "_qz": qz[row],
                        }
                    ),
                ],
                ignore_index=True,
            )

    covers = q.select(
        query_id, "_qc_face", "_qc_i", "_qc_j", "_qx", "_qy", "_qz"
    ).mapInPandas(_cover_kernel, cover_schema)
    pk = p.select(
        point_id,
        F.col("_pc_face").cast("int").alias("_cf"),
        F.col("_pc_i").alias("_ci"),
        F.col("_pc_j").alias("_cj"),
        "_px", "_py", "_pz",
    )
    # py_s2_neighbors_ij dedups (query, cell) and drops corner self-wraps,
    # and a point lies in exactly one level-L cell -> each (query, point)
    # pair joins at most once; no distinct needed after the join.
    return (
        covers.join(pk, ["_cf", "_ci", "_cj"])
        .withColumn("_c", _chord())
        .filter(F.col("_c") <= F.lit(chord_max))
        .select(query_id, point_id, _angle(F.col("_c")).alias("dist"))
    )
