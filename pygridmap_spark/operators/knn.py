"""kNN via cell-ring expansion with broadcast brute-force fallback
(SURVEY §2.11 — north-star capability; the reference's closest analog is
R-tree candidate pruning, overlay.py:257-260).

Semantics: for each query point, the k nearest data points by Euclidean
distance on (x, y); deterministic tie-break on (distance, point id).

Plan:
1. both sides get integer cell indices at a chosen cell size,
2. driver loop doubles the disk radius r (1, 2, 4, ...) until every query
   has >= k candidates within its Chebyshev-r cell disk — each iteration is
   ONE equi-join on offset cell keys (query side explodes the (2r+1)^2 disk
   only for still-unsatisfied queries, so work shrinks every round),
3. a final guarantee pass: r_final(query) = ceil(kth_dist / cell) + 1 per
   query (variable-length sequence explode — per-row radius, no global
   worst-case blowup), then exact top-k by distance.

Fallback: when the data side is small enough to broadcast, a single
broadcast cross join + window top-k (`knn_bruteforce`) is cheaper and is
what the driver's oracle checks against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_cells(df: DataFrame, cell: float, x: str, y: str, prefix: str) -> DataFrame:
    return df.withColumns(
        {
            f"{prefix}ix": F.floor(F.col(x) / F.lit(cell)).cast("long"),
            f"{prefix}iy": F.floor(F.col(y) / F.lit(cell)).cast("long"),
        }
    )


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    x: str = "x",
    y: str = "y",
    point_id: str = "point_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Broadcast brute-force kNN — exact, O(|Q| x |P|), for small P or as
    the verification oracle. Returns (query_id, point_id, dist, rank)."""
    p = points.select(
        F.col(point_id), F.col(x).alias("_px"), F.col(y).alias("_py")
    )
    q = queries.select(
        F.col(query_id), F.col(x).alias("_qx"), F.col(y).alias("_qy")
    )
    joined = q.crossJoin(F.broadcast(p))
    dist = F.sqrt((F.col("_px") - F.col("_qx")) ** 2 + (F.col("_py") - F.col("_qy")) ** 2)
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
    return (
        joined.withColumn("dist", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "dist", "rank")
    )


def estimate_knn_cell(points: DataFrame, k: int, x: str = "x", y: str = "y") -> float:
    """Index cell size such that an average cell holds ~k points:
    sqrt(bbox_area * k / n). One tiny min/max/count aggregation."""
    r = points.agg(
        F.min(x), F.max(x), F.min(y), F.max(y), F.count(F.lit(1))
    ).collect()[0]
    if r[4] == 0 or r[0] is None:
        raise ValueError("empty points layer: cannot estimate a cell size")
    w, h = r[1] - r[0], r[3] - r[2]
    area = max(w, 1e-12) * max(h, 1e-12)
    return float((area * max(k, 1) / r[4]) ** 0.5)


def knn_cellring(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    cell: float | None = None,
    x: str = "x",
    y: str = "y",
    point_id: str = "point_id",
    query_id: str = "query_id",
    max_radius: int = 64,
) -> DataFrame:
    """Cell-ring-expansion kNN. Exact (same output as knn_bruteforce).

    ``cell`` is the index cell size in coordinate units — an average cell
    should hold O(k) points. ``cell=None`` estimates it from the data
    (:func:`estimate_knn_cell`); pass it explicitly on re-runs to skip the
    estimation job.
    """
    if cell is None:
        cell = estimate_knn_cell(points, k, x, y)
    spark = points.sparkSession
    p = _with_cells(
        points.select(F.col(point_id), F.col(x).alias("_px"), F.col(y).alias("_py")),
        cell, "_px", "_py", "_p",
    )
    q_all = _with_cells(
        queries.select(F.col(query_id), F.col(x).alias("_qx"), F.col(y).alias("_qy")),
        cell, "_qx", "_qy", "_q",
    )
    p.persist()
    q_all.persist()

    # phase 1: grow r until every query has >= k candidates in its disk.
    # Each round joins ONLY the new ring (annulus prev_r < chebyshev <= r)
    # and accumulates the count on the pending rows — the inner disk was
    # already counted in earlier rounds, so no candidate row is ever
    # generated twice. Each round materializes via localCheckpoint —
    # iterative DataFrame loops otherwise re-derive the whole previous
    # lineage every round (exponential plan blowup).
    pending = q_all.withColumn("_cnt", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    satisfied_parts: list[DataFrame] = []  # (query row + chosen radius)
    prev_r, r = 0, 1
    while r <= max_radius:
        ring_count = _ring_join(pending, p, prev_r, r, point_id, query_id).groupBy(
            query_id
        ).count()
        pending = (
            pending.join(ring_count, query_id, "left")
            .withColumn("_cnt", F.col("_cnt") + F.coalesce(F.col("count"), F.lit(0)))
            .drop("count")
            .localCheckpoint(eager=True)
        )
        satisfied_parts.append(
            pending.filter(F.col("_cnt") >= k).drop("_cnt").withColumn("_r", F.lit(r))
        )
        pending = pending.filter(F.col("_cnt") < k).localCheckpoint(eager=True)
        if pending.isEmpty():
            pending = None
            break
        prev_r, r = r, r * 2
    if pending is not None and not pending.isEmpty():
        # degenerate sparse case: give up on the index for the stragglers
        satisfied_parts.append(
            pending.drop("_cnt").withColumn("_r", F.lit(max_radius))
        )
    q_r = satisfied_parts[0]
    for part in satisfied_parts[1:]:
        q_r = q_r.unionByName(part)

    # phase 2: kth distance within the satisfying disk -> guaranteed radius
    cands = _disk_join_var(q_r, p, point_id, query_id, radius_col="_r")
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
    kth = (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == k)
        .select(query_id, F.col("dist").alias("_kth"))
    )
    q_final = q_r.join(kth, query_id, "left").withColumn(
        "_rf",
        F.when(
            F.col("_kth").isNotNull(),
            F.greatest(
                (F.ceil(F.col("_kth") / F.lit(cell)) + 1).cast("int"), F.col("_r")
            ),
        ).otherwise(F.col("_r")),
    )
    final = _disk_join_var(q_final, p, point_id, query_id, radius_col="_rf")
    out = (
        final.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "dist", "rank")
        .localCheckpoint(eager=True)
    )

    # correctness backstop: queries whose disk never reached k candidates
    # (isolated queries beyond max_radius) get exact brute force — the
    # 'broadcast-join fallback' of the north star, applied per-straggler.
    n_points = p.count()
    want = min(k, n_points)
    got_counts = out.groupBy(query_id).count()
    incomplete = q_all.join(
        got_counts.filter(F.col("count") >= want).select(query_id),
        query_id,
        "left_anti",
    )
    if not incomplete.isEmpty():
        scored = p.crossJoin(
            F.broadcast(incomplete.select(query_id, "_qx", "_qy"))
        ).withColumn(
            "dist",
            F.sqrt((F.col("_px") - F.col("_qx")) ** 2 + (F.col("_py") - F.col("_qy")) ** 2),
        )
        bf = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, point_id, "dist", "rank")
        )
        out = out.join(
            incomplete.select(query_id), query_id, "left_anti"
        ).unionByName(bf)
    p.unpersist()
    q_all.unpersist()
    return out


def _disk_join(q: DataFrame, p: DataFrame, r: int, point_id: str, query_id: str) -> DataFrame:
    """Join queries to points within the Chebyshev-r cell disk (fixed r)."""
    qe = q.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r)))).withColumn(
        "_dy", F.explode(F.sequence(F.lit(-r), F.lit(r)))
    )
    return _finish_disk_join(qe, p, point_id, query_id)


def _ring_join(
    q: DataFrame, p: DataFrame, prev_r: int, r: int, point_id: str, query_id: str
) -> DataFrame:
    """Join queries to points in the Chebyshev ANNULUS prev_r < d <= r only
    (prev_r=0 includes the center cell). The filter sits between the
    generate and the join, so inner-disk cells never reach the exchange."""
    qe = (
        q.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .filter(
            (F.greatest(F.abs(F.col("_dx")), F.abs(F.col("_dy"))) > prev_r)
            | F.lit(prev_r == 0)
        )
    )
    return _finish_disk_join(qe, p, point_id, query_id)


def _disk_join_var(q: DataFrame, p: DataFrame, point_id: str, query_id: str, radius_col: str) -> DataFrame:
    """Disk join with per-query radius column (variable-length explode)."""
    rc = F.col(radius_col)
    qe = q.withColumn("_dx", F.explode(F.sequence(-rc, rc))).withColumn(
        "_dy", F.explode(F.sequence(-rc, rc))
    )
    return _finish_disk_join(qe, p, point_id, query_id)


def _finish_disk_join(qe: DataFrame, p: DataFrame, point_id: str, query_id: str) -> DataFrame:
    qe = qe.withColumns(
        {"_pix": F.col("_qix") + F.col("_dx"), "_piy": F.col("_qiy") + F.col("_dy")}
    )
    joined = qe.join(p, ["_pix", "_piy"])
    dist = F.sqrt(
        (F.col("_px") - F.col("_qx")) ** 2 + (F.col("_py") - F.col("_qy")) ** 2
    )
    return joined.withColumn("dist", dist).select(
        query_id, point_id, "dist", "_qx", "_qy"
    ).drop("_qx", "_qy")
