"""Point-pattern statistics: Ripley's K pair counts over integer planar
coordinates.

Ripley's K (Ripley 1976, public; the standard spatial clustering-vs-
dispersion diagnostic) needs, for each radius r, the number of point
pairs within distance r. The pair COUNTING is the distributed-engine
problem — the naive form is an all-pairs cross join. Here it is a
cell-bucketed candidate join (the same cover-cell equi-join discipline
as operators/knn and operators/spatialjoin):

- bucket every point into a square cell of side >= max(radii)
  (floor division, negative-safe via pmod);
- explode the LEFT side to its 3x3 neighbor-cell probes and equi-join
  the right side on the cell key — every pair within max(radii) shares
  an adjacent cell, so candidates are exactly the local neighborhoods
  and the shuffle is an equi-join Catalyst/AQE can plan (no theta join,
  no crossJoin);
- one conditional-aggregation pass counts all radii at once (no
  per-radius re-scan), `id_a < id_b` de-duplicates unordered pairs.

Everything is int64 (squared distances against squared radii — no
sqrt, no doubles), so the driver oracle brute-forces the identical
counts in DuckDB and hash-gates them. Coordinate contract: candidates
are confined to adjacent cells, so |dx|, |dy| <= 2*cell and the d2
arithmetic needs cell < ~7.5e8 to stay inside int64 — microdegree or
millimeter planar grids fit with room.

Scale shape at 100 TB: the exchange is the candidate join keyed on
cells — partial-aggregated conditional sums collapse each task's pairs
to one row per (group, radius) before the final tiny agg; a dense
hotspot cell is the natural skew risk and is exactly what AQE skew
splitting handles (the join is a plain equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_div(col, size: int):
    """Floor division for signed integer columns (Spark DIV truncates
    toward zero; pmod realigns the negative side)."""
    return F.expr(f"({col} - pmod({col}, {size})) DIV {size}")


def pair_counts(
    df: DataFrame,
    radii: list[int],
    x: str = "x",
    y: str = "y",
    id_col: str = "id",
    by: list[str] | tuple[str, ...] = (),
    cell: int | None = None,
) -> DataFrame:
    """Unordered point-pair counts within each radius: one output row
    per (``by``, ``r``) with ``n_pairs`` (pairs at squared distance
    <= r*r, inclusive; coincident points count at every radius) and
    ``n_points``. Coordinates and radii are integers by contract —
    that is what makes the counts hash-gateable cross-engine. ``cell``
    defaults to max(radii) and must be >= it (the 3x3-ring cover
    guarantee). With ``by`` groups, a group with NO candidate pairs at
    all drops from the output (its n_pairs would be 0 at every radius);
    ungrouped calls always return one row per radius."""
    if not radii:
        raise ValueError("radii must be non-empty")
    rmax = max(radii)
    if cell is None:
        cell = rmax
    if cell < rmax:
        raise ValueError(f"cell ({cell}) must be >= max(radii) ({rmax})")
    by = list(by)
    pts = df.select(
        *by,
        F.col(id_col).alias("__id__"),
        F.col(x).cast("long").alias("__x__"),
        F.col(y).cast("long").alias("__y__"),
    ).withColumns(
        {
            "__cx__": _floor_div("__x__", cell),
            "__cy__": _floor_div("__y__", cell),
        }
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = pts.select(
        *by,
        F.col("__id__").alias("__ida__"),
        F.col("__x__").alias("__xa__"),
        F.col("__y__").alias("__ya__"),
        F.explode(offsets).alias("__o__"),
        (F.col("__cx__") + F.col("__o__.dx")).alias("__pcx__"),
        (F.col("__cy__") + F.col("__o__.dy")).alias("__pcy__"),
    ).drop("__o__")
    cond = [F.col(f"__pcx__") == F.col("__cx__"), F.col("__pcy__") == F.col("__cy__")]
    for g in by:
        cond.append(probes[g].eqNullSafe(pts[g]))
    j = probes.join(pts, cond).filter(F.col("__ida__") < F.col("__id__"))
    dx = F.col("__xa__") - F.col("__x__")
    dy = F.col("__ya__") - F.col("__y__")
    d2 = (dx * dx + dy * dy).alias("__d2__")
    pairs = j.select(*[probes[g] for g in by], d2)
    aggs = [
        F.sum((F.col("__d2__") <= F.lit(int(r) * int(r))).cast("long")).alias(
            f"__c{i}__"
        )
        for i, r in enumerate(radii)
    ]
    counted = pairs.groupBy(*by).agg(*aggs)
    stack = ", ".join(
        f"CAST({int(r)} AS BIGINT), coalesce(__c{i}__, CAST(0 AS BIGINT))"
        for i, r in enumerate(radii)
    )
    long = counted.selectExpr(
        *by, f"stack({len(radii)}, {stack}) AS (r, n_pairs)"
    )
    npts = pts.groupBy(*by).agg(F.count(F.lit(1)).alias("n_points"))
    on = by if by else None
    if on:
        out = long.join(npts, on)
    else:
        out = long.crossJoin(F.broadcast(npts))
    return out.select(*by, "r", "n_pairs", "n_points")


def ripley_k(
    df: DataFrame,
    radii: list[int],
    area: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "id",
    by: list[str] | tuple[str, ...] = (),
    cell: int | None = None,
) -> DataFrame:
    """Ripley's K-hat on top of :func:`pair_counts`:
    ``K(r) = area * 2 * n_pairs / (n * (n-1))`` (the standard unordered-
    pair estimator, no edge correction — callers with border effects
    shrink the study window instead). ``area`` is the study-window area
    in squared coordinate units (an int, so the division is one pinned
    IEEE expression both engines evaluate identically on exact integer
    inputs). Under complete spatial randomness K(r) ~ pi*r^2; above =
    clustering, below = dispersion."""
    pc = pair_counts(df, radii, x=x, y=y, id_col=id_col, by=by, cell=cell)
    n = F.col("n_points").cast("double")
    k = (
        F.lit(int(area)).cast("double")
        * F.lit(2.0)
        * F.col("n_pairs").cast("double")
        / (n * (n - F.lit(1.0)))
    )
    return pc.withColumn(
        "k_hat", F.when(F.col("n_points") >= 2, k)
    )
