"""Point-pattern statistics: Ripley's K pair counts over integer planar
coordinates.

Ripley's K (Ripley 1976, public; the standard spatial clustering-vs-
dispersion diagnostic) needs, for each radius r, the number of point
pairs within distance r. The pair COUNTING is the distributed-engine
problem — the naive form is an all-pairs cross join. Here it is a
cell-bucketed candidate join (the same cover-cell equi-join discipline
as operators/knn and operators/spatialjoin):

- bucket every point into a square cell of side >= max(radii)
  (floor division, negative-safe via pmod) and collect each cell's
  coordinates into ONE compact array row (a single partially-aggregated
  shuffle of 16 bytes/point);
- the candidate structure is the cell-adjacency graph, visited HALF-ward:
  each cell pairs with itself plus its 4 lex-forward neighbors
  (E, NE, N, NW in (cx, cy) order) — every unordered point pair within
  max(radii) lands in exactly ONE such cell block, so nothing is
  enumerated twice and no id-based dedup filter is needed;
- per block, an Arrow kernel counts all radii in one vectorized int64
  pass (chunked so temporaries stay cache-sized — the minhash slabbing
  discipline): pair CANDIDATES never materialize as engine rows at all,
  the exchange carries cell-array rows and the kernel returns one count
  row per block. (Round-6 rewrite: the previous shape exploded each
  point to 9 probe rows and pushed every ordered candidate pair through
  a codegen equi-join — ~2x the pair volume as rows; the kernel form
  measured ~8x faster at sf0.1 and is linear in blocks rather than
  row-count-bound.)

Everything is int64 (squared distances against squared radii — no
sqrt, no doubles), so the driver oracle brute-forces the identical
counts in DuckDB and hash-gates them. Coordinate contract: candidates
are confined to adjacent cells, so |dx|, |dy| <= 2*cell and the d2
arithmetic needs cell < ~7.5e8 to stay inside int64 — microdegree or
millimeter planar grids fit with room.

Scale shape at 100 TB: one partial-agg shuffle over the facts builds
the cell arrays; the block join is an equi-join on the bounded cell
frame (arrays ride it 5x — still ~80 bytes/point total, orders below
the old per-candidate row volume); a dense hotspot cell is the natural
skew risk and arrives at the kernel as one block whose work is
chunk-streamed, while AQE's skew split spreads distinct blocks.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _floor_div(col, size: int):
    """Floor division for signed integer columns (Spark DIV truncates
    toward zero; pmod realigns the negative side)."""
    return F.expr(f"({col} - pmod({col}, {size})) DIV {size}")


#: lex-forward neighbor offsets in (cx, cy) order: each unordered pair of
#: ADJACENT cells (a, b) with a < b satisfies b - a in this set exactly once.
_FORWARD_OFFSETS = ((0, 1), (1, -1), (1, 0), (1, 1))

#: max elements of one d2 temporary inside the kernel (int64 => 32 MB);
#: blocks larger than this stream in row chunks (the slabbing discipline).
_BLOCK_ELEMS = 4_000_000


def _block_pair_counts(xa, ya, xb, yb, r2s, upper: bool):
    """Count pairs (i in A, j in B) with d2 <= r2 per radius, chunked over
    A rows so temporaries stay bounded. ``upper`` restricts to j > i (the
    same-cell case: A is B, each unordered pair once). Returns
    (counts[len(r2s)], n_candidates)."""
    counts = np.zeros(len(r2s), dtype=np.int64)
    cand = 0
    n_a, n_b = len(xa), len(xb)
    step = max(1, _BLOCK_ELEMS // max(n_b, 1))
    jj = np.arange(n_b, dtype=np.int64)[None, :] if upper else None
    for i0 in range(0, n_a, step):
        i1 = min(i0 + step, n_a)
        d2 = xa[i0:i1, None] - xb[None, :]
        d2 *= d2
        dy = ya[i0:i1, None] - yb[None, :]
        d2 += dy * dy
        if upper:
            mask = jj > np.arange(i0, i1, dtype=np.int64)[:, None]
            cand += int(mask.sum())
            for t, r2 in enumerate(r2s):
                counts[t] += int(((d2 <= r2) & mask).sum())
        else:
            cand += d2.size
            for t, r2 in enumerate(r2s):
                counts[t] += int((d2 <= r2).sum())
    return counts, cand


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
    defaults to max(radii) and must be >= it (the adjacent-cell cover
    guarantee). With ``by`` groups, a group with NO candidate pairs at
    all (no two points share a same-or-adjacent cell) drops from the
    output (its n_pairs would be 0 at every radius); ungrouped calls
    always return one row per radius. ``id_col`` is accepted for API
    stability but ids no longer participate: points are rows, so rows
    carrying a duplicate id count as distinct points (the operator
    contract has always required unique ids)."""
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
        F.col(x).cast("long").alias("__x__"),
        F.col(y).cast("long").alias("__y__"),
    ).withColumns(
        {
            "__cx__": _floor_div("__x__", cell),
            "__cy__": _floor_div("__y__", cell),
        }
    )
    # NULL coordinates never pair (the old join dropped them via null
    # keys) but still count in n_points — exclude them from cells only
    cells = (
        pts.filter(F.col("__cx__").isNotNull() & F.col("__cy__").isNotNull())
        .groupBy(*by, "__cx__", "__cy__")
        .agg(
            F.collect_list("__x__").alias("__xs__"),
            F.collect_list("__y__").alias("__ys__"),
        )
    )
    null_arr = F.lit(None).cast("array<bigint>")
    same = cells.select(
        *by,
        F.col("__xs__").alias("__xsa__"),
        F.col("__ys__").alias("__ysa__"),
        null_arr.alias("__xsb__"),
        null_arr.alias("__ysb__"),
    )
    offsets = F.array(
        *[
            F.struct(
                (F.col("__cx__") + F.lit(dx)).alias("pcx"),
                (F.col("__cy__") + F.lit(dy)).alias("pcy"),
            )
            for dx, dy in _FORWARD_OFFSETS
        ]
    )
    probes = cells.select(
        *by,
        F.col("__xs__").alias("__xsa__"),
        F.col("__ys__").alias("__ysa__"),
        F.explode(offsets).alias("__p__"),
    )
    right = cells.select(
        *[F.col(g).alias(f"__rb{i}__") for i, g in enumerate(by)],
        F.col("__cx__").alias("__rcx__"),
        F.col("__cy__").alias("__rcy__"),
        F.col("__xs__").alias("__xsb__"),
        F.col("__ys__").alias("__ysb__"),
    )
    cond = [
        F.col("__p__.pcx") == F.col("__rcx__"),
        F.col("__p__.pcy") == F.col("__rcy__"),
    ]
    for i, g in enumerate(by):
        cond.append(probes[g].eqNullSafe(F.col(f"__rb{i}__")))
    cross = probes.join(right, cond).select(
        *by, "__xsa__", "__ysa__", "__xsb__", "__ysb__"
    )
    blocks = same.unionByName(cross)

    r2s = [int(r) * int(r) for r in radii]
    out_schema = StructType(
        [blocks.schema[g] for g in by]
        + [StructField(f"__c{i}__", LongType()) for i in range(len(r2s))]
        + [StructField("__cand__", LongType())]
    )

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            n_rows = len(pdf)
            cnt = np.zeros((n_rows, len(r2s)), dtype=np.int64)
            cand = np.zeros(n_rows, dtype=np.int64)
            xsa, ysa = pdf["__xsa__"].to_numpy(), pdf["__ysa__"].to_numpy()
            xsb, ysb = pdf["__xsb__"].to_numpy(), pdf["__ysb__"].to_numpy()
            for k in range(n_rows):
                xa = np.asarray(xsa[k], dtype=np.int64)
                ya = np.asarray(ysa[k], dtype=np.int64)
                if xsb[k] is None:
                    if len(xa) < 2:
                        continue
                    c, nc = _block_pair_counts(xa, ya, xa, ya, r2s, upper=True)
                else:
                    xb = np.asarray(xsb[k], dtype=np.int64)
                    yb = np.asarray(ysb[k], dtype=np.int64)
                    c, nc = _block_pair_counts(xa, ya, xb, yb, r2s, upper=False)
                cnt[k] = c
                cand[k] = nc
            res = pdf[by].copy() if by else pd.DataFrame(index=range(n_rows))
            for i in range(len(r2s)):
                res[f"__c{i}__"] = cnt[:, i]
            res["__cand__"] = cand
            yield res

    kern = blocks.mapInPandas(_kernel, out_schema)
    aggs = [F.sum(f"__c{i}__").alias(f"__c{i}__") for i in range(len(r2s))] + [
        F.sum("__cand__").alias("__cand__")
    ]
    counted = kern.groupBy(*by).agg(*aggs) if by else kern.agg(*aggs)
    if by:
        # group-survival contract: present iff >= 1 candidate pair existed
        counted = counted.filter(F.col("__cand__") > 0)
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
