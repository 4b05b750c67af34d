"""Grid-cell hotspot clustering — DBSCAN-lite over the Morton cell grid.

Dense-cell detection is the north star's own framing ("skew from dense
cells: popular hosts, urban geocodes"): cluster the geolocated point mass
into contiguous hotspots so downstream stages can treat urban blobs as
units (salting targets, per-hotspot sampling quotas, map rendering). The
classic density algorithm (DBSCAN, Ester et al. 1996, public) degrades to
an exact grid variant when eps is the cell pitch: a cell is CORE when it
holds >= min_points points, and clusters are the connected components of
core cells under 8-neighbor adjacency. That formulation is exactly
Spark-shaped:

1. points -> cells: the Morton index (pure codegen) + ONE partially
   aggregated ``groupBy(cell).count()`` — the map-side combine absorbs the
   dense-cell skew this operator exists to find (a 10^9-point city block
   arrives at the reducer as ~one row per upstream partition);
2. core-cell adjacency: each core cell expands to its 8 neighbors
   (integer cell arithmetic; east/west WRAPS the antimeridian, a step past
   a pole has no cell — the ``geohash_neighbors`` contract) and equi-joins
   back against the core set. The frame here is CELLS (<= 4^z, orders
   below the point count), so AQE broadcasts it when small;
3. components: a blocked union-find — ONE grouped Arrow kernel labels each
   2^B x 2^B block of the grid locally (vectorized min-label propagation
   with pointer jumping, O(log diameter) numpy sweeps, never per-row
   Python), and only the cross-block adjacencies go through the generic
   pointer-jumping loop (``dedup.connected_components``) — on the LOCAL
   ROOT graph, orders smaller than the cell graph and empty whenever the
   grid fits one block. Cluster id = min Morton cell_id reachable,
   deterministic under any partitioning.

Rows with NULL/NaN coordinates get NULL cell keys upstream
(functions/cellindex.py) and fall out of the count — they can neither
create nor join a hotspot.

Reference parity: pygridmap has no clustering operator; this extends the
family the same way the kNN cell-ring does (SURVEY §2.11), on the same
cell index. Scale: stage 1 is the only pass over the facts; everything
after runs on the (bounded) occupied-cell set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex as CI
from pygridmap_spark.operators.dedup import connected_components

#: 8-neighbor offsets, same slot convention as GEOHASH_NEIGHBOR_OFFSETS.
NEIGHBOR_OFFSETS = (
    (-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1),
)


def core_cells(
    points: DataFrame,
    z: int,
    min_points: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Occupied-cell counts at zoom ``z``, filtered to the core set:
    ``(cell_ix, cell_iy, cell_id, n_points)`` with n_points >= min_points.
    One partially-aggregated shuffle over the facts; NULL cells (bad
    coordinates) are dropped."""
    ix, iy = CI.lonlat_to_cell_xy(F.col(lon), F.col(lat), z)
    idx = points.withColumns({"cell_ix": ix, "cell_iy": iy})
    # Morton AFTER the aggregation: cell_id is a pure function of the
    # group key, so spreading bits on the <= 4^z cell rows instead of on
    # every fact row removes the ~200-node Morton tree from the per-point
    # path AND from the facts subtree the driver re-optimizes at every
    # AQE stage boundary (measured: these statistics are driver-gap-bound
    # at bench scale — see OPTIMIZATION_r06.md). The filter stays on
    # cell_ix (NULL under the same guard, and the predicate-pushed copy
    # is a few clamp ops, not the 64x-fanout spread).
    return (
        idx.filter(F.col("cell_ix").isNotNull())
        .groupBy("cell_ix", "cell_iy")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .filter(F.col("n_points") >= F.lit(min_points))
        .withColumn("cell_id", CI.morton(F.col("cell_ix"), F.col("cell_iy")))
        .select("cell_ix", "cell_iy", "cell_id", "n_points")
    )


def _neighbor_probes(cells: DataFrame, z: int, extra: tuple = ()) -> DataFrame:
    """Explode each core cell into its 8 neighbor keys (lon wraps, lat
    clamps): columns (*extra, cell_id, nix, niy)."""
    n = 1 << z
    probes = F.array(
        *[
            F.struct(
                ((F.col("cell_ix") + F.lit(dx + n)) % F.lit(n)).alias("nix"),
                (F.col("cell_iy") + F.lit(dy)).alias("niy"),
            )
            for dx, dy in NEIGHBOR_OFFSETS
        ]
    )
    return (
        cells.select(*extra, "cell_id", F.explode(probes).alias("p"))
        .select(
            *extra,
            "cell_id",
            F.col("p.nix").alias("nix"),
            F.col("p.niy").alias("niy"),
        )
        .filter((F.col("niy") >= 0) & (F.col("niy") < F.lit(n)))
    )


def hotspot_cells(
    points: DataFrame,
    z: int,
    min_points: int = 1,
    lon: str = "lon",
    lat: str = "lat",
    max_iter: int = 25,
) -> DataFrame:
    """Label core cells with their hotspot cluster: returns
    ``(cell_ix, cell_iy, cell_id, n_points, cluster_id)`` where cluster_id
    is the MIN Morton cell_id of the connected component (8-neighbor
    adjacency, antimeridian wrap). Core cells with no core neighbor are
    their own singleton cluster."""
    # no checkpoint: the blocked labeling consumes the cell frame exactly
    # once (n_points rides through the kernel), so the whole query is one
    # linear plan — a checkpoint here would be a pure extra job
    cells = core_cells(points, z, min_points, lon=lon, lat=lat)
    return label_cells(cells, z, max_iter=max_iter)


def _label_block_kernel(z: int, block_bits: int):
    """Build the per-block union-find kernel for :func:`label_cells`.

    Vectorized min-label propagation over positions sorted by cell_id:
    each sweep gathers the 8 neighbors' labels (searchsorted probes on the
    (ix << 32 | iy) key, computed once) and takes the elementwise min,
    then pointer-jumps (lab <- lab[lab]) until stable — O(log diameter)
    numpy passes, no per-row Python. Because positions are in cell_id
    order, the fixed-point label position IS the min Morton id of the
    fragment. When the block spans the full x range (z <= block_bits) the
    east/west probes wrap the antimeridian in-kernel; y never wraps."""
    import numpy as np
    import pandas as pd

    n = 1 << z
    wrap_x = z <= block_bits

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["cell_ix", "cell_iy", "cell_id", "n_points"]].sort_values(
            "cell_id", ignore_index=True
        )
        m = len(out)
        ix = out["cell_ix"].to_numpy(np.int64)
        iy = out["cell_iy"].to_numpy(np.int64)
        key = (ix << np.int64(32)) | iy
        order = np.argsort(key)
        skey = key[order]
        probes = []
        for dx, dy in NEIGHBOR_OFFSETS:
            nix = ix + dx
            if wrap_x:
                nix = (nix + n) % n
            niy = iy + dy
            nkey = (nix << np.int64(32)) | niy
            pos = np.searchsorted(skey, nkey)
            pos_c = np.minimum(pos, max(m - 1, 0))
            cand = order[pos_c] if m else pos_c
            ok = (skey[pos_c] == nkey) & (niy >= 0) & (niy < n) if m else nkey < nkey
            if ok.any():
                # row indices are unique per offset: plain gather/scatter min
                probes.append((cand[ok], np.flatnonzero(ok)))
        lab = np.arange(m, dtype=np.int64)
        while True:
            new = lab.copy()
            for cand, rows in probes:
                new[rows] = np.minimum(new[rows], new[cand])
            while True:
                jumped = new[new]
                if np.array_equal(jumped, new):
                    break
                new = jumped
            if np.array_equal(new, lab):
                break
            lab = new
        out["root_id"] = out["cell_id"].to_numpy(np.int64)[lab]
        return out

    return _kernel


def label_cells(
    cells: DataFrame, z: int, max_iter: int = 25, block_bits: int = 10
) -> DataFrame:
    """Cluster-label a precomputed (cell_ix, cell_iy, cell_id, n_points)
    core-cell frame (the bounded <= 4^z tail of hotspot_cells — callers
    that already hold a cell rollup skip the facts pass entirely).

    Round-6 shape: blocked union-find. ONE grouped Arrow kernel labels
    each 2^block_bits-square block of the grid locally (<= 4^block_bits
    cells per task — bounded memory at any zoom), then only the
    CROSS-BLOCK adjacencies — edges between the local roots of border
    cells — go through the generic pointer-jumping loop, whose input is
    orders smaller than the cell graph (O(block perimeter) nodes) and
    whose rounds are O(log diameter-in-blocks). A grid that fits a single
    block (z <= block_bits) needs no cross-block pass at all: the whole
    labeling is one exchange + one kernel, replacing the old
    per-cell-graph loop's ~4 stages x O(log diameter) rounds of fixed
    fees. Local labels are min Morton ids of their fragment, so the merge
    of fragments under min-label equals the component min exactly."""
    kernel = _label_block_kernel(z, block_bits)
    schema = "cell_ix long, cell_iy long, cell_id long, n_points long, root_id long"
    base = cells.select("cell_ix", "cell_iy", "cell_id", "n_points")
    labeled = (
        base.groupBy(
            F.shiftright(F.col("cell_ix"), block_bits).alias("__bx__"),
            F.shiftright(F.col("cell_iy"), block_bits).alias("__by__"),
        )
        .applyInPandas(lambda _k, pdf: kernel(pdf), schema)
    )
    if z <= block_bits:
        # single covering block: antimeridian wrap handled in-kernel,
        # cross-block edges impossible
        return labeled.select(
            "cell_ix",
            "cell_iy",
            "cell_id",
            "n_points",
            F.col("root_id").alias("cluster_id"),
        )
    # multi-block: link local roots across block borders (x wraps the
    # antimeridian — always a cross-block step since n > block size)
    labeled = labeled.localCheckpoint(eager=True)
    n = 1 << z
    bs = 1 << block_bits
    border = labeled.filter(
        (F.col("cell_ix") % bs == 0)
        | (F.col("cell_ix") % bs == bs - 1)
        | (F.col("cell_iy") % bs == 0)
        | (F.col("cell_iy") % bs == bs - 1)
    )
    probes = _neighbor_probes(border, z, extra=("root_id", "cell_ix", "cell_iy"))
    cross = probes.filter(
        (F.shiftright(F.col("nix"), block_bits) != F.shiftright(F.col("cell_ix"), block_bits))
        | (F.shiftright(F.col("niy"), block_bits) != F.shiftright(F.col("cell_iy"), block_bits))
    )
    edges = cross.join(
        labeled.select(
            F.col("cell_ix").alias("nix"),
            F.col("cell_iy").alias("niy"),
            F.col("root_id").alias("nbr_root"),
        ),
        ["nix", "niy"],
    ).select(F.col("root_id").alias("a"), F.col("nbr_root").alias("b"))
    remap = connected_components(edges, a="a", b="b", max_iter=max_iter).select(
        F.col("doc_id").alias("root_id"), F.col("component_id").alias("__comp__")
    )
    return labeled.join(remap, "root_id", "left").select(
        "cell_ix",
        "cell_iy",
        "cell_id",
        "n_points",
        F.coalesce(F.col("__comp__"), F.col("root_id")).alias("cluster_id"),
    )


def hotspot_stats(
    points: DataFrame,
    z: int,
    min_points: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-hotspot rollup: ``(cluster_id, n_cells, n_points)`` sorted by
    cluster_id — the headline 'where is the mass' table."""
    cells = hotspot_cells(points, z, min_points, lon=lon, lat=lat)
    return (
        cells.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_points").alias("n_points"),
        )
        .orderBy("cluster_id")
    )


def _scatter_gather(cells: DataFrame, z: int, value: str, keys: list) -> DataFrame:
    """Shared 8-neighbor gather for the autocorrelation statistics: for
    each occupied cell, the sum of ``value`` over its OCCUPIED neighbors
    and the occupied-neighbor count (binary weights, no self).

    Round-6 shape: SCATTER-by-union instead of probe-join — every cell
    UNIONs one self row with 8 contribution rows addressed at its
    neighbors' (ix, iy), and ONE partially-aggregated groupBy folds them;
    groups without a self row are unoccupied scatter targets and drop.
    Equivalent to the old explode+equi-join+agg (neighbor contributions
    only ever come from occupied cells) but costs one exchange and ZERO
    join/broadcast stages — at bench scale each extra stage is a fixed
    codegen+serialize fee that dominated these statistics (measured,
    OPTIMIZATION_r06.md), and at lake scale one exchange of 9x the
    bounded cell frame strictly beats an exchange plus a broadcast build
    of the same frame. East/west wraps the antimeridian; a step past a
    pole has no cell (the geohash_neighbors contract).

    Returns one row per occupied cell: (*keys, cell_ix, cell_iy,
    value, __nbr_sum__, __nbr_cnt__) — the latter two NULL (not 0) when
    the cell has no occupied neighbor, matching the old left-join
    semantics. ``value`` must be non-null (cell counts always are)."""
    n = 1 << z
    x = F.col(value)
    self_rows = cells.select(
        *keys,
        "cell_ix",
        "cell_iy",
        x.alias("__v__"),
        F.lit(1).alias("__self__"),
    )
    probes = F.array(
        *[
            F.struct(
                ((F.col("cell_ix") + F.lit(dx + n)) % F.lit(n)).alias("nix"),
                (F.col("cell_iy") + F.lit(dy)).alias("niy"),
            )
            for dx, dy in NEIGHBOR_OFFSETS
        ]
    )
    nbr_rows = (
        cells.select(*keys, x.alias("__v__"), F.explode(probes).alias("__p__"))
        .select(
            *keys,
            F.col("__p__.nix").alias("cell_ix"),
            F.col("__p__.niy").alias("cell_iy"),
            "__v__",
            F.lit(0).alias("__self__"),
        )
        .filter((F.col("cell_iy") >= 0) & (F.col("cell_iy") < F.lit(n)))
    )
    is_self = F.col("__self__") == 1
    return (
        self_rows.unionByName(nbr_rows)
        .groupBy(*keys, "cell_ix", "cell_iy")
        .agg(
            F.max(F.when(is_self, F.col("__v__"))).alias(value),
            F.sum(F.when(~is_self, F.col("__v__"))).alias("__nbr_sum__"),
            F.sum(F.when(~is_self, F.lit(1))).alias("__nbr_cnt__"),
        )
        .filter(F.col(value).isNotNull())
    )


def morans_i_cells(
    cells: DataFrame,
    z: int,
    value: str = "n_points",
    by: str | None = None,
) -> DataFrame:
    """Global Moran's I spatial autocorrelation (Moran 1950, "Notes on
    Continuous Stochastic Phenomena", public formula) over the occupied
    cell set with binary 8-neighbor weights (no self) — the global twin of
    ``gi_star_cells``: one number answering "is the field clustered at
    all" before the per-cell scores say where.

        I = (n / S0) * sum_ij w_ij (x_i - xbar)(x_j - xbar)
                     / sum_i (x_i - xbar)^2

    plus the normality z-score E[I] = -1/(n-1),
    Var[I] = (n^2 S1 - n S2 + 3 S0^2) / ((n^2 - 1) S0^2) - E[I]^2 with
    S1 = 2 S0 and S2 = 4 sum_i w_i^2 for symmetric binary weights (Cliff &
    Ord 1981 moments, public).

    Exactness/portability: every accumulated moment is an exact integer —
    the cross product expands as sum_ij w_ij x_i x_j - 2 xbar sum_i w_i x_i
    + xbar^2 S0, so the only doubles are the final few expressions, which
    the DuckDB oracle restates verbatim and hash-matches.

    Plan shape: the neighbor gather is the shared explode+equi-join on the
    bounded cell frame; the statistic itself is ONE tiny aggregate (one
    row per ``by`` group, or a single row). Cost is bounded by the
    occupied-cell set, never the fact table. Returns
    ``(by?, n_cells, s0, morans_i, e_i, z_i)``; morans_i/z_i NULL when the
    deviance or S0 is zero (constant field / no adjacent pair).
    """
    keys = [by] if by else []
    x = F.col(value).cast("long")
    base = cells.select(*keys, "cell_ix", "cell_iy", x.alias("__x__"))
    g = _scatter_gather(base, z, "__x__", keys).select(
        *keys,
        "__x__",
        F.coalesce(F.col("__nbr_sum__"), F.lit(0)).alias("__ns__"),
        F.coalesce(F.col("__nbr_cnt__"), F.lit(0)).alias("__nc__"),
    )
    aggs = [
        F.count(F.lit(1)).alias("__n__"),
        F.sum("__x__").alias("__sx__"),
        F.sum(F.col("__x__") * F.col("__x__")).alias("__sxx__"),
        F.sum("__nc__").alias("__s0__"),
        F.sum(F.col("__nc__") * F.col("__nc__")).alias("__swsq__"),
        F.sum(F.col("__x__") * F.col("__ns__")).alias("__sxnx__"),
        F.sum(F.col("__x__") * F.col("__nc__")).alias("__sxw__"),
    ]
    m = g.groupBy(*keys).agg(*aggs) if keys else g.agg(*aggs)
    n = F.col("__n__").cast("double")
    s0 = F.col("__s0__").cast("double")
    xbar = F.col("__sx__").cast("double") / n
    num = (
        F.col("__sxnx__").cast("double")
        - F.lit(2.0) * xbar * F.col("__sxw__").cast("double")
        + xbar * xbar * s0
    )
    den = F.col("__sxx__").cast("double") - n * xbar * xbar
    morans = (n / s0) * num / den
    e_i = F.lit(-1.0) / (n - F.lit(1.0))
    s1 = F.lit(2.0) * s0
    s2 = F.lit(4.0) * F.col("__swsq__").cast("double")
    var_i = (n * n * s1 - n * s2 + F.lit(3.0) * s0 * s0) / (
        (n * n - F.lit(1.0)) * s0 * s0
    ) - e_i * e_i
    ok = (F.col("__n__") > 2) & (F.col("__s0__") > 0) & (den > 0)
    return m.select(
        *keys,
        F.col("__n__").alias("n_cells"),
        F.col("__s0__").alias("s0"),
        F.when(ok, morans).alias("morans_i"),
        F.when(F.col("__n__") > 1, e_i).alias("e_i"),
        F.when(ok & (var_i > 0), (morans - e_i) / F.sqrt(var_i)).alias("z_i"),
    )


def local_morans_cells(
    cells: DataFrame,
    z: int,
    value: str = "n_points",
) -> DataFrame:
    """Local Moran's I (Anselin 1995, "Local Indicators of Spatial
    Association — LISA", public formula) per occupied cell with binary
    8-neighbor weights: I_i = ((x_i - xbar) / m2) * sum_j w_ij (x_j - xbar)
    with m2 the population variance. Classifies each cell into the Moran
    scatterplot quadrant (``HH``/``LL``/``HL``/``LH`` — high surrounded by
    high, etc., by the sign of the deviation and of the neighbor-mean
    deviation); cells with no occupied neighbor get NULL lisa/quadrant (no
    spatial lag exists — distinct from a zero score).

    Same plan shape as ``gi_star_cells``: one cell-frame neighbor gather +
    one single-row moment broadcast; returns
    ``(cell_ix, cell_iy, cell_id, value, w_i, lisa_i, quadrant)``.
    """
    x = F.col(value).cast("long")
    base = cells.select("cell_ix", "cell_iy", x.alias("__x__"))
    glob = base.agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum("__x__").alias("__sx__"),
        F.sum(F.col("__x__") * F.col("__x__")).alias("__sxx__"),
    )
    j = _scatter_gather(base, z, "__x__", []).crossJoin(F.broadcast(glob))
    n = F.col("__n__").cast("double")
    xbar = F.col("__sx__").cast("double") / n
    m2 = F.col("__sxx__").cast("double") / n - xbar * xbar
    dev = F.col("__x__").cast("double") - xbar
    lag_dev = (
        F.col("__nbr_sum__").cast("double")
        - F.col("__nbr_cnt__").cast("double") * xbar
    )
    lisa = F.when(
        F.col("__nbr_cnt__").isNotNull() & (m2 > 0), dev * lag_dev / m2
    )
    quad = F.when(
        F.col("__nbr_cnt__").isNotNull() & (m2 > 0),
        F.concat(
            F.when(dev >= 0, F.lit("H")).otherwise(F.lit("L")),
            F.when(lag_dev >= 0, F.lit("H")).otherwise(F.lit("L")),
        ),
    )
    return j.select(
        "cell_ix",
        "cell_iy",
        # Morton from the (bounded) gathered frame — cell_id is a pure
        # function of (ix, iy), so the spread runs on cells, not facts
        CI.morton(F.col("cell_ix"), F.col("cell_iy")).alias("cell_id"),
        F.col("__x__").alias(value),
        F.coalesce(F.col("__nbr_cnt__"), F.lit(0)).alias("w_i"),
        lisa.alias("lisa_i"),
        quad.alias("quadrant"),
    )


def gi_star_cells(
    cells: DataFrame,
    z: int,
    value: str = "n_points",
    by: str | None = None,
) -> DataFrame:
    """Getis-Ord Gi* hotspot z-score per occupied cell (Ord & Getis 1995,
    "Local Spatial Autocorrelation Statistics", public formula) with binary
    8-neighbor + self weights on the Morton grid.

    The universe is the OCCUPIED cell set (the sparse formulation): n, the
    mean and the deviance are taken over cells that hold mass, and a
    neighbor slot only contributes weight when that neighbor is occupied.
    That is the only formulation whose cost is bounded by the occupied
    set — zero-filling the 4^z ocean at z=20+ is a non-starter — and it
    answers the sharper question "is this cell hot AMONG the populated
    cells". Empty-as-zero semantics, when wanted, are one zero-fill union
    away on a caller-bounded extent.

        Gi*_i = (sum_j w_ij x_j - xbar * W_i)
                / (s * sqrt((n * W_i - W_i^2) / (n - 1)))

    with W_i = 1 + #occupied neighbors, xbar/s the global mean/population
    stddev. NULL when the deviance is zero (all cells equal) or n == 1 —
    never Infinity/NaN.

    Plan shape: the input is a cell rollup (bounded <= 4^z, orders below
    the fact table it came from — ``core_cells`` is the one facts pass).
    Global moments are ONE tiny agg crossJoined back (single-row broadcast,
    exact integer sums). The neighbor gather is the ``_neighbor_probes``
    explode (x8) + one equi-join + one partial agg on the cell frame, so
    the whole statistic never reshuffles the facts. East/west wraps the
    antimeridian; a step past a pole has no cell (same contract as the
    cluster labeling above).

    ``by`` partitions the statistic: the universe, moments and neighbor
    gather are all scoped per distinct ``by`` value (e.g. the time-bin
    column of a space-time cube — each slice gets its own Gi* field; the
    moments frame is |by|-rows and stays a broadcast).
    """
    keys = [by] if by else []
    x = F.col(value).cast("long")
    base = cells.select(*keys, "cell_ix", "cell_iy", x.alias("__x__"))
    aggs = [
        F.count(F.lit(1)).alias("__n__"),
        F.sum("__x__").alias("__sx__"),
        F.sum(F.col("__x__") * F.col("__x__")).alias("__sxx__"),
    ]
    glob = base.groupBy(*keys).agg(*aggs) if keys else base.agg(*aggs)
    j = (
        _scatter_gather(base, z, "__x__", keys)
        .withColumn("__nbr_sum__", F.coalesce(F.col("__nbr_sum__"), F.lit(0)))
        .withColumn("__nbr_cnt__", F.coalesce(F.col("__nbr_cnt__"), F.lit(0)))
    )
    j = j.join(F.broadcast(glob), keys) if keys else j.crossJoin(F.broadcast(glob))
    n = F.col("__n__").cast("double")
    xbar = F.col("__sx__").cast("double") / n
    # population variance from exact integer sums: E[x^2] - E[x]^2
    s2 = F.col("__sxx__").cast("double") / n - xbar * xbar
    w = (F.lit(1) + F.col("__nbr_cnt__")).cast("double")
    num = (F.col("__x__") + F.col("__nbr_sum__")).cast("double") - xbar * w
    den = F.sqrt(s2) * F.sqrt((n * w - w * w) / (n - F.lit(1.0)))
    gi = F.when((F.col("__n__") > 1) & (s2 > 0) & (den > 0), num / den)
    return j.select(
        *keys,
        "cell_ix",
        "cell_iy",
        # Morton on the bounded cell frame (pure function of the group key)
        CI.morton(F.col("cell_ix"), F.col("cell_iy")).alias("cell_id"),
        F.col("__x__").alias(value),
        (F.lit(1) + F.col("__nbr_cnt__")).alias("w_i"),
        gi.alias("gi_z"),
    )
