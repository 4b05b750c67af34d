"""Moran's I — global (Moran 1950 / Cliff & Ord 1981 moments) and local
LISA (Anselin 1995) on the Morton grid (operators/hotspots).

The driver oracles (`grid_morans_i`, `grid_local_morans`) hash-gate the
statistics on real data; these tests pin the formulas against
straight-line reimplementations plus the contract edges: checkerboard
negative autocorrelation, blob positive autocorrelation, constant field
-> NULL, no-neighbor cells -> NULL lisa (not zero), antimeridian wrap,
and quadrant classification.
"""

import math

import pytest

from pygridmap_spark.operators import hotspots as HS

Z = 3  # 8x8 grid
N = 1 << Z


def _cells(spark, triples):
    from pygridmap_spark.functions.cellindex import py_morton

    rows = [(ix, iy, py_morton(ix, iy), x) for ix, iy, x in triples]
    return spark.createDataFrame(
        rows, "cell_ix long, cell_iy long, cell_id long, n_points long"
    )


def _nbrs(triples):
    """index -> list of neighbor indexes under 8-adjacency with lon wrap."""
    idx = {(ix, iy): k for k, (ix, iy, _) in enumerate(triples)}
    out = {k: [] for k in range(len(triples))}
    for k, (ix, iy, _) in enumerate(triples):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                j = idx.get(((ix + dx) % N, iy + dy))
                if j is not None:
                    out[k].append(j)
    return out


def _expected_global(triples):
    """Straight-line Moran's I + normality z (binary weights, no self)."""
    vals = [x for _, _, x in triples]
    nbrs = _nbrs(triples)
    n = len(vals)
    xbar = sum(vals) / n
    s0 = sum(len(v) for v in nbrs.values())
    num = sum(
        (vals[i] - xbar) * (vals[j] - xbar)
        for i, js in nbrs.items()
        for j in js
    )
    den = sum((v - xbar) ** 2 for v in vals)
    I = (n / s0) * num / den
    e_i = -1.0 / (n - 1)
    s1 = 2.0 * s0
    s2 = sum((2 * len(v)) ** 2 for v in nbrs.values())
    var = (n * n * s1 - n * s2 + 3.0 * s0 * s0) / ((n * n - 1.0) * s0 * s0) - e_i**2
    return I, e_i, (I - e_i) / math.sqrt(var)


def _expected_lisa(triples, i):
    vals = [x for _, _, x in triples]
    nbrs = _nbrs(triples)
    n = len(vals)
    xbar = sum(vals) / n
    m2 = sum(v * v for v in vals) / n - xbar * xbar
    return (vals[i] - xbar) * sum(vals[j] - xbar for j in nbrs[i]) / m2


def test_global_checkerboard_negative(spark):
    # 4x4 checkerboard: rook neighbors alternate (diagonals agree, so
    # queen-weight I is mildly, not extremely, negative — still below E[I])
    triples = [(ix, iy, 10 if (ix + iy) % 2 == 0 else 1)
               for ix in range(4) for iy in range(4)]
    row = HS.morans_i_cells(_cells(spark, triples), Z).collect()[0]
    I, e_i, z = _expected_global(triples)
    assert I < e_i < 0
    assert row["n_cells"] == 16
    assert row["morans_i"] == pytest.approx(I)
    assert row["e_i"] == pytest.approx(e_i)
    assert row["z_i"] == pytest.approx(z)
    assert row["z_i"] < 0


def test_global_blob_positive(spark):
    # one high blob + far low field -> positive autocorrelation
    triples = [(ix, iy, 50) for ix in (1, 2) for iy in (1, 2)]
    triples += [(ix, iy, 1) for ix in (5, 6) for iy in (5, 6)]
    row = HS.morans_i_cells(_cells(spark, triples), Z).collect()[0]
    I, _, z = _expected_global(triples)
    assert I > 0.5
    assert row["morans_i"] == pytest.approx(I)
    assert row["z_i"] == pytest.approx(z)
    assert row["z_i"] > 2


def test_global_constant_field_null(spark):
    triples = [(ix, iy, 7) for ix in (1, 2) for iy in (1, 2)]
    row = HS.morans_i_cells(_cells(spark, triples), Z).collect()[0]
    assert row["morans_i"] is None and row["z_i"] is None


def test_global_no_adjacency_null(spark):
    # three mutually distant cells: S0 == 0 -> NULL (no statistic exists)
    triples = [(0, 0, 1), (4, 4, 5), (7, 7, 9)]
    row = HS.morans_i_cells(_cells(spark, triples), Z).collect()[0]
    assert row["s0"] == 0
    assert row["morans_i"] is None


def test_global_antimeridian_wrap_counts_in_s0(spark):
    triples = [(0, 3, 5), (N - 1, 3, 2), (4, 5, 1)]
    row = HS.morans_i_cells(_cells(spark, triples), Z).collect()[0]
    assert row["s0"] == 2  # the wrapped pair, both directions
    I, _, _ = _expected_global(triples)
    assert row["morans_i"] == pytest.approx(I)


def test_global_by_partitions_universe(spark):
    from pygridmap_spark.functions.cellindex import py_morton
    import pyspark.sql.functions as F

    t_a = [(ix, iy, 10 if (ix + iy) % 2 == 0 else 1)
           for ix in range(4) for iy in range(4)]
    t_b = [(ix, iy, 50) for ix in (1, 2) for iy in (1, 2)]
    t_b += [(ix, iy, 1) for ix in (5, 6) for iy in (5, 6)]
    rows = [("a", ix, iy, py_morton(ix, iy), x) for ix, iy, x in t_a]
    rows += [("b", ix, iy, py_morton(ix, iy), x) for ix, iy, x in t_b]
    df = spark.createDataFrame(
        rows, "grp string, cell_ix long, cell_iy long, cell_id long, n_points long"
    )
    out = {r["grp"]: r for r in
           HS.morans_i_cells(df, Z, by="grp").collect()}
    assert out["a"]["morans_i"] == pytest.approx(_expected_global(t_a)[0])
    assert out["b"]["morans_i"] == pytest.approx(_expected_global(t_b)[0])


def test_lisa_values_and_quadrants(spark):
    triples = [(ix, iy, 50) for ix in (1, 2) for iy in (1, 2)]
    triples += [(ix, iy, 1) for ix in (5, 6) for iy in (5, 6)]
    out = {(r["cell_ix"], r["cell_iy"]): r
           for r in HS.local_morans_cells(_cells(spark, triples), Z).collect()}
    assert out[(1, 1)]["lisa_i"] == pytest.approx(_expected_lisa(triples, 0))
    assert out[(1, 1)]["quadrant"] == "HH"
    assert out[(5, 5)]["quadrant"] == "LL"
    assert out[(1, 1)]["lisa_i"] > 0 and out[(5, 5)]["lisa_i"] > 0


def test_lisa_outlier_quadrants(spark):
    # a low cell inside the high blob -> LH; a high isolate next to lows -> HL
    triples = [(1, 1, 50), (1, 2, 50), (2, 1, 50), (2, 2, 1),
               (5, 5, 50), (5, 6, 1), (6, 5, 1), (6, 6, 1)]
    out = {(r["cell_ix"], r["cell_iy"]): r
           for r in HS.local_morans_cells(_cells(spark, triples), Z).collect()}
    assert out[(2, 2)]["quadrant"] == "LH"
    assert out[(2, 2)]["lisa_i"] < 0
    assert out[(5, 5)]["quadrant"] == "HL"
    assert out[(5, 5)]["lisa_i"] < 0


def test_lisa_no_neighbor_null_not_zero(spark):
    triples = [(1, 1, 5), (1, 2, 3), (6, 6, 9)]
    out = {(r["cell_ix"], r["cell_iy"]): r
           for r in HS.local_morans_cells(_cells(spark, triples), Z).collect()}
    assert out[(6, 6)]["lisa_i"] is None
    assert out[(6, 6)]["quadrant"] is None
    assert out[(6, 6)]["w_i"] == 0
    assert out[(1, 1)]["lisa_i"] is not None


def test_lisa_constant_field_null(spark):
    triples = [(1, 1, 4), (1, 2, 4), (2, 1, 4)]
    out = HS.local_morans_cells(_cells(spark, triples), Z).collect()
    assert all(r["lisa_i"] is None for r in out)
