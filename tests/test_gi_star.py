"""Getis-Ord Gi* on the Morton grid (operators/hotspots.gi_star_cells).

The driver oracle (`grid_gi_star`) hash-gates the statistic on real data;
these tests pin the formula against a hand-computed fixture plus the
contract edges: sparse-universe moments, antimeridian wrap, degenerate
deviance -> NULL (never Infinity/NaN), and singleton universe -> NULL.
"""

import math

import pytest

from pygridmap_spark.operators import hotspots as HS

Z = 3  # 8x8 grid
N = 1 << Z


def _cells(spark, triples):
    """(ix, iy, x) rows -> a core-cell style frame with Morton ids."""
    from pygridmap_spark.functions.cellindex import py_morton

    rows = [(ix, iy, py_morton(ix, iy), x) for ix, iy, x in triples]
    return spark.createDataFrame(
        rows, "cell_ix long, cell_iy long, cell_id long, n_points long"
    )


def _by_cell(df):
    return {(r["cell_ix"], r["cell_iy"]): r for r in df.collect()}


def _expected_gi(values, i, nbr_idx):
    """Straight-line reimplementation of the Ord & Getis formula."""
    n = len(values)
    xbar = sum(values) / n
    s = math.sqrt(sum(v * v for v in values) / n - xbar * xbar)
    w = 1 + len(nbr_idx)
    num = values[i] + sum(values[j] for j in nbr_idx) - xbar * w
    den = s * math.sqrt((n * w - w * w) / (n - 1))
    return num / den


def test_hand_computed_blob_and_isolate(spark):
    # blob (2,2)=5 (2,3)=3 (3,2)=4; isolated (7,0)=1 (no wrap partner)
    triples = [(2, 2, 5), (2, 3, 3), (3, 2, 4), (6, 5, 1)]
    out = _by_cell(HS.gi_star_cells(_cells(spark, triples), Z))
    vals = [5, 3, 4, 1]
    # (2,2): neighbors (2,3) and (3,2)
    assert out[(2, 2)]["w_i"] == 3
    assert out[(2, 2)]["gi_z"] == pytest.approx(_expected_gi(vals, 0, [1, 2]))
    # (2,3) and (3,2) are diagonal neighbors of each other too
    assert out[(2, 3)]["w_i"] == 3
    assert out[(2, 3)]["gi_z"] == pytest.approx(_expected_gi(vals, 1, [0, 2]))
    # the isolate: w=1, below the mean -> negative score
    assert out[(6, 5)]["w_i"] == 1
    assert out[(6, 5)]["gi_z"] == pytest.approx(_expected_gi(vals, 3, []))
    assert out[(6, 5)]["gi_z"] < 0


def test_antimeridian_wrap_gathers_neighbor(spark):
    triples = [(0, 4, 9), (N - 1, 4, 7), (4, 4, 1), (4, 6, 1)]
    out = _by_cell(HS.gi_star_cells(_cells(spark, triples), Z))
    assert out[(0, 4)]["w_i"] == 2  # wraps to (7,4); (4,*) are far
    assert out[(N - 1, 4)]["w_i"] == 2
    vals = [9, 7, 1, 1]
    assert out[(0, 4)]["gi_z"] == pytest.approx(_expected_gi(vals, 0, [1]))


def test_equal_counts_yield_null_not_inf(spark):
    triples = [(1, 1, 4), (5, 5, 4), (2, 6, 4)]
    out = _by_cell(HS.gi_star_cells(_cells(spark, triples), Z))
    assert all(r["gi_z"] is None for r in out.values())


def test_singleton_universe_null(spark):
    out = _by_cell(HS.gi_star_cells(_cells(spark, [(3, 3, 5)]), Z))
    assert out[(3, 3)]["gi_z"] is None


def test_full_neighborhood_universe_degenerate_null(spark):
    # all 9 cells of one 3x3 block occupied: the center's neighborhood IS
    # the universe (w == n) -> den == 0 -> NULL, the edge cells still score
    triples = [(ix, iy, (ix + 2 * iy) % 3 + 1) for ix in (2, 3, 4) for iy in (2, 3, 4)]
    out = _by_cell(HS.gi_star_cells(_cells(spark, triples), Z))
    assert out[(3, 3)]["w_i"] == 9
    assert out[(3, 3)]["gi_z"] is None
    assert out[(2, 2)]["gi_z"] is not None


def test_hot_center_scores_highest(spark):
    # a dense 3x3 blob in a field of ones: the blob center maximizes gi_z
    triples = [(ix, iy, 1) for ix in range(8) for iy in range(8)]
    triples = [
        (ix, iy, 50 if abs(ix - 3) <= 1 and abs(iy - 3) <= 1 else x)
        for ix, iy, x in triples
    ]
    out = _by_cell(HS.gi_star_cells(_cells(spark, triples), Z))
    best = max(out.values(), key=lambda r: r["gi_z"])
    assert (best["cell_ix"], best["cell_iy"]) == (3, 3)
    assert out[(0, 0)]["gi_z"] < 0
