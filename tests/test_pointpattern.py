"""Ripley's K pair counts (operators/pointpattern) pins.

The driver oracle (`ripley_pair_counts`) hash-gates the cell-bucketed
candidate join against a brute-force all-pairs count in DuckDB; these
pin the counting itself against a Python brute-force twin — negatives
(the floor-div cell alignment), coincident points, by-group isolation,
the cell>=rmax contract, and the K-hat estimator under CSR.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygridmap_spark.operators import pointpattern as PP


def _brute(pts, radii):
    out = {r: 0 for r in radii}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d2 = (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            for r in radii:
                if d2 <= r * r:
                    out[r] += 1
    return out


def _pts_df(spark, pts):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )


def test_matches_bruteforce_with_negatives(spark):
    # multiplicative-hash scatter straddling the origin: floor-div cells
    pts = [((i * 2654435761) % 2001 - 1000, (i * 1103515245) % 2001 - 1000)
           for i in range(120)]
    radii = [50, 200, 700]
    want = _brute(pts, radii)
    got = {r.r: r.n_pairs for r in
           PP.pair_counts(_pts_df(spark, pts), radii).collect()}
    assert got == want


def test_coincident_points_count_at_every_radius(spark):
    pts = [(5, 5), (5, 5), (5, 5), (1000, 1000)]
    got = {r.r: r.n_pairs for r in
           PP.pair_counts(_pts_df(spark, pts), [1, 10]).collect()}
    assert got == {1: 3, 10: 3}  # C(3,2) coincident pairs, far point alone


def test_radius_boundary_inclusive(spark):
    pts = [(0, 0), (3, 4)]  # distance exactly 5
    got = {r.r: r.n_pairs for r in
           PP.pair_counts(_pts_df(spark, pts), [4, 5]).collect()}
    assert got == {4: 0, 5: 1}


def test_by_group_isolation(spark):
    df = spark.createDataFrame(
        [("g1", 0, 0, 0), ("g1", 1, 1, 0), ("g2", 2, 0, 1), ("g2", 3, 1, 1)],
        "g string, id long, x long, y long",
    )
    got = {(r.g, r.r): (r.n_pairs, r.n_points) for r in
           PP.pair_counts(df, [2], by=["g"]).collect()}
    # cross-group pairs (distance 1 apart vertically) must NOT count
    assert got == {("g1", 2): (1, 2), ("g2", 2): (1, 2)}


def test_wider_cell_same_counts(spark):
    pts = [((i * 48271) % 500, (i * 16807) % 500) for i in range(80)]
    radii = [30, 120]
    a = {r.r: r.n_pairs for r in
         PP.pair_counts(_pts_df(spark, pts), radii).collect()}
    b = {r.r: r.n_pairs for r in
         PP.pair_counts(_pts_df(spark, pts), radii, cell=400).collect()}
    assert a == b


def test_cell_smaller_than_rmax_raises(spark):
    with pytest.raises(ValueError, match="cell"):
        PP.pair_counts(_pts_df(spark, [(0, 0)]), [100], cell=50)
    with pytest.raises(ValueError, match="radii"):
        PP.pair_counts(_pts_df(spark, [(0, 0)]), [])


def test_ripley_k_near_pi_r2_under_csr(spark):
    # ~quasi-uniform scatter in a 10000^2 window: K(r) ~ pi r^2
    import math

    pts = [((i * 2654435761) % 10000, (i * 1103515245) % 10000)
           for i in range(400)]
    [row] = PP.ripley_k(
        _pts_df(spark, pts), [800], area=10000 * 10000
    ).collect()
    expect = math.pi * 800 * 800
    assert 0.6 * expect < row.k_hat < 1.4 * expect
    # n < 2 -> NULL k_hat, not a division error
    [one] = PP.ripley_k(_pts_df(spark, [(3, 3)]), [10], area=100).collect()
    assert one.k_hat is None and one.n_pairs == 0
