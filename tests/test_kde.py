"""Grid quartic-kernel density (operators/kde) pins.

The driver oracle (`kde_heatmap`) hash-gates the exact integer kernel
sums against a brute-force restatement in DuckDB; these pin the kernel
math itself against a Python twin — exact contributions, ring-cover
completeness (wider cells change nothing), mass concentration at the
point, zero-cells absent, the overflow-safe out-of-kernel ring points,
and by-group isolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygridmap_spark.operators import kde as KD


def _py_kde(pts, h, g):
    import collections

    out = collections.defaultdict(int)
    for px, py in pts:
        cx0 = (px - (px % g)) // g
        cy0 = (py - (py % g)) // g
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = cx0 + dx, cy0 + dy
                d2 = (2 * px - (2 * cx * g + g)) ** 2 + (
                    2 * py - (2 * cy * g + g)
                ) ** 2
                if d2 <= 4 * h * h:
                    out[(cx, cy)] += (4 * h * h - d2) ** 2
    return {k: v for k, v in out.items() if v > 0}


def _df(spark, pts):
    return spark.createDataFrame(pts, "x long, y long")


def test_matches_python_twin_incl_negatives(spark):
    pts = [((i * 48271) % 2001 - 1000, (i * 16807) % 2001 - 1000)
           for i in range(150)]
    h = 300
    want = _py_kde(pts, h, h)
    got = {(r.cell_x, r.cell_y): int(r.kernel_sum) for r in
           KD.kde_grid(_df(spark, pts), h).collect()}
    assert got == want


def test_wider_cell_changes_cells_not_mass_at_center(spark):
    # a single point dead-center of a cell: its own-cell contribution is
    # the full kernel peak (d=0 -> (4h^2)^2) regardless of cell width
    h = 100
    pts = [(50, 50)]  # center of cell (0,0) at g=h=100
    [r] = [row for row in KD.kde_grid(_df(spark, pts), h).collect()
           if (row.cell_x, row.cell_y) == (0, 0)]
    assert int(r.kernel_sum) == (4 * h * h) ** 2
    assert r.kde == pytest.approx(1.0)  # peak mass = 1 point


def test_far_ring_points_contribute_zero_not_overflow(spark):
    # two points in adjacent cells, farther apart than h: each appears
    # in the other's ring with d > h -> gated to zero, no ANSI overflow
    g = 10**6
    pts = [(0, 0), (g + g // 2, 0)]
    rows = KD.kde_grid(_df(spark, pts), 1000, cell=g).collect()
    assert all(int(r.kernel_sum) > 0 for r in rows)


def test_cells_without_nearby_points_absent(spark):
    pts = [(5, 5)]
    got = {(r.cell_x, r.cell_y) for r in
           KD.kde_grid(_df(spark, pts), 10).collect()}
    assert got <= {(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
    assert (0, 0) in got


def test_by_group_isolation(spark):
    df = spark.createDataFrame(
        [("a", 5, 5), ("b", 5, 5)], "g string, x long, y long"
    )
    rows = KD.kde_grid(df, 10, by=["g"]).collect()
    per = {}
    for r in rows:
        per.setdefault(r.g, 0)
        per[r.g] += int(r.kernel_sum)
    assert per["a"] == per["b"] > 0  # identical, separate


def test_contract_errors(spark):
    with pytest.raises(ValueError, match="bandwidth"):
        KD.kde_grid(_df(spark, [(0, 0)]), 0)
    with pytest.raises(ValueError, match="cell"):
        KD.kde_grid(_df(spark, [(0, 0)]), 100, cell=50)
