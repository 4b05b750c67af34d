"""convex_hull_points pins: canonical CCW-from-min form, collinear
exclusion, duplicate collapse, degenerate groups, NULL raise, and parity
with a brute-force hull-membership check (a point is OUTSIDE iff some
hull edge has it strictly right — independent of the chain algorithm)."""

from __future__ import annotations

import itertools

import pytest

from pygridmap_spark.operators import hulls as HL


def _hull(spark, rows):
    df = spark.createDataFrame(rows, "g long, x long, y long")
    out = HL.convex_hull_points(df, "g", x="x", y="y").collect()
    res = {}
    for r in sorted(out, key=lambda r: (r.g, r.pos)):
        res.setdefault(r.g, []).append((r.x, r.y))
    return res


def test_square_with_interior_and_collinear(spark):
    rows = [(1, 0, 0), (1, 4, 0), (1, 4, 4), (1, 0, 4),
            (1, 2, 2), (1, 2, 0), (1, 1, 1), (1, 4, 2)]
    assert _hull(spark, rows) == {1: [(0, 0), (4, 0), (4, 4), (0, 4)]}


def test_degenerate_groups(spark):
    rows = [(1, 7, 7),                       # single point
            (2, 0, 0), (2, 5, 5), (2, 2, 2),  # collinear
            (3, 1, 1), (3, 1, 1), (3, 1, 1)]  # duplicates of one point
    got = _hull(spark, rows)
    assert got == {1: [(7, 7)], 2: [(0, 0), (5, 5)], 3: [(1, 1)]}


def test_ccw_orientation_and_start_vertex(spark):
    rows = [(1, 0, 0), (1, 10, 0), (1, 10, 10), (1, 0, 10), (1, 5, -3)]
    [(g, hull)] = _hull(spark, rows).items()
    assert hull[0] == (0, 0)  # smallest (x, y)
    area2 = sum(
        hull[i][0] * hull[(i + 1) % len(hull)][1]
        - hull[(i + 1) % len(hull)][0] * hull[i][1]
        for i in range(len(hull))
    )
    assert area2 > 0  # shoelace positive == CCW


def _brute_check(points, hull):
    # every hull edge must have NO point strictly right; every hull vertex
    # must be an input point; every input point must be inside-or-on
    pts = set(points)
    assert set(hull) <= pts
    n = len(hull)
    if n < 3:
        return
    for i in range(n):
        (ax, ay), (bx, by) = hull[i], hull[(i + 1) % n]
        for (qx, qy) in pts:
            assert (bx - ax) * (qy - ay) - (by - ay) * (qx - ax) >= 0


def test_parity_with_brute_force_many_groups(spark):
    rows = []
    clouds = {}
    for g in range(12):
        pts = [
            (((g + 1) * 7919 * i) % 2001 - 1000,
             ((g + 3) * 104729 * i) % 2001 - 1000)
            for i in range(1, 80)
        ]
        clouds[g] = pts
        rows += [(g, px, py) for px, py in pts]
    got = _hull(spark, rows)
    assert set(got) == set(clouds)
    for g, hull in got.items():
        _brute_check(clouds[g], hull)
        assert 3 <= len(hull) < 80


def test_null_coordinate_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (1, None, 4)], "g long, x long, y long"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        HL.convex_hull_points(df, "g", x="x", y="y").collect()


def test_prereduce_bit_identical(spark):
    rows = []
    for g in range(6):
        rows += [
            (g,
             ((g + 1) * 7919 * i) % 2001 - 1000,
             ((g + 3) * 104729 * i) % 2001 - 1000)
            for i in range(1, 400)
        ]
    df = spark.createDataFrame(rows, "g long, x long, y long").repartition(7)
    a = sorted(map(tuple, HL.convex_hull_points(df, "g").collect()))
    b = sorted(
        map(tuple, HL.convex_hull_points(df, "g", prereduce=True).collect())
    )
    assert a == b and len(a) > 6 * 3


def test_prereduce_null_group_key_and_big_keys(spark):
    big = 2**53
    rows = [(None, 0, 0), (None, 9, 0), (None, 9, 9), (None, 4, 4),
            (big, 0, 0), (big, 3, 3), (big + 1, 0, 1), (big + 1, 2, 1)]
    df = spark.createDataFrame(rows, "g long, x long, y long").repartition(3)
    out = HL.convex_hull_points(df, "g", prereduce=True).collect()
    got = {}
    for r in sorted(out, key=lambda r: (str(r.g), r.pos)):
        got.setdefault(r.g, []).append((r.x, r.y))
    assert got[None] == [(0, 0), (9, 0), (9, 9)]
    assert got[big] == [(0, 0), (3, 3)]
    assert got[big + 1] == [(0, 1), (2, 1)]
