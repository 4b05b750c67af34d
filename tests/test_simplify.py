"""Douglas-Peucker trajectory simplification + util.grouped_frames_sorted.

The operator is pinned against an INDEPENDENT recursive DP written here
(different control flow: recursion + python floats vs the operator's
iterative numpy stack), plus contract pins: endpoints survive, straight
lines collapse, tolerance monotonicity, earliest-point tie split,
NULL/NaN raise, per-entity isolation, and group-straddles-batch carry.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark import util
from pygridmap_spark.operators import trajectories as TJ


def _ref_dp(points, tol):
    """Trusted recursive DP (point-to-segment, ties -> earliest)."""
    n = len(points)
    if n <= 2:
        return list(range(n))

    def seg_d2(p, a, b):
        ax, ay = a
        bx, by = b
        px, py = p
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            return (px - ax) ** 2 + (py - ay) ** 2
        t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
        return (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2

    def rec(i, j, keep):
        if j <= i + 1:
            return
        ds = [seg_d2(points[k], points[i], points[j]) for k in range(i + 1, j)]
        best = max(range(len(ds)), key=lambda k: (ds[k], -k))
        if ds[best] > tol * tol:
            k = i + 1 + best
            keep.add(k)
            rec(i, k, keep)
            rec(k, j, keep)

    keep = {0, n - 1}
    rec(0, n - 1, keep)
    return sorted(keep)


def _traj(u, n):
    """Deterministic wiggly path for entity u: piecewise-linear with
    hash noise — plenty of removable points at tol=0.05."""
    pts = []
    for i in range(n):
        phase = i // 15
        ax = (u * 37 + phase * 101) % 50
        ay = (u * 61 + phase * 211) % 50
        step = ((u + phase) % 7) - 3
        noise = (((u * 7919 + i * 104729) % 21) - 10) / 1000.0
        pts.append((ax + (i % 15) * step * 0.1, ay + (i % 15) * 0.05 + noise))
    return pts


def _run(spark, entities, tol, **kw):
    rows = []
    for u, n in entities:
        for i, (px, py) in enumerate(_traj(u, n)):
            rows.append((u, i, px, py))
    df = spark.createDataFrame(rows, "user_id long, seq long, lon double, lat double")
    out = TJ.simplify_trajectory(
        df, tol, entity_col="user_id", ts_col="seq", **kw
    ).toPandas()
    got = {
        u: sorted(out[out.user_id == u].seq.tolist()) for u, _ in entities
    }
    exp = {u: _ref_dp(_traj(u, n), tol) for u, n in entities}
    return got, exp


def test_matches_reference_dp_multi_entity(spark):
    got, exp = _run(spark, [(1, 60), (2, 45), (3, 1), (4, 2), (5, 80)], 0.05)
    assert got == exp
    assert 2 < len(got[1]) < 60  # non-trivial: some kept, some dropped


def test_straight_line_collapses_and_endpoints_survive(spark):
    df = spark.createDataFrame(
        [(1, i, float(i), 2.0 * i) for i in range(50)],
        "user_id long, seq long, lon double, lat double",
    )
    out = TJ.simplify_trajectory(df, 1e-9, entity_col="user_id", ts_col="seq")
    assert sorted(r.seq for r in out.collect()) == [0, 49]


def test_tolerance_monotone(spark):
    a, _ = _run(spark, [(7, 70)], 0.01)
    b, _ = _run(spark, [(7, 70)], 0.2)
    assert set(b[7]) <= set(a[7]) and len(b[7]) < len(a[7])


def test_duplicate_points_zero_length_segment(spark):
    # all points identical except one spike: L2 == 0 branch
    rows = [(1, i, 5.0, 5.0) for i in range(10)]
    rows[4] = (1, 4, 5.0, 9.0)
    df = spark.createDataFrame(rows, "user_id long, seq long, lon double, lat double")
    out = TJ.simplify_trajectory(df, 0.5, entity_col="user_id", ts_col="seq")
    assert sorted(r.seq for r in out.collect()) == [0, 4, 9]


def test_nan_coordinate_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, float("nan"), 1.0), (1, 2, 2.0, 2.0)],
        "user_id long, seq long, lon double, lat double",
    )
    with pytest.raises(Exception, match="NaN"):
        TJ.simplify_trajectory(df, 0.1, entity_col="user_id", ts_col="seq").collect()


def test_group_straddles_batch_boundary(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got, exp = _run(spark, [(11, 40), (12, 33), (13, 26)], 0.05)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == exp


def test_all_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, i, float(i), 0.0, f"tag{i}") for i in range(20)],
        "user_id long, seq long, lon double, lat double, tag string",
    )
    out = TJ.simplify_trajectory(df, 0.001, entity_col="user_id", ts_col="seq")
    rows = {r.seq: r.tag for r in out.collect()}
    assert rows == {0: "tag0", 19: "tag19"}
    assert [f.name for f in out.schema.fields] == [
        "user_id", "seq", "lon", "lat", "tag",
    ]


def test_grouped_frames_sorted_matches_apply_in_pandas(spark):
    # generic multi-row contract: per-group top-2 by value
    rows = [(f"g{i % 23}", i, float((i * 7919) % 100)) for i in range(500)]
    rows += [(None, 1000, 50.0), (None, 1001, 60.0), (None, 1002, 40.0)]
    df = spark.createDataFrame(rows, "k string, i long, v double").repartition(5)
    schema = "k string, i long, v double"

    def _top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(["v", "i"], ascending=[False, True]).head(2)

    a = (
        df.groupBy("k").applyInPandas(lambda p: _top2(p)[["k", "i", "v"]], schema)
        .toPandas().sort_values(["i"]).reset_index(drop=True)
    )
    b = (
        util.grouped_frames_sorted(df, ["k"], _top2, schema)
        .toPandas().sort_values(["i"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[["i", "v"]], b[["i", "v"]])
    assert (a["k"].isna() == b["k"].isna()).all() and (
        a["k"].dropna() == b["k"].dropna()
    ).all()
