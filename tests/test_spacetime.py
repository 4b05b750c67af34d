"""Space-time cube + Mann-Kendall emerging hotspots (operators/spacetime).

The driver oracles (`cell_trend_mk`, `emerging_hotspots`) hash-gate the
cube and trend arithmetic on real data; these pin the formula against
hand-computed series plus the contract edges: tie-corrected variance,
zero variance -> NULL, zero-fill densification, NULL-score dilution, and
the classification enums on a planted grow/shrink pattern.
"""

import datetime as dt

import pytest

from pygridmap_spark.functions.cellindex import py_morton
from pygridmap_spark.operators import spacetime as ST

Z = 3
N = 1 << Z
T0 = dt.datetime(2024, 1, 1)


def _series(spark, sers):
    """{cell: [x per bin]} -> a cube frame (cell_id only matters)."""
    rows = []
    for c, xs in sers.items():
        for t, x in enumerate(xs):
            rows.append((c, t, x))
    return spark.createDataFrame(rows, "cell_id long, t_bin long, n long")


def _mk(df):
    return {r["cell_id"]: r for r in ST.mann_kendall_trend(df).collect()}


def test_mann_kendall_hand_computed(spark):
    out = _mk(_series(spark, {1: [1, 2, 3, 4, 5], 2: [3, 3, 3], 3: [5, 2, 2, 1]}))
    # strictly increasing, no ties: S = 10, var = 5*4*15/18
    assert out[1]["s_stat"] == 10
    assert out[1]["var_s"] == pytest.approx(50 / 3)
    assert out[1]["mk_z"] == pytest.approx(9 / (50 / 3) ** 0.5)
    # constant: S = 0, tie group of 3 cancels the variance -> NULL
    assert out[2]["s_stat"] == 0
    assert out[2]["var_s"] == 0.0
    assert out[2]["mk_z"] is None
    # decreasing with one tie pair: S = -5, var = (156 - 18) / 18
    assert out[3]["s_stat"] == -5
    assert out[3]["var_s"] == pytest.approx(138 / 18)
    assert out[3]["mk_z"] == pytest.approx(-4 / (138 / 18) ** 0.5)
    assert out[3]["t_bins"] == 4


def test_mann_kendall_s_zero_with_variance_is_zero_z(spark):
    out = _mk(_series(spark, {1: [1, 2, 1]}))
    assert out[1]["s_stat"] == 0
    assert out[1]["var_s"] > 0
    assert out[1]["mk_z"] == 0.0


def test_mann_kendall_null_scores_dilute_not_poison(spark):
    import pyspark.sql.functions as F

    df = _series(spark, {1: [1, 2, 3, 4]}).withColumn(
        "g", F.when(F.col("t_bin") != 2, F.col("n").cast("double"))
    )
    out = {
        r["cell_id"]: r
        for r in ST.mann_kendall_trend(df, x="g").collect()
    }
    # NULL at t=2: its 3 pairs contribute 0 to S; remaining pairs all +1
    assert out[1]["s_stat"] == 3
    assert out[1]["t_bins"] == 4


def test_space_time_cube_and_zero_fill(spark):
    def pt(ix, iy, day):
        lon = -180.0 + (ix + 0.5) * 360.0 / N
        lat = -90.0 + (iy + 0.5) * 180.0 / N
        return (lon, lat, T0 + dt.timedelta(days=day))

    rows = [pt(1, 1, 0), pt(1, 1, 0), pt(1, 1, 2), pt(4, 4, 1)]
    rows += [(None, 10.0, T0), (float("nan"), 10.0, T0), (10.0, 10.0, None)]
    df = spark.createDataFrame(rows, "lon double, lat double, ts timestamp")
    cube = ST.space_time_cube(df, Z)
    got = {(r["cell_id"], r["t_bin"]): r["n"] for r in cube.collect()}
    b0 = int(T0.timestamp() // 86400)
    assert got == {
        (py_morton(1, 1), b0): 2,
        (py_morton(1, 1), b0 + 2): 1,
        (py_morton(4, 4), b0 + 1): 1,
    }
    filled = {(r["cell_id"], r["t_bin"]): r["n"] for r in ST.zero_fill_cube(cube).collect()}
    assert len(filled) == 6  # 2 cells x 3 bins
    assert filled[(py_morton(1, 1), b0 + 1)] == 0
    assert filled[(py_morton(4, 4), b0)] == 0
    assert filled[(py_morton(4, 4), b0 + 2)] == 0


def test_emerging_classification(spark):
    # full 8x8 background of 1 point/cell/day for 8 days; the 3x3 blob
    # around (4,4) gains day+1 extra points/cell -> a growing hot
    # NEIGHBORHOOD (a lone spike can never clear z=1.645 in a small
    # universe: it inflates the global deviance as fast as its own
    # numerator); cells (7,1)/(7,2) fade from heavy to background.
    def pts(ix, iy, day, k):
        lon = -180.0 + (ix + 0.5) * 360.0 / N
        lat = -90.0 + (iy + 0.5) * 180.0 / N
        return [(lon, lat, T0 + dt.timedelta(days=day))] * k

    rows = []
    for day in range(8):
        for ix in range(N):
            for iy in range(N):
                rows += pts(ix, iy, day, 1)
        for ix in (3, 4, 5):
            for iy in (3, 4, 5):
                rows += pts(ix, iy, day, day + 1)
        rows += pts(7, 1, day, max(0, 40 - 12 * day))
        rows += pts(7, 2, day, max(0, 40 - 12 * day))
    df = spark.createDataFrame(rows, "lon double, lat double, ts timestamp")
    out = {(r["cell_ix"], r["cell_iy"]): r for r in ST.emerging_hotspots(df, Z).collect()}
    assert out[(4, 4)]["category"] == "intensifying"
    assert out[(4, 4)]["trend"] == "up"
    assert out[(7, 1)]["trend"] == "down"
    assert out[(7, 1)]["category"] in ("diminishing", "none")
    # a quiet background corner is neither hot nor trending up
    assert out[(0, 0)]["category"] in ("none", "diminishing")
