"""IDW grid interpolation (operators/interpolate) contract pins.

The driver oracle (`idw_interpolation`) hash-gates the full operator on
real data; these pin the semantics: a centered sample returns its own
value, equidistant samples average, closer samples dominate by the
inverse-square law, the disk wraps the antimeridian, the distance floor
keeps coincident samples finite, and evidence-free cells emit no row.
"""

import math

import pytest

from pygridmap_spark.operators import interpolate as IDW

Z = 3
N = 1 << Z


def _center(ix, iy):
    return (-180.0 + (ix + 0.5) * 360.0 / N, -90.0 + (iy + 0.5) * 180.0 / N)


def _samples(spark, rows):
    return spark.createDataFrame(rows, "lon double, lat double, v double")


def _est(df):
    return {(r["cell_ix"], r["cell_iy"]): r for r in df.collect()}


def test_centered_sample_returns_value_and_coverage(spark):
    lon, lat = _center(2, 5)
    out = _est(IDW.idw_interpolate(_samples(spark, [(lon, lat, 7.5)]), Z))
    # the sample's own cell gets exactly its value (floored distance)
    assert out[(2, 5)]["est"] == pytest.approx(7.5)
    assert out[(2, 5)]["n_samples"] == 1
    # default targets = occupied cells only: no spray into empty neighbors
    assert set(out) == {(2, 5)}


def test_targets_gather_from_ring_neighbors(spark):
    lon, lat = _center(2, 5)
    targets = _samples(spark, []).sparkSession.createDataFrame(
        [(3, 5), (4, 5)], "cell_ix long, cell_iy long"
    )
    out = _est(
        IDW.idw_interpolate(
            _samples(spark, [(lon, lat, 7.5)]), Z, targets=targets, ring=1
        )
    )
    # (3,5) sees the sample one cell west; (4,5) is out of its disk
    assert set(out) == {(3, 5)}
    assert out[(3, 5)]["est"] == pytest.approx(7.5)


def test_equidistant_samples_average(spark):
    lon, lat = _center(4, 4)
    eps = 0.5  # symmetric east/west offsets on the same latitude
    rows = [(lon - eps, lat, 10.0), (lon + eps, lat, 20.0)]
    out = _est(IDW.idw_interpolate(_samples(spark, rows), Z))
    assert out[(4, 4)]["est"] == pytest.approx(15.0)
    assert out[(4, 4)]["n_samples"] == 2


def test_inverse_square_dominance(spark):
    lon, lat = _center(4, 4)
    rows = [(lon + 0.1, lat, 100.0), (lon + 1.0, lat, 0.0)]
    out = _est(IDW.idw_interpolate(_samples(spark, rows), Z))
    # weights ~ 1/d^2: est = 100 / (1 + (0.1)^2/(1.0)^2) = 100/1.01
    assert out[(4, 4)]["est"] == pytest.approx(100.0 / 1.01, rel=1e-3)


def test_antimeridian_wrap_gathers_across_seam(spark):
    lon_w, lat = _center(N - 1, 4)
    targets = _samples(spark, []).sparkSession.createDataFrame(
        [(0, 4)], "cell_ix long, cell_iy long"
    )
    out = _est(
        IDW.idw_interpolate(
            _samples(spark, [(lon_w, lat, 3.0)]), Z, targets=targets
        )
    )
    assert out[(0, 4)]["est"] == pytest.approx(3.0)


def test_null_and_nan_inputs_drop(spark):
    lon, lat = _center(4, 4)
    rows = [
        (lon, lat, 5.0),
        (None, lat, 99.0),
        (float("nan"), lat, 99.0),
        (lon, lat, None),
    ]
    out = _est(IDW.idw_interpolate(_samples(spark, rows), Z))
    assert out[(4, 4)]["est"] == pytest.approx(5.0)
    assert out[(4, 4)]["n_samples"] == 1
