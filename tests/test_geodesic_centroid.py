"""Exact spherical centroid (core/sphere ring_vector_area /
multipolygon_centroid_xyz) and the geodesic_centroid operator — the
sphere-true replacement for the reference's GEOS ``.centroid`` after
planar reprojection (base.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.operators.pip_sphere import geodesic_centroid


def test_octant_vector_area_is_pi_over_4_each_axis():
    ring = np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]])
    v = SPH.ring_vector_area(SPH.ring_to_xyz(ring))
    np.testing.assert_allclose(v, np.pi / 4, rtol=1e-14)
    # magnitude never exceeds the scalar excess (|int rhat| <= int 1)
    assert np.linalg.norm(v) <= abs(
        SPH.spherical_ring_area(SPH.ring_to_xyz(ring))
    )
    # reversed winding flips the vector, like the scalar excess
    np.testing.assert_allclose(
        SPH.ring_vector_area(SPH.ring_to_xyz(ring[::-1])), -v, rtol=1e-14
    )


def test_polar_cap_centroid_is_the_pole():
    # densified lat-70 circle: vector area must point exactly at +z
    lons = np.linspace(0.0, 360.0, 961)[:-1]
    ring = np.column_stack([lons, np.full_like(lons, 70.0)])
    c = SPH.multipolygon_centroid_xyz([[ring]])
    np.testing.assert_allclose(c, [0.0, 0.0, 1.0], atol=1e-12)
    # and the cap's vector-area magnitude has the closed form
    # pi * cos^2(lat) (int of z over z > sin(lat)); the inscribed
    # 960-gon converges O(1/n^2) — measured 6.3e-6 relative here
    v = SPH.ring_vector_area(SPH.ring_to_xyz(ring))
    want = np.pi * np.cos(np.radians(70.0)) ** 2
    assert abs(v[2]) == pytest.approx(want, rel=1e-5)


def test_centroid_matches_monte_carlo_on_a_lune_quad():
    ring = np.array([[10.0, -20.0], [40.0, -20.0], [40.0, 35.0], [10.0, 35.0]])
    c = SPH.multipolygon_centroid_xyz([[ring]])
    rng = np.random.default_rng(7)
    p = rng.normal(size=(2_000_000, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lon = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    lat = np.degrees(np.arcsin(p[:, 2]))
    sel = (lon >= 10) & (lon <= 40) & (lat >= -20) & (lat <= 35)
    # NB the lon/lat box is NOT the geodesic quad (N/S edges are
    # parallels) — keep only the great-circle-bounded test loose enough:
    # compare against the lon/lat-box mean direction, which shares the
    # box's mirror symmetries (lon = 25 meridian plane), so the lon
    # agrees exactly and lat to the parallel-vs-geodesic edge difference.
    mc = p[sel].mean(axis=0)
    mc /= np.linalg.norm(mc)
    assert np.degrees(np.arctan2(c[1], c[0])) == pytest.approx(25.0, abs=1e-10)
    assert np.degrees(np.arctan2(mc[1], mc[0])) == pytest.approx(25.0, abs=0.2)
    assert np.degrees(np.arcsin(c[2])) == pytest.approx(
        np.degrees(np.arcsin(mc[2])), abs=1.0
    )


def test_holes_pull_the_centroid_away():
    outer = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]])
    hole = np.array([[12.0, 12.0], [18.0, 12.0], [18.0, 18.0], [12.0, 18.0]])
    c_full = SPH.multipolygon_centroid_xyz([[outer]])
    c_holed = SPH.multipolygon_centroid_xyz([[outer, hole]])
    lon_f = np.degrees(np.arctan2(c_full[1], c_full[0]))
    lon_h = np.degrees(np.arctan2(c_holed[1], c_holed[0]))
    lat_f = np.degrees(np.arcsin(c_full[2]))
    lat_h = np.degrees(np.arcsin(c_holed[2]))
    # hole sits in the NE corner -> centroid moves SW
    assert lon_h < lon_f and lat_h < lat_f
    # hole orientation must not matter (even-odd convention)
    c2 = SPH.multipolygon_centroid_xyz([[outer, hole[::-1]]])
    np.testing.assert_allclose(c_holed, c2, rtol=1e-14)


def test_degenerate_region_returns_none():
    assert SPH.multipolygon_centroid_xyz([]) is None
    # two mirror quads straddling the origin-symmetric positions: the
    # vector areas cancel and there is no meaningful direction
    q = np.array([[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0]])
    anti = np.column_stack([q[:, 0] - 180.0, -q[:, 1]])[::-1]
    assert SPH.multipolygon_centroid_xyz([[q], [anti]]) is None


def test_geodesic_centroid_operator_matches_kernel_and_null_is_null(spark):
    outer = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]])
    hole = np.array([[12.0, 12.0], [18.0, 12.0], [18.0, 18.0], [12.0, 18.0]])
    mps = [[[outer]], [[outer, hole]]]
    pdf = pd.DataFrame(
        {
            "gid": [0, 1, 2],
            "wkb": [WKB.encode_multipolygon(mp) for mp in mps] + [None],
        }
    )
    out = (
        geodesic_centroid(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("gid")
        .reset_index(drop=True)
    )
    for k, mp in enumerate(mps):
        c = SPH.multipolygon_centroid_xyz(mp)
        assert out.loc[k, "centroid_lon"] == pytest.approx(
            np.degrees(np.arctan2(c[1], c[0])), abs=1e-12
        )
        assert out.loc[k, "centroid_lat"] == pytest.approx(
            np.degrees(np.arcsin(c[2])), abs=1e-12
        )
    assert pd.isna(out.loc[2, "centroid_lon"]) and pd.isna(
        out.loc[2, "centroid_lat"]
    )
    assert not np.isnan(np.nansum(out["centroid_lat"].to_numpy(dtype=float)))


def test_geodesic_centroid_plan_has_no_exchange(spark):
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    pdf = pd.DataFrame({"gid": [0], "wkb": [WKB.encode_multipolygon([[ring]])]})
    df = geodesic_centroid(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
