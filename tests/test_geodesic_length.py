"""Exact geodesic boundary length (core/sphere arc_lengths /
ring_perimeter / multipolygon_perimeter) and the geodesic_length
operator — the sphere-true replacement for the reference's GEOS
``.length``-after-reprojection (base.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.operators.pip_sphere import geodesic_length


def test_arc_lengths_known_and_stable_at_both_ends():
    a = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    b = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    got = SPH.arc_lengths(a, b)
    np.testing.assert_allclose(got, [np.pi / 2, 0.0, np.pi], atol=1e-15)
    # near-zero: atan2(|axb|, a.b) keeps full precision where
    # acos(a.b) would quantize to ~1.5e-8 steps
    eps = 1e-10
    tiny = np.array([[np.cos(eps), np.sin(eps), 0.0]])
    assert SPH.arc_lengths(np.array([[1.0, 0.0, 0.0]]), tiny)[
        0
    ] == pytest.approx(eps, rel=1e-9)
    # near-antipodal: same story at the other end
    anti = np.array([[-np.cos(eps), np.sin(eps), 0.0]])
    assert SPH.arc_lengths(np.array([[1.0, 0.0, 0.0]]), anti)[
        0
    ] == pytest.approx(np.pi - eps, rel=1e-12)
    # norm-free: unnormalized inputs give the same angle
    assert SPH.arc_lengths(
        np.array([[7.0, 0.0, 0.0]]), np.array([[0.0, 0.3, 0.0]])
    )[0] == pytest.approx(np.pi / 2, abs=1e-15)


def test_ring_perimeter_open_closed_and_degenerate():
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    p_open = SPH.ring_perimeter(SPH.ring_to_xyz(ring))
    p_closed = SPH.ring_perimeter(SPH.ring_to_xyz(np.vstack([ring, ring[0]])))
    assert p_open == pytest.approx(p_closed, abs=1e-15)
    # analytic: three 10-degree arcs (equator + two meridians) plus the
    # lat-10 top edge's great-circle arc
    lat = np.radians(10.0)
    top = np.arccos(np.sin(lat) ** 2 + np.cos(lat) ** 2 * np.cos(lat))
    assert p_open == pytest.approx(3 * np.radians(10.0) + top, abs=1e-13)
    # degenerate: < 2 vertices has no boundary
    assert SPH.ring_perimeter(SPH.ring_to_xyz(ring[:1])) == 0.0


def test_edges_are_great_circles_not_parallels():
    # A polyline densified ALONG the lat-60 parallel must measure the
    # parallel's length (dlon * cos 60 = dlon / 2), strictly longer than
    # the single great-circle edge between its endpoints — pinning that
    # the kernel sums per-edge geodesics over the vertices given, instead
    # of shortcutting to endpoint arcs.
    lons = np.linspace(0.0, 90.0, 721)
    densified = np.column_stack([lons, np.full_like(lons, 60.0)])
    # open polyline: measure segment-by-segment (no closing wrap)
    v = SPH.ring_to_xyz(densified)
    p_open = float(np.sum(SPH.arc_lengths(v[:-1], v[1:])))
    want_parallel = np.radians(90.0) * np.cos(np.radians(60.0))
    assert p_open == pytest.approx(want_parallel, rel=1e-5)
    single = SPH.arc_lengths(v[:1], v[-1:])[0]
    assert single < p_open * 0.97


def test_multipolygon_perimeter_counts_holes_and_parts():
    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    hole = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0]])
    part2 = np.array([[20.0, 0.0], [25.0, 0.0], [25.0, 5.0], [20.0, 5.0]])
    po = SPH.ring_perimeter(SPH.ring_to_xyz(outer))
    ph = SPH.ring_perimeter(SPH.ring_to_xyz(hole))
    p2 = SPH.ring_perimeter(SPH.ring_to_xyz(part2))
    got = SPH.multipolygon_perimeter([[outer, hole], [part2]])
    assert got == pytest.approx(po + ph + p2, abs=1e-14)
    assert SPH.multipolygon_perimeter([]) == 0.0


def test_geodesic_length_operator_matches_kernel_and_null_is_null(spark):
    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    hole = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0]])
    mps = [[[outer]], [[outer, hole]]]
    pdf = pd.DataFrame(
        {
            "gid": [0, 1, 2],
            "wkb": [WKB.encode_multipolygon(mp) for mp in mps] + [None],
        }
    )
    out = (
        geodesic_length(spark.createDataFrame(pdf), km_col="length_km")
        .toPandas()
        .sort_values("gid")
        .reset_index(drop=True)
    )
    for k, mp in enumerate(mps):
        want = SPH.multipolygon_perimeter(mp)
        assert out.loc[k, "length_rad"] == pytest.approx(want, rel=1e-12)
        assert out.loc[k, "length_km"] == pytest.approx(
            want * SPH.EARTH_RADIUS_KM, rel=1e-12
        )
    # SQL NULL, never NaN (the repo's Arrow-kernel contract)
    assert pd.isna(out.loc[2, "length_rad"]) and pd.isna(
        out.loc[2, "length_km"]
    )
    assert not np.isnan(np.nansum(out["length_rad"].to_numpy(dtype=float)))


def test_geodesic_length_plan_has_no_exchange(spark):
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    pdf = pd.DataFrame(
        {"gid": [0], "wkb": [WKB.encode_multipolygon([[ring]])]}
    )
    df = geodesic_length(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
