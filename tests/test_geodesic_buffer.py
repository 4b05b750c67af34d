"""Geodesic point buffer (operators/pip_sphere.py): spherical-cap N-gon.
Pins: every vertex sits at exactly the requested arc radius, the WKB form
matches the vertex form, the polygon's geodesic area is the inscribed-N-gon
fraction of the cap area, and the center is contained."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.operators import pip_sphere as PS

R_M = SPH.EARTH_RADIUS_KM * 1000.0

CENTERS = [
    (1, 10.0, 45.0),
    (2, -5.6, 42.6),
    (3, 179.9, -30.0),  # antimeridian-straddling cap
    (4, 0.0, 84.0),  # high latitude
    (5, -120.0, 0.0),
]


def _df(spark):
    return spark.createDataFrame(CENTERS, "pid long, lon double, lat double")


def test_vertices_at_exact_arc_radius(spark):
    radius = 250_000.0
    out = PS.geodesic_buffer_vertices(_df(spark), radius, 16).collect()
    assert len(out) == len(CENTERS) * 16
    d = radius / R_M
    for r in out:
        c = SPH.lonlat_to_xyz(np.array([r["lon"]]), np.array([r["lat"]]))
        v = SPH.lonlat_to_xyz(np.array([r["vlon"]]), np.array([r["vlat"]]))
        arc = SPH.arc_lengths(c, v)[0]
        assert abs(arc - d) < 1e-12, (r["pid"], r["k"], arc, d)
        assert -180.0 <= r["vlon"] < 180.0


def test_wkb_matches_vertex_form_and_cap_area(spark):
    radius, n = 400_000.0, 32
    rows = {
        r["pid"]: r["buffer_wkb"]
        for r in PS.geodesic_point_buffer(_df(spark), radius, n).collect()
    }
    verts = PS.geodesic_buffer_vertices(_df(spark), radius, n).collect()
    by_pid = {}
    for r in verts:
        by_pid.setdefault(r["pid"], {})[r["k"]] = (r["vlon"], r["vlat"])
    cap = 2.0 * math.pi * (1.0 - math.cos(radius / R_M))  # steradians
    ratio = math.sin(2 * math.pi / n) / (2 * math.pi / n)  # inscribed N-gon
    for pid, buf in rows.items():
        polys = WKB.decode_multipolygon(bytes(buf))
        assert len(polys) == 1 and len(polys[0]) == 1
        ring = polys[0][0]
        assert len(ring) == n + 1  # closed
        np.testing.assert_allclose(ring[0], ring[-1])
        for k in range(n):
            np.testing.assert_allclose(
                ring[k], by_pid[pid][k], rtol=0, atol=1e-9
            )
        area = SPH.spherical_polygon_area([ring[:-1]])
        assert cap * (ratio - 2e-3) < area < cap, (pid, area, cap)


def test_center_contained(spark):
    out = PS.geodesic_point_buffer(_df(spark), 100_000.0, 24).collect()
    for r in out:
        rings = [p[0] for p in WKB.decode_multipolygon(bytes(r["buffer_wkb"]))]
        p = SPH.lonlat_to_xyz(np.array([r["lon"]]), np.array([r["lat"]]))
        assert SPH.points_in_spherical_polygon(p, rings)[0], r["pid"]


def test_buffer_argument_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        PS.geodesic_point_buffer(df, 100.0, 2)
    with pytest.raises(ValueError):
        PS.geodesic_point_buffer(df, 0.0)
    with pytest.raises(ValueError):
        PS.geodesic_buffer_vertices(df, math.pi * R_M + 1.0)


def test_buffer_plan_zero_shuffle(spark):
    df = _df(spark)
    plan = PS.geodesic_point_buffer(df, 50_000.0, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    plan_v = PS.geodesic_buffer_vertices(df, 50_000.0, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_v


def test_pole_grazing_cap_no_nan(spark):
    # a cap whose rim touches the pole rounds sin_lat2 to 1+ulp: both forms
    # must clamp (review finding), and they must still agree
    import math as _m

    radius = 250_000.0
    graze_lat = 90.0 - _m.degrees(radius / R_M)
    df = spark.createDataFrame(
        [(1, 0.0, graze_lat), (2, 10.0, -graze_lat)], "pid long, lon double, lat double"
    )
    vs = PS.geodesic_buffer_vertices(df, radius, 8).collect()
    assert all(not _m.isnan(r["vlat"]) and not _m.isnan(r["vlon"]) for r in vs)
    assert any(abs(abs(r["vlat"]) - 90.0) < 1e-6 for r in vs)  # rim hits the pole
    bufs = PS.geodesic_point_buffer(df, radius, 8).collect()
    for r in bufs:
        ring = WKB.decode_multipolygon(bytes(r["buffer_wkb"]))[0][0]
        assert np.isfinite(ring).all()


def test_null_coords_null_buffer(spark):
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, 10.0, None), (3, 10.0, 10.0)],
        "pid long, lon double, lat double",
    )
    rows = {r["pid"]: r["buffer_wkb"] for r in PS.geodesic_point_buffer(df, 50_000.0, 8).collect()}
    assert rows[1] is None and rows[2] is None and rows[3] is not None
    vs = PS.geodesic_buffer_vertices(df, 50_000.0, 8).collect()
    for r in vs:
        if r["pid"] in (1, 2):
            assert r["vlat"] is None and r["vlon"] is None
