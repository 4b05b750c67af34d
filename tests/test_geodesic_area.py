"""Exact geodesic area (core/sphere spherical excess + the pyramid
solid-angle closed form), the Catalyst cell_area_sr twin, and the
geodesic_area operator — the sphere-true replacement for the reference's
GEOS ``.area``-after-reprojection (base.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.functions import s2 as S2
from pygridmap_spark.operators.pip_sphere import geodesic_area


def _uv_rect_ring(u0, v0, u1, v1, face=2):
    """lon/lat ring (closed) of the central projection of a face uv rect
    — the same construction as the driver's _s2_quad_zones fixture."""
    uu = np.array([u0, u1, u1, u0, u0], float)
    vv = np.array([v0, v0, v1, v1, v0], float)
    x, y, z = S2._np_face_uv_to_xyz(np.full(5, face), uu, vv)
    n = np.sqrt(x * x + y * y + z * z)
    return np.column_stack(
        [np.degrees(np.arctan2(y, x)), np.degrees(np.arcsin(z / n))]
    )


def test_octant_is_half_pi():
    ring = np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]])
    a = SPH.spherical_ring_area(SPH.ring_to_xyz(ring))
    assert a == pytest.approx(np.pi / 2, abs=1e-12)
    # reversed winding flips the sign
    a_cw = SPH.spherical_ring_area(SPH.ring_to_xyz(ring[::-1]))
    assert a_cw == pytest.approx(-np.pi / 2, abs=1e-12)


def test_whole_face_solid_angle_is_two_pi_thirds():
    assert float(SPH.solid_angle_uv_rect(-1, -1, 1, 1)) == pytest.approx(
        2 * np.pi / 3, abs=1e-14
    )
    # six faces tile the sphere
    assert 6 * float(SPH.solid_angle_uv_rect(-1, -1, 1, 1)) == pytest.approx(
        4 * np.pi, abs=1e-13
    )


def test_uv_rect_fan_matches_closed_form_all_faces():
    rng = np.random.default_rng(11)
    for face in range(6):
        for _ in range(20):
            u0, v0 = rng.uniform(-0.95, 0.5, 2)
            u1 = u0 + rng.uniform(0.02, 0.4)
            v1 = v0 + rng.uniform(0.02, 0.4)
            ring = _uv_rect_ring(u0, v0, u1, v1, face)
            fan = abs(SPH.spherical_ring_area(SPH.ring_to_xyz(ring[:-1])))
            cf = float(SPH.solid_angle_uv_rect(u0, v0, u1, v1))
            assert fan == pytest.approx(cf, rel=1e-12)


def test_nonconvex_ring_fan_is_exact():
    # L-shape in the face-2 gnomonic chart: edges are geodesics, so the
    # spherical area is the sum of the two constituent uv rects — the fan
    # triangulation's signed terms must cancel exactly outside the ring.
    uu = np.array([0.0, 0.6, 0.6, 0.3, 0.3, 0.0])
    vv = np.array([0.0, 0.0, 0.3, 0.3, 0.6, 0.6])
    x, y, z = S2._np_face_uv_to_xyz(np.full(6, 2), uu, vv)
    n = np.sqrt(x * x + y * y + z * z)
    ring = np.column_stack(
        [np.degrees(np.arctan2(y, x)), np.degrees(np.arcsin(z / n))]
    )
    fan = abs(SPH.spherical_ring_area(SPH.ring_to_xyz(ring)))
    want = float(
        SPH.solid_angle_uv_rect(0.0, 0.0, 0.6, 0.3)
        + SPH.solid_angle_uv_rect(0.0, 0.3, 0.3, 0.6)
    )
    assert fan == pytest.approx(want, rel=1e-12)


def test_polygon_area_subtracts_holes_and_multipolygon_sums():
    outer = _uv_rect_ring(-0.5, -0.5, 0.5, 0.5)
    hole = _uv_rect_ring(-0.2, -0.2, 0.2, 0.2)[::-1]  # any orientation
    a = SPH.spherical_polygon_area([outer, hole])
    want = float(
        SPH.solid_angle_uv_rect(-0.5, -0.5, 0.5, 0.5)
        - SPH.solid_angle_uv_rect(-0.2, -0.2, 0.2, 0.2)
    )
    assert a == pytest.approx(want, rel=1e-12)
    part2 = _uv_rect_ring(0.6, 0.6, 0.9, 0.9)
    m = SPH.spherical_multipolygon_area([[outer, hole], [part2]])
    assert m == pytest.approx(
        want + float(SPH.solid_angle_uv_rect(0.6, 0.6, 0.9, 0.9)), rel=1e-12
    )
    # degenerate inputs
    assert SPH.spherical_polygon_area([]) == 0.0
    assert SPH.spherical_ring_area(SPH.ring_to_xyz(outer[:2])) == 0.0


def test_planar_shoelace_misstates_what_the_sphere_gets_right():
    # A 30x20-degree quad at lat 60-80: the equirect-planar shoelace
    # (deg^2 scaled to sr) overstates the true spherical area ~2.5x — the
    # error class this kernel exists to remove.
    ring = np.array(
        [[0.0, 60.0], [30.0, 60.0], [30.0, 80.0], [0.0, 80.0]]
    )
    sph = abs(SPH.spherical_ring_area(SPH.ring_to_xyz(ring)))
    planar_sr = np.radians(30.0) * np.radians(20.0)
    assert planar_sr > sph * 1.5


def test_cell_area_sr_catalyst_matches_numpy_and_tiles_face(spark):
    lvl = 3
    n = 1 << lvl
    idx = [(i, j) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(pd.DataFrame(idx, columns=["i", "j"]))
    got = (
        df.select(
            "i", "j",
            S2.cell_area_sr(F.col("i"), F.col("j"), lvl).alias("sr"),
            S2.cell_area_sr(F.col("i"), F.col("j"), lvl, km2=True).alias("km2"),
        )
        .toPandas()
        .sort_values(["i", "j"])
    )
    inv = 1.0 / n
    want = SPH.solid_angle_uv_rect(
        S2._np_st_to_uv(got["i"].to_numpy() * inv),
        S2._np_st_to_uv(got["j"].to_numpy() * inv),
        S2._np_st_to_uv((got["i"].to_numpy() + 1.0) * inv),
        S2._np_st_to_uv((got["j"].to_numpy() + 1.0) * inv),
    )
    np.testing.assert_allclose(got["sr"].to_numpy(), want, rtol=1e-13)
    np.testing.assert_allclose(
        got["km2"].to_numpy(),
        got["sr"].to_numpy() * SPH.EARTH_RADIUS_KM**2,
        rtol=1e-13,
    )
    # the cells partition the face: areas sum to 2*pi/3 ...
    assert got["sr"].sum() == pytest.approx(2 * np.pi / 3, rel=1e-12)
    # ... and the quadratic st chart leaves a real ~2x spread — the reason
    # density rollups must divide by cell_area_sr, not assume equal cells
    assert got["sr"].max() / got["sr"].min() > 1.5


def test_geodesic_area_operator_matches_kernel_and_null_is_null(spark):
    rings = [
        [[_uv_rect_ring(-0.3, -0.3, 0.4, 0.2)]],
        [[_uv_rect_ring(-0.5, -0.5, 0.5, 0.5),
          _uv_rect_ring(-0.2, -0.2, 0.2, 0.2)[::-1]]],
        [[_uv_rect_ring(0.1, 0.1, 0.3, 0.3)],
         [_uv_rect_ring(-0.9, -0.9, -0.6, -0.7)]],
    ]
    pdf = pd.DataFrame(
        {
            "gid": [0, 1, 2, 3],
            "wkb": [WKB.encode_multipolygon(mp) for mp in rings] + [None],
        }
    )
    out = (
        geodesic_area(spark.createDataFrame(pdf), km2_col="area_km2")
        .toPandas()
        .sort_values("gid")
        .reset_index(drop=True)
    )
    for k, mp in enumerate(rings):
        want = SPH.spherical_multipolygon_area(mp)
        assert out.loc[k, "area_sr"] == pytest.approx(want, rel=1e-12)
        assert out.loc[k, "area_km2"] == pytest.approx(
            want * SPH.EARTH_RADIUS_KM**2, rel=1e-12
        )
    # SQL NULL, never NaN (the repo's Arrow-kernel contract)
    assert out.loc[3, "area_sr"] is None or pd.isna(out.loc[3, "area_sr"])
    assert not np.isnan(
        np.nansum(out["area_sr"].to_numpy(dtype=float))
    )


def test_geodesic_area_plan_has_no_exchange(spark):
    pdf = pd.DataFrame(
        {"gid": [0], "wkb": [WKB.encode_multipolygon(
            [[_uv_rect_ring(-0.3, -0.3, 0.4, 0.2)]]
        )]}
    )
    df = geodesic_area(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
