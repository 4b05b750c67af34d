"""Geodesic kNN via S2 cell rings (operators/knn_sphere.py): exactness vs
brute force across face boundaries / poles / antimeridian, the gradient
bound the cover guarantee rests on, and straggler fallback."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.functions import s2 as S2
from pygridmap_spark.operators import knn_sphere as KS


def _sphere_points(n, seed):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 180.0, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, n)))
    return lon, lat


def _cmp(spark, plon, plat, qlon, qlat, k, level):
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(len(plon)), "lon": plon, "lat": plat})
    ).repartition(4)
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(len(qlon)), "lon": qlon, "lat": qlat})
    ).repartition(2)
    got = (
        KS.knn_s2(pts, qs, k=k, level=level)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    exp = (
        KS.knn_s2_bruteforce(pts, qs, k=k)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    assert list(got["query_id"]) == list(exp["query_id"])
    assert list(got["point_id"]) == list(exp["point_id"])
    assert np.allclose(got["dist"], exp["dist"], atol=1e-12)
    assert list(got["rank"]) == list(exp["rank"])


def test_exact_vs_bruteforce_uniform(spark):
    plon, plat = _sphere_points(3000, 0)
    qlon, qlat = _sphere_points(40, 1)
    _cmp(spark, plon, plat, qlon, qlat, k=5, level=4)


def test_exact_across_face_edges_and_poles(spark):
    # queries pinned at cube edges/corners and the poles; neighbors on the
    # other side of the face boundary MUST be recovered by the cover join
    rng = np.random.default_rng(2)
    plon = rng.uniform(-180, 180, 2000)
    plat = np.degrees(np.arcsin(rng.uniform(-1, 1, 2000)))
    # cluster extra points just across face boundaries (lon 45 is a cube
    # edge; lat ~35.264 is a face corner latitude; poles are face centers)
    plon = np.concatenate([plon, rng.uniform(45.1, 46.0, 50), rng.uniform(44.0, 44.9, 50)])
    plat = np.concatenate([plat, rng.uniform(-5, 5, 50), rng.uniform(-5, 5, 50)])
    qlon = np.array([45.0, 44.999, 45.001, 0.0, 10.0, -135.0, 180.0, -180.0, 90.0])
    qlat = np.array([0.0, 0.001, -0.001, 89.99, -89.99, 35.26, 0.0, 0.0, 45.1])
    _cmp(spark, plon, plat, qlon, qlat, k=7, level=5)


def test_sparse_points_straggler_fallback(spark):
    # fewer points than cells, some faces empty: phase 1 cannot satisfy,
    # the brute-force backstop must still produce exact answers
    plon = np.array([0.0, 10.0, 20.0, -170.0])
    plat = np.array([0.0, 5.0, -5.0, 80.0])
    qlon, qlat = _sphere_points(10, 3)
    _cmp(spark, plon, plat, qlon, qlat, k=3, level=6)


def test_duplicate_points_zero_distance(spark):
    # k-th neighbor at distance zero exercises the theta->level clamp
    plon = np.concatenate([np.full(5, 12.5), np.array([13.0, 14.0, 50.0])])
    plat = np.concatenate([np.full(5, 42.5), np.array([42.0, 41.0, 10.0])])
    qlon, qlat = np.array([12.5]), np.array([42.5])
    _cmp(spark, plon, plat, qlon, qlat, k=3, level=8)


def test_k_exceeds_point_count(spark):
    plon, plat = _sphere_points(4, 5)
    qlon, qlat = _sphere_points(3, 6)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(4), "lon": plon, "lat": plat})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(3), "lon": qlon, "lat": qlat})
    )
    out = KS.knn_s2(pts, qs, k=10, level=3).toPandas()
    assert len(out) == 3 * 4  # every point returned per query
    assert set(out.groupby("query_id")["rank"].max()) == {4}


def test_gradient_bound_holds():
    # the cover guarantee: a geodesic of angle theta displaces (s, t) by
    # <= theta * ST_GRAD_BOUND per axis (within a face chart) — sample
    # random short geodesics, including near edges/corners
    rng = np.random.default_rng(7)
    n = 200_000
    u = np.concatenate([rng.uniform(-1, 1, n // 2), rng.uniform(0.9, 1.0, n // 2)])
    v = np.concatenate([rng.uniform(-1, 1, n // 2), rng.uniform(0.85, 1.0, n // 2)])
    x, y, z = -u, -v, np.ones_like(u)  # face 2 chart
    norm = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / norm, y / norm, z / norm
    rv = rng.normal(size=(3, n))
    dot = rv[0] * x + rv[1] * y + rv[2] * z
    tx, ty, tz = rv[0] - dot * x, rv[1] - dot * y, rv[2] - dot * z
    tn = np.sqrt(tx * tx + ty * ty + tz * tz)
    tx, ty, tz = tx / tn, ty / tn, tz / tn
    for eps in (1e-6, 1e-3):
        x2, y2, z2 = x + eps * tx, y + eps * ty, z + eps * tz
        n2 = np.sqrt(x2 * x2 + y2 * y2 + z2 * z2)
        x2, y2, z2 = x2 / n2, y2 / n2, z2 / n2
        theta = 2 * np.arcsin(
            np.sqrt((x - x2) ** 2 + (y - y2) ** 2 + (z - z2) ** 2) / 2
        )
        f1, u1, v1 = S2._np_face_uv(x, y, z)
        f2, u2, v2 = S2._np_face_uv(x2, y2, z2)
        same = f1 == f2
        ds = np.abs(S2._np_uv_to_st(u2[same]) - S2._np_uv_to_st(u1[same]))
        dt = np.abs(S2._np_uv_to_st(v2[same]) - S2._np_uv_to_st(v1[same]))
        assert (np.maximum(ds, dt) <= theta[same] * S2.ST_GRAD_BOUND).all()


def test_estimate_level(spark):
    pts = spark.range(6 * 4 ** 5 * 10).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 360 - 180.0).alias("lon"),
        (F.col("id") % 160 - 80.0).alias("lat"),
    )
    lvl = KS.estimate_knn_level(pts, 10)
    assert lvl == 5


# ---------------------------------------------------------------------------
# within_radius_s2 (geodesic radius join)
# ---------------------------------------------------------------------------

def _frames(spark, plon, plat, qlon, qlat):
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(len(plon)), "lon": plon, "lat": plat})
    ).repartition(4)
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(len(qlon)), "lon": qlon, "lat": qlat})
    ).repartition(2)
    return pts, qs


def _cmp_radius(spark, plon, plat, qlon, qlat, radius_m, level=None):
    pts, qs = _frames(spark, plon, plat, qlon, qlat)
    got = (
        KS.within_radius_s2(pts, qs, radius_m, level=level)
        .orderBy("query_id", "point_id")
        .toPandas()
    )
    exp = (
        KS.within_radius_s2_bruteforce(pts, qs, radius_m)
        .orderBy("query_id", "point_id")
        .toPandas()
    )
    assert list(got["query_id"]) == list(exp["query_id"])
    assert list(got["point_id"]) == list(exp["point_id"])
    assert np.allclose(got["dist"], exp["dist"], atol=1e-12)
    return got


@pytest.mark.parametrize(
    "radius_m",
    [50_000.0, 500_000.0, 3_000_000.0, 12_000_000.0, 25_000_000.0],
    ids=["city", "region", "lvl0-brute", "neg-lvl-brute", "whole-sphere"],
)
def test_radius_vs_bruteforce(spark, radius_m):
    # 3M and 12M m radii have cover level < 1 -> broadcast fallback path;
    # 25M m exceeds pi radians -> every pair
    plon, plat = _sphere_points(1500, 10)
    qlon, qlat = _sphere_points(25, 11)
    qlon[:4] = [179.9, -179.9, 0.0, 45.0]
    qlat[:4] = [10.0, -10.0, 89.9, 0.0]  # antimeridian, pole, cube edge
    _cmp_radius(spark, plon, plat, qlon, qlat, radius_m)


def test_radius_face_edge_cluster(spark):
    # matches straddling a cube edge (lon 45) must be recovered by the
    # cube-wrap neighbor cells, not just the same-face cell
    rng = np.random.default_rng(12)
    plon = np.concatenate(
        [rng.uniform(44.0, 44.99, 80), rng.uniform(45.01, 46.0, 80)]
    )
    plat = rng.uniform(-2.0, 2.0, 160)
    qlon = np.array([45.0, 44.999, 45.001])
    qlat = np.array([0.0, 1.0, -1.0])
    got = _cmp_radius(spark, plon, plat, qlon, qlat, 100_000.0)
    assert len(got) > 0  # the cluster guarantees matches


def test_radius_coarser_level_reuse(spark):
    # an explicitly coarser index level than the guarantee level is still
    # exact (more candidates, same refine)
    plon, plat = _sphere_points(800, 13)
    qlon, qlat = _sphere_points(10, 14)
    _cmp_radius(spark, plon, plat, qlon, qlat, 200_000.0, level=2)


def test_radius_level_guard(spark):
    plon, plat = _sphere_points(10, 15)
    qlon, qlat = _sphere_points(3, 16)
    pts, qs = _frames(spark, plon, plat, qlon, qlat)
    lc = KS.radius_cover_level(200_000.0)
    with pytest.raises(ValueError, match="finer than the cover guarantee"):
        KS.within_radius_s2(pts, qs, 200_000.0, level=lc + 1)
    with pytest.raises(ValueError, match="positive"):
        KS.within_radius_s2(pts, qs, 0.0)
    with pytest.raises(ValueError, match="positive"):
        KS.radius_cover_level(-1.0)


def test_radius_empty_result(spark):
    # points on the opposite side of the sphere from every query
    plon = np.array([0.0, 1.0, 2.0])
    plat = np.array([0.0, 1.0, -1.0])
    qlon = np.array([179.0, -179.0])
    qlat = np.array([0.0, 5.0])
    pts, qs = _frames(spark, plon, plat, qlon, qlat)
    out = KS.within_radius_s2(pts, qs, 10_000.0).toPandas()
    assert len(out) == 0


def test_radius_inclusive_bound_and_units(spark):
    # dist is radians; two points at a known great-circle angle: one well
    # inside, one well outside; the returned dist * R matches the haversine
    plon = np.array([0.0, 0.0])
    plat = np.array([0.0, 1.0])  # 1 degree apart on a meridian
    qlon = np.array([0.0])
    qlat = np.array([0.0])
    pts, qs = _frames(spark, plon, plat, qlon, qlat)
    one_deg_m = np.radians(1.0) * KS.EARTH_RADIUS_M
    out = (
        KS.within_radius_s2(pts, qs, one_deg_m * 1.01)
        .orderBy("point_id")
        .toPandas()
    )
    assert list(out["point_id"]) == [0, 1]
    assert abs(out["dist"][1] - np.radians(1.0)) < 1e-12
    out2 = KS.within_radius_s2(pts, qs, one_deg_m * 0.99).toPandas()
    assert list(out2["point_id"]) == [0]
