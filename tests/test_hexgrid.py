"""Hex cell index (functions/hexgrid.py): nearest-center correctness of
cube rounding, pack/unpack algebra, ring/disk topology, Catalyst == numpy
parity, and the equal-area-on-LAEA composition the module exists for."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.functions import hexgrid as HX


def _rand_xy(n, seed=0, span=1e6):
    rng = np.random.default_rng(seed)
    return rng.uniform(-span, span, n), rng.uniform(-span, span, n)


def test_cube_round_assigns_nearest_center():
    # the defining property of hex binning: the assigned cell's center is
    # the closest center among the cell and all six neighbors
    x, y = _rand_xy(50_000, seed=1)
    size = 1234.5
    q, r = HX.py_axial(x, y, size)
    cx, cy = HX.py_center(q, r, size)
    d_own = (x - cx) ** 2 + (y - cy) ** 2
    for dq, dr in HX.AXIAL_NEIGHBORS:
        nx, ny = HX.py_center(q + dq, r + dr, size)
        d_n = (x - nx) ** 2 + (y - ny) ** 2
        assert (d_own <= d_n + 1e-7).all()


def test_pack_unpack_round_trip():
    rng = np.random.default_rng(2)
    q = rng.integers(-(1 << 24), 1 << 24, 100_000)
    r = rng.integers(-(1 << 24), 1 << 24, 100_000)
    c = HX.py_pack(q, r)
    assert (c > 0).all() and (c < (1 << 52)).all()  # float-exact, positive
    q2, r2 = HX.py_unpack(c)
    assert (q2 == q).all() and (r2 == r).all()


def test_center_round_trip():
    rng = np.random.default_rng(3)
    q = rng.integers(-1000, 1000, 10_000)
    r = rng.integers(-1000, 1000, 10_000)
    size = 250.0
    cx, cy = HX.py_center(q, r, size)
    q2, r2 = HX.py_axial(cx, cy, size)
    assert (q2 == q).all() and (r2 == r).all()


def test_ring_and_disk_topology():
    assert HX.ring_offsets(0) == [(0, 0)]
    for k in (1, 2, 5):
        ring = HX.ring_offsets(k)
        assert len(ring) == 6 * k
        assert len(set(ring)) == 6 * k
        assert all(HX.hex_distance(0, 0, q, r) == k for q, r in ring)
        disk = HX.disk_offsets(k)
        assert len(disk) == 1 + 3 * k * (k + 1)
        assert set(ring) <= set(disk)
        assert all(HX.hex_distance(0, 0, q, r) <= k for q, r in disk)


def test_neighbor_offsets_are_ring_one():
    assert set(HX.AXIAL_NEIGHBORS) == set(HX.ring_offsets(1))


def test_catalyst_matches_numpy(spark):
    x, y = _rand_xy(4_000, seed=4)
    # adversarial: exact centers, vertices, axis points
    extra_x = np.array([0.0, 100.0 * HX.SQRT3, -100.0 * HX.SQRT3, 50.0, 0.0])
    extra_y = np.array([0.0, 150.0, -150.0, 0.0, 100.0])
    x = np.concatenate([x, extra_x]); y = np.concatenate([y, extra_y])
    pdf = pd.DataFrame({"pid": np.arange(len(x)), "x": x, "y": y})
    size = 100.0
    df = spark.createDataFrame(pdf).repartition(3)
    out = HX.with_hex_index(df, size).orderBy("pid").toPandas()
    q, r = HX.py_axial(x, y, size)
    assert (out["hex_q"].to_numpy() == q).all()
    assert (out["hex_r"].to_numpy() == r).all()
    assert (out["hex_id"].to_numpy() == HX.py_pack(q, r)).all()
    # unpack columns invert pack
    qq, rr = HX.unpack(F.col("hex_id"))
    back = (
        HX.with_hex_index(df, size)
        .select("pid", qq.alias("q2"), rr.alias("r2"), "hex_q", "hex_r")
        .filter((F.col("q2") != F.col("hex_q")) | (F.col("r2") != F.col("hex_r")))
        .count()
    )
    assert back == 0


def test_hex_on_laea_is_exact_equal_area(spark):
    # hexes on the equal-area plane partition ground area exactly: uniform
    # points on the PLANE land uniformly across cells (CV ~ Poisson only)
    x, y = _rand_xy(200_000, seed=5, span=2e5)
    q, r = HX.py_axial(x, y, 10_000.0)
    # keep the fully-covered interior (edge cells are partially sampled)
    cx, cy = HX.py_center(q, r, 10_000.0)
    interior = (np.abs(cx) < 1.8e5) & (np.abs(cy) < 1.8e5)
    _, cnt = np.unique(HX.py_pack(q[interior], r[interior]), return_counts=True)
    poisson_cv = 1.0 / np.sqrt(cnt.mean())
    assert cnt.std() / cnt.mean() < 1.5 * poisson_cv


# --- polyfill ---------------------------------------------------------------

from pygridmap_spark.core import geometry as G
from pygridmap_spark.core import wkb as WKB


def _brute_polyfill(mp, size):
    """Reference polyfill: scan a padded candidate window, center test."""
    xmin, ymin, xmax, ymax = G.multipolygon_bbox(mp)
    rlo = int(np.ceil(ymin / (1.5 * size))) - 2
    rhi = int(np.floor(ymax / (1.5 * size))) + 2
    cells = set()
    for r in range(rlo, rhi + 1):
        qlo = int(np.floor(xmin / (size * HX.SQRT3) - r / 2.0)) - 3
        qhi = int(np.ceil(xmax / (size * HX.SQRT3) - r / 2.0)) + 3
        q = np.arange(qlo, qhi + 1)
        cx, cy = HX.py_center(q, np.full(len(q), r), size)
        inside = G.points_in_multipolygon(cx, cy, mp)
        cells.update((int(qq), r) for qq in q[inside])
    return cells


def _polyfill_cmp(spark, fixtures, size):
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": list(range(len(fixtures))),
                "wkb": [WKB.encode_multipolygon(mp) for mp in fixtures],
            }
        )
    )
    got = HX.polyfill(polys, size).toPandas()
    for pid, mp in enumerate(fixtures):
        g = set(
            zip(
                got[got.poly_id == pid].hex_q.astype(int),
                got[got.poly_id == pid].hex_r.astype(int),
            )
        )
        assert g == _brute_polyfill(mp, size), f"poly {pid}"
    qq, rr = HX.py_unpack(got.hex_id.to_numpy())
    assert (qq == got.hex_q.to_numpy()).all()
    assert (rr == got.hex_r.to_numpy()).all()
    return got


def test_polyfill_shapes(spark):
    rect = [[np.array([[3.1, 2.7], [97.3, 2.7], [97.3, 81.9], [3.1, 81.9], [3.1, 2.7]])]]
    ell = [[np.array(
        [[0.3, 0.2], [60.1, 0.2], [60.1, 30.4], [30.2, 30.4], [30.2, 70.6],
         [0.3, 70.6], [0.3, 0.2]])]]
    hole = [[
        np.array([[-50.2, -40.3], [50.7, -40.3], [50.7, 40.9], [-50.2, 40.9],
                  [-50.2, -40.3]]),
        np.array([[-20.1, -15.2], [20.3, -15.2], [20.3, 15.4], [-20.1, 15.4],
                  [-20.1, -15.2]]),
    ]]
    two_part = [
        [np.array([[0.1, 0.1], [30.2, 0.1], [30.2, 25.3], [0.1, 25.3], [0.1, 0.1]])],
        [np.array([[70.4, 50.2], [95.6, 50.2], [95.6, 75.8], [70.4, 75.8], [70.4, 50.2]])],
    ]
    _polyfill_cmp(spark, [rect, ell, hole, two_part], 10.0)


def test_polyfill_random_concave(spark):
    # star-shaped random polygons (angle-sorted radial vertices are simple)
    rng = np.random.default_rng(42)
    fixtures = []
    for _ in range(4):
        k = rng.integers(6, 14)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(20.0, 120.0, k)
        cx, cy = rng.uniform(-200, 200, 2)
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        fixtures.append([[ring]])
    _polyfill_cmp(spark, fixtures, 7.0)


def test_polyfill_degenerate(spark):
    # sub-cell sliver polygon containing no hex center; and a null wkb row
    sliver = [[np.array([[0.21, 0.31], [0.52, 0.31], [0.52, 0.62], [0.21, 0.62],
                         [0.21, 0.31]])]]
    polys = spark.createDataFrame(
        pd.DataFrame(
            {"poly_id": [0, 1],
             "wkb": [WKB.encode_multipolygon(sliver), None]}
        )
    )
    out = HX.polyfill(polys, 10.0).toPandas()
    assert len(out) == 0


def test_polyfill_chunked_and_repartitioned(spark):
    # a tiny max_span forces many chunked range rows; with a candidate
    # repartition the result must be identical (chunking/exchange is a
    # pure execution detail)
    rect = [[np.array([[3.1, 2.7], [397.3, 2.7], [397.3, 181.9], [3.1, 181.9],
                       [3.1, 2.7]])]]
    polys = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0], "wkb": [WKB.encode_multipolygon(rect)]})
    )
    base = HX.polyfill(polys, 10.0).toPandas()
    chunked = HX.polyfill(
        polys, 10.0, candidates_partitions=5, max_span=3
    ).toPandas()
    key = lambda df: sorted(zip(df.hex_q, df.hex_r))
    assert key(chunked) == key(base)
    assert len(base) > 100


def test_hex_index_nan_coords_yield_null_not_ansi_error(spark):
    """Review finding: NaN -> cast('long') threw CAST_OVERFLOW under ANSI
    mode, killing the stage on one bad row; now NULL axials/id."""
    from pygridmap_spark.functions import hexgrid as HX

    df = spark.createDataFrame(
        [(1, float("nan"), 5.0), (2, 5.0, float("nan")), (3, None, 5.0), (4, 5.0, 5.0)],
        "id long, x double, y double",
    )
    out = {r["id"]: r for r in HX.with_hex_index(df, 100.0).collect()}
    for bad in (1, 2, 3):
        assert out[bad]["hex_q"] is None and out[bad]["hex_id"] is None, bad
    assert out[4]["hex_q"] is not None and out[4]["hex_id"] is not None
