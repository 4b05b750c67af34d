"""simplify_wkb pins: vertex-parity with the oracle-gated
simplify_trajectory composite-key path, ring/hole collapse rules,
geometry-type preservation, NULL passthrough, NaN raise, and the
anchored-ring contract (first vertex always survives)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.core import wkb as W
from pygridmap_spark.operators import simplify as SP
from pygridmap_spark.operators import trajectories as TJ


def _ring(n, r, cx=0.0, cy=0.0, noise=0.0):
    pts = []
    for i in range(n):
        a = 2 * np.pi * i / n
        rr = r + (((i * 7919) % 21 - 10) / 10.0) * noise
        pts.append((cx + rr * np.cos(a), cy + rr * np.sin(a)))
    pts.append(pts[0])
    return pts


def _simplified(spark, polys, tol):
    rows = [(i, bytearray(W.encode_polygon(p))) for i, p in enumerate(polys)]
    df = spark.createDataFrame(rows, "pid long, wkb binary")
    out = SP.simplify_wkb(df, tol, wkb_col="wkb", out_col="simp")
    return {r.pid: (None if r.simp is None else bytes(r.simp)) for r in out.collect()}


def test_vertex_parity_with_trajectory_twin(spark):
    # a noisy 120-gon: the WKB path must keep exactly the vertices the
    # composite-key vertex-rows path keeps
    ring = _ring(120, 100.0, noise=1.5)
    got = _simplified(spark, [[ring]], tol := 4.0)
    kept_wkb = W.decode_multipolygon(got[0])[0][0][:-1]  # drop closing

    vrows = [
        (0, 0, i, float(x), float(y)) for i, (x, y) in enumerate(ring[:-1])
    ]
    vdf = spark.createDataFrame(vrows, "pid long, ring long, seq long, x double, y double")
    twin = TJ.simplify_trajectory(
        vdf, tol, entity_col=["pid", "ring"], ts_col="seq", x="x", y="y"
    )
    kept_twin = [(r.x, r.y) for r in sorted(twin.collect(), key=lambda r: r.seq)]
    assert [tuple(p) for p in kept_wkb] == kept_twin
    assert 4 <= len(kept_wkb) < 120


def test_hole_collapse_drops_hole_shell_collapse_drops_polygon(spark):
    shell = _ring(40, 100.0)
    tiny_hole = _ring(12, 0.01, cx=10, cy=10)  # collapses at tol 1.0
    big_hole = _ring(12, 30.0, cx=-20, cy=-20)
    got = _simplified(spark, [[shell, tiny_hole, big_hole]], 1.0)
    polys = W.decode_multipolygon(got[0])
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + big hole only

    # every vertex within tol of the v0->v_last chord: the open-cut DP
    # keeps only the two cut endpoints -> < 3 distinct -> collapse
    nearly_flat = [[(0, 0), (50, 0.4), (100, -0.3), (150, 0.2), (200, 0.1), (0, 0)]]
    got = _simplified(spark, [nearly_flat], 1.0)
    assert got[0] is None  # shell collapsed -> NULL geometry


def test_geometry_type_preserved(spark):
    ring = _ring(30, 10.0)
    poly = W.encode_polygon([ring])
    multi = W.encode_multipolygon([[ring], [_ring(30, 10.0, cx=100)]])
    df = spark.createDataFrame(
        [(0, bytearray(poly)), (1, bytearray(multi))], "pid long, wkb binary"
    )
    out = {r.pid: bytes(r.wkb) for r in SP.simplify_wkb(df, 0.5).collect()}
    assert out[0][1:5] == (3).to_bytes(4, "little")  # Polygon stays Polygon
    assert out[1][1:5] == (6).to_bytes(4, "little")
    assert len(W.decode_multipolygon(out[1])) == 2


def test_anchor_vertex_survives_and_null_passthrough(spark):
    ring = _ring(60, 50.0, noise=0.5)
    df = spark.createDataFrame(
        [(0, bytearray(W.encode_polygon([ring]))), (1, None)],
        "pid long, wkb binary",
    )
    out = {r.pid: r.wkb for r in SP.simplify_wkb(df, 2.0).collect()}
    assert out[1] is None
    first = W.decode_multipolygon(bytes(out[0]))[0][0][0]
    assert tuple(first) == ring[0]


def test_nan_coordinate_raises(spark):
    bad = W.encode_polygon([[(0, 0), (1, float("nan")), (2, 0), (0, 0)]])
    df = spark.createDataFrame([(0, bytearray(bad))], "pid long, wkb binary")
    with pytest.raises(Exception, match="NaN"):
        SP.simplify_wkb(df, 0.5).collect()


def test_tolerance_zero_keeps_all_noncollinear(spark):
    ring = _ring(24, 10.0)
    got = _simplified(spark, [[ring]], 0.0)
    assert len(W.decode_multipolygon(got[0])[0][0]) == 25  # 24 + closing
