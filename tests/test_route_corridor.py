"""Geodesic route-corridor enrichment (operators/trajectories.
route_corridor + core/sphere.min_polyline_arc_dist). Pins the open-
polyline arc math against hand-computable cases (perpendicular foot vs
endpoint regimes, no ring-closing wrap edge), the nearest-route argmin
with deterministic tie-break, NULL/NaN coordinate contract, the corridor
filter, and the dimension contracts. The driver oracle (`route_corridor`)
restates the full cross-product foot test in DuckDB SQL.
"""

import math

import numpy as np
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.operators import trajectories as TJ

P_SCHEMA = "pid long, lon double, lat double"
R_SCHEMA = "route_id long, seq long, lon double, lat double"


def _routes(spark, rows):
    return spark.createDataFrame(rows, R_SCHEMA)


def _points(spark, rows):
    return spark.createDataFrame(rows, P_SCHEMA)


def test_polyline_no_wrap_edge():
    # L-shaped open line (0,0)->(10,0)->(10,10); a point near the WOULD-BE
    # closing edge (0,0)-(10,10) must NOT see it
    line = SPH.lonlat_to_xyz(np.array([0.0, 10.0, 10.0]), np.array([0.0, 0.0, 10.0]))
    p = SPH.lonlat_to_xyz(np.array([5.0]), np.array([5.0]))
    d_open = float(SPH.min_polyline_arc_dist(p, line)[0])
    d_ring = float(SPH.min_arc_dist(p, line)[0])
    assert d_ring < math.radians(1.0)  # the diagonal is close
    assert d_open > math.radians(4.0)  # the open line is ~5 deg away


def test_foot_vs_endpoint_regimes():
    line = SPH.lonlat_to_xyz(np.array([0.0, 10.0]), np.array([0.0, 0.0]))
    # abeam the middle: perpendicular foot, distance == |lat|
    p1 = SPH.lonlat_to_xyz(np.array([5.0]), np.array([2.0]))
    assert float(SPH.min_polyline_arc_dist(p1, line)[0]) == pytest.approx(
        math.radians(2.0), rel=1e-9
    )
    # beyond the end: nearer endpoint
    p2 = SPH.lonlat_to_xyz(np.array([13.0]), np.array([0.0]))
    assert float(SPH.min_polyline_arc_dist(p2, line)[0]) == pytest.approx(
        math.radians(3.0), rel=1e-9
    )


def test_nearest_route_and_distance(spark):
    routes = _routes(
        spark,
        [(1, 0, 0.0, 0.0), (1, 1, 10.0, 0.0),   # equator segment
         (2, 0, 0.0, 10.0), (2, 1, 10.0, 10.0)],  # lat-10 segment
    )
    pts = _points(spark, [(0, 5.0, 1.0), (1, 5.0, 8.0), (2, 5.0, 5.0)])
    out = {r["pid"]: r for r in TJ.route_corridor(pts, routes, km_col="route_dist_km").collect()}
    assert out[0]["nearest_route"] == 1
    assert out[1]["nearest_route"] == 2
    assert out[0]["route_dist_rad"] == pytest.approx(math.radians(1.0), rel=1e-6)
    # near-equidistant midpoint: the lat-10 route's great circle bulges
    # POLEWARD between its endpoints (away from lat 5), so the geodesic
    # nearest is the equator route — the planar intuition is wrong here
    assert out[2]["nearest_route"] == 1
    assert out[0]["route_dist_km"] == pytest.approx(
        math.radians(1.0) * SPH.EARTH_RADIUS_KM, rel=1e-6
    )


def test_tie_breaks_to_smaller_route_id(spark):
    # two IDENTICAL routes -> bit-equal distances; the smaller id wins
    routes = _routes(
        spark,
        [(7, 0, 0.0, 0.0), (7, 1, 10.0, 0.0),
         (3, 0, 0.0, 0.0), (3, 1, 10.0, 0.0)],
    )
    pts = _points(spark, [(0, 5.0, 1.0)])
    out = TJ.route_corridor(pts, routes).collect()
    assert out[0]["nearest_route"] == 3


def test_null_coords_null_outputs_and_filter(spark):
    routes = _routes(spark, [(1, 0, 0.0, 0.0), (1, 1, 10.0, 0.0)])
    pts = _points(
        spark,
        [(0, 5.0, 0.5), (1, None, 0.5), (2, float("nan"), 0.5), (3, 5.0, 30.0)],
    )
    out = {r["pid"]: r for r in TJ.route_corridor(pts, routes).collect()}
    assert out[1]["nearest_route"] is None and out[1]["route_dist_rad"] is None
    assert out[2]["nearest_route"] is None and out[2]["route_dist_rad"] is None
    # corridor filter: 100 km keeps only the near point; NULLs drop
    kept = TJ.route_corridor(pts, routes, radius_m=100_000.0).collect()
    assert [r["pid"] for r in kept] == [0]


def test_contracts(spark):
    routes = _routes(spark, [(1, 0, 0.0, 0.0), (1, 1, 10.0, 0.0)])
    pts = _points(spark, [(0, 5.0, 0.5)])
    with pytest.raises(ValueError, match="radius_m"):
        TJ.route_corridor(pts, routes, radius_m=0.0)
    with pytest.raises(ValueError, match="empty"):
        TJ.route_corridor(pts, routes.filter("route_id < 0"))
    with pytest.raises(ValueError, match="already has"):
        TJ.route_corridor(pts.withColumn("nearest_route", pts.pid), routes)


def test_route_row_validation(spark):
    # r6 guard: bad dimension rows fail at the API with the offending
    # route named, instead of dying opaquely inside the executor kernel
    pts = _points(spark, [(0, 5.0, 0.5)])
    null_id = spark.createDataFrame(
        [(None, 0, 0.0, 0.0), (1, 0, 1.0, 1.0), (1, 1, 2.0, 1.0)],
        "route_id long, seq long, lon double, lat double",
    )
    with pytest.raises(ValueError, match="non-null integer"):
        TJ.route_corridor(pts, null_id)
    null_vertex = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, None, 1.0)],
        "route_id long, seq long, lon double, lat double",
    )
    with pytest.raises(ValueError, match="NULL seq/lon/lat"):
        TJ.route_corridor(pts, null_vertex)
    dup_seq = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 1.0, 0.0), (1, 1, 2.0, 0.0)],
        "route_id long, seq long, lon double, lat double",
    )
    with pytest.raises(ValueError, match="duplicate \\(route_id, seq\\)"):
        TJ.route_corridor(pts, dup_seq)


def test_route_collect_cap(spark):
    # r6 guard (VERDICT r5 item 5): an oversized routes table refuses
    # with a clear pre-aggregate error instead of ballooning the driver
    pts = _points(spark, [(0, 5.0, 0.5)])
    big = spark.range(2_000_100).selectExpr(
        "id as route_id", "0L as seq",
        "cast(id % 360 - 180 as double) as lon", "cast(0.0 as double) as lat",
    )
    with pytest.raises(ValueError, match="exceeds 2000000 vertices"):
        TJ.route_corridor(pts, big)


def test_matches_brute_force_numpy_twin(spark):
    rng_rows, route_rows = [], []
    for i in range(300):
        h = (i * 2654435761 + 11) % (1 << 31)
        rng_rows.append((i, -5.0 + (h % 30000) / 1000.0, -10.0 + ((h // 7) % 20000) / 1000.0))
    for rid in range(5):
        for s in range(4):
            hh = ((rid * 31 + s) * 1103515245 + 1) % (1 << 31)
            route_rows.append((rid, s, -5.0 + (hh % 30000) / 1000.0, -10.0 + ((hh // 11) % 20000) / 1000.0))
    out = {
        r["pid"]: (r["nearest_route"], r["route_dist_rad"])
        for r in TJ.route_corridor(
            _points(spark, rng_rows), _routes(spark, route_rows)
        ).collect()
    }
    lines = {
        rid: SPH.lonlat_to_xyz(
            np.array([x for (_r, _s, x, _y) in route_rows if _r == rid]),
            np.array([y for (_r, _s, _x, y) in route_rows if _r == rid]),
        )
        for rid in range(5)
    }
    for pid, plon, plat in rng_rows:
        p = SPH.lonlat_to_xyz(np.array([plon]), np.array([plat]))
        best = min(
            (float(SPH.min_polyline_arc_dist(p, xyz)[0]), rid)
            for rid, xyz in sorted(lines.items())
        )
        assert out[pid][0] == best[1], pid
        assert out[pid][1] == pytest.approx(best[0], abs=1e-12)


def test_string_route_ids_rejected_at_api(spark):
    routes = spark.createDataFrame(
        [("bus-12", 0, 0.0, 0.0), ("bus-12", 1, 10.0, 0.0)],
        "route_id string, seq long, lon double, lat double",
    )
    pts = _points(spark, [(0, 5.0, 0.5)])
    with pytest.raises(ValueError, match="integer column"):
        TJ.route_corridor(pts, routes)
