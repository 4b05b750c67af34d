"""Geodesic distance-to-border enrichment (core/sphere.min_arc_dist +
operators/pip_sphere.zone_border_depth): exact point-to-arc math, hole
boundaries, and the broadcast-join-only plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.operators.pip_sphere import zone_border_depth


def _xyz(lon, lat):
    rl, rp = np.radians(lon), np.radians(lat)
    return np.array(
        [np.cos(rp) * np.cos(rl), np.cos(rp) * np.sin(rl), np.sin(rp)]
    )


def test_min_arc_dist_foot_and_endpoint_cases():
    # equator segment lon 0..10
    seg = np.array([_xyz(0.0, 0.0), _xyz(10.0, 0.0)])
    # foot-on-arc: point due north of lon 5 -> perpendicular distance = lat
    d = SPH.min_arc_dist(_xyz(5.0, 7.0)[None, :], seg)
    assert d[0] == pytest.approx(np.radians(7.0), abs=1e-13)
    # endpoint case: point past the lon-10 end -> nearer endpoint angle
    p = _xyz(20.0, 5.0)
    d = SPH.min_arc_dist(p[None, :], seg)
    want = float(np.arccos(np.clip(p @ _xyz(10.0, 0.0), -1, 1)))
    assert d[0] == pytest.approx(want, abs=1e-13)


def test_quad_interior_depth_is_min_plane_distance():
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    p = _xyz(5.0, 5.0)
    d = SPH.min_arc_dist(p[None, :], SPH.ring_to_xyz(ring))[0]
    # nearest edges are the meridians (planes y=0 / the lon-10 plane):
    # distance asin(cos 5 * sin 5) < the equator's asin(sin 5)
    want = np.arcsin(np.cos(np.radians(5.0)) * np.sin(np.radians(5.0)))
    assert d == pytest.approx(want, abs=1e-13)
    assert d < np.radians(5.0)


def test_zone_border_depth_operator_with_holes(spark):
    outer = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]])
    hole = np.array([[8.0, 8.0], [12.0, 8.0], [12.0, 12.0], [8.0, 12.0]])
    zones = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": [0, 1],
                "wkb": [
                    WKB.encode_multipolygon([[outer, hole]]),
                    WKB.encode_multipolygon([[outer]]),
                ],
            }
        )
    )
    # two points: one near the outer edge, one hugging the hole
    tagged = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [0, 1, 2, 3],
                "lon": [1.0, 7.0, 1.0, 7.0],
                "lat": [10.0, 10.0, 10.0, 10.0],
                "poly_id": [0, 0, 1, 1],
            }
        )
    )
    out = (
        zone_border_depth(tagged, zones, km_col="depth_km")
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    # against the direct kernel
    for k, (lo, la, mp) in enumerate(
        [
            (1.0, 10.0, [[outer, hole]]),
            (7.0, 10.0, [[outer, hole]]),
            (1.0, 10.0, [[outer]]),
            (7.0, 10.0, [[outer]]),
        ]
    ):
        p = _xyz(lo, la)[None, :]
        want = min(
            SPH.min_arc_dist(p, SPH.ring_to_xyz(r))[0]
            for poly in mp
            for r in poly
        )
        assert out.loc[k, "border_depth_rad"] == pytest.approx(
            want, abs=1e-13
        )
        assert out.loc[k, "depth_km"] == pytest.approx(
            want * SPH.EARTH_RADIUS_KM, rel=1e-12
        )
    # the hole IS boundary: the point at lon 7 is nearer the hole ring in
    # the holed zone than in the solid one
    assert out.loc[1, "border_depth_rad"] < out.loc[3, "border_depth_rad"]
    # the point at lon 1 is nearer the outer ring: hole changes nothing
    assert out.loc[0, "border_depth_rad"] == out.loc[2, "border_depth_rad"]


def test_zone_border_depth_plan_is_broadcast_only(spark):
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    zones = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0], "wkb": [WKB.encode_multipolygon([[ring]])]})
    )
    tagged = spark.createDataFrame(
        pd.DataFrame({"pid": [0], "lon": [5.0], "lat": [5.0], "poly_id": [0]})
    )
    df = zone_border_depth(tagged, zones)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # no shuffle on the point stream: the only Exchange is the broadcast
    assert "ShuffleExchange" not in plan.replace(
        "BroadcastExchange", ""
    ) and "Exchange hashpartitioning" not in plan
    # refuses a wkb-name collision instead of silently joining
    with pytest.raises(ValueError):
        zone_border_depth(df.withColumnRenamed("border_depth_rad", "wkb"), zones)
