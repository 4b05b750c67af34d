"""Fused one-pass geodesic zonal statistics (core/sphere
multipolygon_stats + operators/pip_sphere.geodesic_stats): bit-identity
with the chained single-stat kernels, the NULL contracts, and the
zero-exchange plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.operators.pip_sphere import (
    geodesic_area,
    geodesic_centroid,
    geodesic_length,
    geodesic_stats,
)


def _fixture_mps():
    outer = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]])
    hole = np.array([[12.0, 12.0], [18.0, 12.0], [18.0, 18.0], [12.0, 18.0]])
    part2 = np.array([[40.0, -30.0], [55.0, -30.0], [55.0, -10.0], [40.0, -10.0]])
    high = np.array([[0.0, 60.0], [30.0, 60.0], [30.0, 80.0], [0.0, 80.0]])
    return [[[outer]], [[outer, hole]], [[outer, hole], [part2]], [[high]]]


def test_multipolygon_stats_bit_identical_to_single_kernels():
    for mp in _fixture_mps():
        area, perim, cen = SPH.multipolygon_stats(mp)
        assert area == SPH.spherical_multipolygon_area(mp)  # exact ==
        assert perim == SPH.multipolygon_perimeter(mp)  # exact ==
        want = SPH.multipolygon_centroid_xyz(mp)
        np.testing.assert_array_equal(cen, want)  # exact ==
    # degenerate cancellation -> None centroid, finite area/perimeter
    q = np.array([[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0]])
    anti = np.column_stack([q[:, 0] - 180.0, -q[:, 1]])[::-1]
    area, perim, cen = SPH.multipolygon_stats([[q], [anti]])
    assert cen is None and area > 0 and perim > 0
    assert SPH.multipolygon_stats([]) == (0.0, 0.0, None)


def test_geodesic_stats_operator_equals_chained_operators(spark):
    mps = _fixture_mps()
    pdf = pd.DataFrame(
        {
            "gid": list(range(len(mps))) + [len(mps)],
            "wkb": [WKB.encode_multipolygon(mp) for mp in mps] + [None],
        }
    )
    df = spark.createDataFrame(pdf)
    fused = (
        geodesic_stats(df)
        .toPandas()
        .sort_values("gid")
        .reset_index(drop=True)
    )
    chained = geodesic_area(df, km2_col="area_km2")
    chained = geodesic_length(chained, km_col="length_km")
    chained = (
        geodesic_centroid(chained)
        .toPandas()
        .sort_values("gid")
        .reset_index(drop=True)
    )
    for c in [
        "area_sr", "area_km2", "length_rad", "length_km",
        "centroid_lon", "centroid_lat",
    ]:
        a = fused[c].to_numpy(dtype=float)
        b = chained[c].to_numpy(dtype=float)
        assert np.array_equal(a, b, equal_nan=True), c  # bit-identical
    # compactness: present, in (0, 1], NULL only on the NULL-wkb row
    comp = fused["compactness"]
    assert comp[: len(mps)].notna().all()
    assert ((comp[: len(mps)] > 0) & (comp[: len(mps)] <= 1)).all()
    assert pd.isna(comp[len(mps)])
    # NULL wkb -> every stat NULL, never NaN
    assert fused.iloc[len(mps)].drop(["gid", "wkb"]).isna().all()
    assert not np.isnan(np.nansum(fused["area_sr"].to_numpy(dtype=float)))


def test_geodesic_stats_plan_has_no_exchange(spark):
    ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    pdf = pd.DataFrame({"gid": [0], "wkb": [WKB.encode_multipolygon([[ring]])]})
    df = geodesic_stats(spark.createDataFrame(pdf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # degenerate boundary (empty multipolygon) -> NULL compactness
    out = geodesic_stats(
        spark.createDataFrame(
            pd.DataFrame({"gid": [0], "wkb": [WKB.encode_multipolygon([])]})
        )
    ).toPandas()
    assert pd.isna(out.loc[0, "compactness"])
    assert out.loc[0, "area_sr"] == 0.0 and out.loc[0, "length_rad"] == 0.0
