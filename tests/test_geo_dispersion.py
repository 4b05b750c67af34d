"""Per-group geographic dispersion (operators/domains.geo_dispersion):
directional-statistics correctness, degenerate-group NULL contract, and
the zero-UDF single-shuffle plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.operators.domains import geo_dispersion


def _expected(lon, lat):
    rl, rp = np.radians(lon), np.radians(lat)
    v = np.column_stack(
        [np.cos(rp) * np.cos(rl), np.cos(rp) * np.sin(rl), np.sin(rp)]
    )
    s = v.sum(axis=0)
    norm = np.linalg.norm(s)
    return (
        np.degrees(np.arctan2(s[1], s[0])),
        np.degrees(np.arcsin(s[2] / norm)),
        norm / len(lon),
    )


def test_geo_dispersion_matches_numpy_and_contracts(spark):
    rng = np.random.default_rng(5)
    rows = []
    # group 0: tight cluster near (40, 50) -> R ~ 1
    rows += [
        (0, 40.0 + dx, 50.0 + dy)
        for dx, dy in rng.normal(0, 0.05, (40, 2))
    ]
    # group 1: spread over a hemisphere-ish region
    rows += [
        (1, float(lo), float(la))
        for lo, la in zip(rng.uniform(-90, 90, 60), rng.uniform(-60, 60, 60))
    ]
    # group 2: perfectly antipodal pair -> R == 0, centroid NULL
    rows += [(2, 10.0, 20.0), (2, -170.0, -20.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["domain_key", "lon", "lat"])
    )
    out = (
        geo_dispersion(df, "domain_key")
        .toPandas()
        .set_index("domain_key")
        .sort_index()
    )
    for g in (0, 1):
        lon = np.array([r[1] for r in rows if r[0] == g])
        lat = np.array([r[2] for r in rows if r[0] == g])
        clon, clat, R = _expected(lon, lat)
        assert out.loc[g, "centroid_lon"] == pytest.approx(clon, abs=1e-9)
        assert out.loc[g, "centroid_lat"] == pytest.approx(clat, abs=1e-9)
        assert out.loc[g, "resultant_len"] == pytest.approx(R, abs=1e-12)
        assert out.loc[g, "sph_variance"] == pytest.approx(1 - R, abs=1e-12)
    assert out.loc[0, "resultant_len"] > 0.999  # tight cluster
    assert out.loc[1, "resultant_len"] < out.loc[0, "resultant_len"]
    # antipodal: NULL centroid (no garbage direction, no ANSI div-by-zero)
    assert pd.isna(out.loc[2, "centroid_lon"])
    assert pd.isna(out.loc[2, "centroid_lat"])
    assert out.loc[2, "resultant_len"] == pytest.approx(0.0, abs=1e-12)
    # quantize=9 (the oracle-determinism knob) agrees to the grain
    q = (
        geo_dispersion(df, "domain_key", quantize=9)
        .toPandas()
        .set_index("domain_key")
        .sort_index()
    )
    for g in (0, 1):
        assert q.loc[g, "resultant_len"] == pytest.approx(
            out.loc[g, "resultant_len"], abs=1e-7
        )


def test_geo_dispersion_plan_zero_udf_single_shuffle(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"domain_key": [0, 1], "lon": [1.0, 2.0], "lat": [3.0, 4.0]})
    )
    plan = (
        geo_dispersion(df, "domain_key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "mapInPandas" not in plan  # zero UDFs
    assert plan.count("Exchange hashpartitioning") == 1  # ONE shuffle
    assert "HashAggregate" in plan  # map-side partials kill the Zipf skew
