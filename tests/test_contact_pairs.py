"""Spatio-temporal co-location join (operators/trajectories.contact_pairs).

Exactness is the contract: the blocked (S2 cover cell x time bucket)
candidate join must equal the all-pairs filter — pinned here against a
brute-force pandas twin on a hashed ping cloud (cells and buckets both
crossed by construction), plus semantics edges: same-entity exclusion,
window/radius boundaries (inclusive), antimeridian wrap, and the
same-bucket direction dedup (every qualifying point pair counted exactly
once). The driver oracle (`contact_pairs`) hash-gates the full rollup in
DuckDB at sf scale.
"""

import math

import pytest

from pygridmap_spark.functions.geodesy import EARTH_RADIUS_M
from pygridmap_spark.operators import trajectories as TJ

SCHEMA = "ping_id long, user_id long, ts string, lon double, lat double"


def _pings(spark, rows):
    return spark.createDataFrame(
        [(i, u, str(t), lo, la) for (i, u, t, lo, la) in rows], SCHEMA
    ).selectExpr("ping_id", "user_id", "CAST(ts AS timestamp) ts", "lon", "lat")


def _hav_m(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1) * math.cos(p2)
        * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(a)))


def _brute(rows, radius_m, window_s):
    """All-pairs reference: dict (ua, ub) -> (n, first_us, min_d)."""
    out = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[1] == b[1]:
                continue
            if abs(a[5] - b[5]) > window_s * 1e6:
                continue
            d = _hav_m(a[3], a[4], b[3], b[4])
            if d > radius_m:
                continue
            ua, ub = min(a[1], b[1]), max(a[1], b[1])
            cts = a[5] if a[5] <= b[5] else b[5]
            n, f, m = out.get((ua, ub), (0, float("inf"), float("inf")))
            out[(ua, ub)] = (n + 1, min(f, cts), min(m, d))
    return out


def _cloud(n=400, seed=7):
    """Hashed ping cloud: 20 users over 6 hours in a ~200x150 km patch —
    dense enough that buckets AND cells are crossed many times."""
    import datetime

    rows = []
    for i in range(n):
        h = (i * 2654435761 + seed) % (1 << 31)
        u = h % 20
        t_us = int((h % 21600) * 1e6)  # 6 h span, 1 s grain
        lon = 10.0 + ((h // 7) % 20000) / 10000.0   # [10, 12)
        lat = 45.0 + ((h // 11) % 15000) / 10000.0  # [45, 46.5)
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(microseconds=t_us)
        base_us = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6)
        rows.append((i, u, ts, lon, lat, base_us + t_us))
    return rows


def test_equals_bruteforce_on_hashed_cloud(spark):
    rows = _cloud()
    radius, window = 20_000.0, 900.0  # 20 km, 15 min
    ref = _brute(rows, radius, window)
    df = _pings(spark, [(r[0], r[1], r[2], r[3], r[4]) for r in rows])
    got = {
        (r["user_a"], r["user_b"]): (r["n_contacts"], r["min_dist_m"])
        for r in TJ.contact_pairs(df, radius, window).collect()
    }
    assert set(got) == set(ref)
    assert ref, "fixture must actually produce contacts"
    for k, (n, _f, d) in ref.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(d, abs=1e-6)


def test_window_and_radius_boundaries_inclusive(spark):
    # two users, exactly window_s apart in time, ~well inside radius
    rows = [
        (0, 1, "2024-01-01 00:00:00", 10.0, 45.0),
        (1, 2, "2024-01-01 00:10:00", 10.0, 45.0),
    ]
    out = TJ.contact_pairs(_pings(spark, rows), 1000.0, 600.0).collect()
    assert len(out) == 1 and out[0]["n_contacts"] == 1
    # one microsecond past the window: no contact
    rows2 = [
        (0, 1, "2024-01-01 00:00:00", 10.0, 45.0),
        (1, 2, "2024-01-01 00:10:00.000001", 10.0, 45.0),
    ]
    assert TJ.contact_pairs(_pings(spark, rows2), 1000.0, 600.0).count() == 0


def test_same_entity_never_pairs(spark):
    rows = [
        (0, 1, "2024-01-01 00:00:00", 10.0, 45.0),
        (1, 1, "2024-01-01 00:00:30", 10.0001, 45.0),
        (2, 2, "2024-01-01 00:00:10", 10.0001, 45.0001),
    ]
    out = TJ.contact_pairs(_pings(spark, rows), 1000.0, 600.0).collect()
    assert {(r["user_a"], r["user_b"]) for r in out} == {(1, 2)}
    # user 1 had TWO pings near user 2's one -> two contacts
    assert out[0]["n_contacts"] == 2


def test_antimeridian_and_cell_edge_pairs_found(spark):
    # straddle the antimeridian: ~1.57 km apart at lat 0
    rows = [
        (0, 1, "2024-01-01 00:00:00", 179.993, 0.0),
        (1, 2, "2024-01-01 00:00:05", -179.993, 0.0),
    ]
    out = TJ.contact_pairs(_pings(spark, rows), 2000.0, 60.0).collect()
    assert len(out) == 1
    assert out[0]["min_dist_m"] == pytest.approx(
        _hav_m(179.993, 0.0, -179.993, 0.0), rel=1e-9
    )


def test_rollup_fields(spark):
    rows = [
        (0, 5, "2024-01-01 00:00:00", 10.0, 45.0),
        (1, 9, "2024-01-01 00:00:20", 10.001, 45.0),   # ~79 m
        (2, 5, "2024-01-01 01:00:00", 10.0, 45.0),
        (3, 9, "2024-01-01 01:00:10", 10.002, 45.0),   # ~157 m
    ]
    out = TJ.contact_pairs(_pings(spark, rows), 500.0, 300.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_a"], r["user_b"]) == (5, 9)
    assert r["n_contacts"] == 2
    assert str(r["first_ts"]).startswith("2024-01-01 00:00:00")
    assert r["min_dist_m"] == pytest.approx(_hav_m(10.0, 45.0, 10.001, 45.0), rel=1e-9)


def test_bad_params_raise(spark):
    df = _pings(spark, [(0, 1, "2024-01-01 00:00:00", 0.0, 0.0)])
    with pytest.raises(ValueError, match="radius_m"):
        TJ.contact_pairs(df, 0.0, 60.0)
    with pytest.raises(ValueError, match="window_s"):
        TJ.contact_pairs(df, 100.0, -1.0)
    with pytest.raises(ValueError, match="too large"):
        TJ.contact_pairs(df, 1.5e7, 60.0)
    with pytest.raises(ValueError, match="finer than"):
        TJ.contact_pairs(df, 100_000.0, 60.0, level=20)


def test_null_coords_produce_no_contacts_or_junk(spark):
    # NULL/NaN coords get NULL S2 cells (r4 contract) and are dropped
    # BEFORE the probe kernel (no NaN->int64 casts, no junk probe rows)
    rows = [
        (0, 1, "2024-01-01 00:00:00", 10.0, 45.0),
        (1, 2, "2024-01-01 00:00:05", None, 45.0),
        (2, 3, "2024-01-01 00:00:06", float("nan"), 45.0),
        (3, 4, "2024-01-01 00:00:07", 10.0001, 45.0),
    ]
    out = TJ.contact_pairs(_pings(spark, rows), 1000.0, 600.0).collect()
    assert {(r["user_a"], r["user_b"]) for r in out} == {(1, 4)}
