"""Time-bucket bars + funnel analysis (operators/temporal additions).

The driver oracles (`event_bars`, `event_funnel`) hash-gate both
against window/CTE restatements in DuckDB; these pin the semantics:
first/last by (time, tie) with deterministic tie-breaks, the
fixed-point sum contract, bucket boundary alignment, strict-order
greedy funnel matching, the within-window constraint, and zero-user
steps.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pygridmap_spark.operators import temporal as TP


def _ev(spark, rows):
    # rows: (user, type, seconds_offset, value)
    base = dt.datetime(2026, 1, 1)
    data = [
        (i, u, t, base + dt.timedelta(seconds=s), float(v))
        for i, (u, t, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


def test_bars_open_close_high_low_sum(spark):
    df = _ev(spark, [
        (1, "m", 10, 3.5),
        (1, "m", 20, 1.25),
        (1, "m", 50, 9.0),
        (1, "m", 70, 2.0),   # next bucket (60s bars)
    ])
    got = {r.bucket_start: r for r in
           TP.bucket_bars(df, 60, by=["user_id"], tie_col="event_id").collect()}
    b0 = got[1767225600]  # 2026-01-01T00:00:00Z
    assert (b0.open, b0.close, b0.high, b0.low, b0.n) == (3.5, 9.0, 9.0, 1.25, 3)
    assert b0.sum_scaled == 3500000 + 1250000 + 9000000
    b1 = got[1767225660]
    assert (b1.open, b1.close, b1.n) == (2.0, 2.0, 1)


def test_bars_tie_break_on_id(spark):
    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(2, 1, "m", base, 7.0), (1, 1, "m", base, 4.0)],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    [r] = TP.bucket_bars(df, 60, by=["user_id"], tie_col="event_id").collect()
    assert (r.open, r.close) == (4.0, 7.0)  # id asc at equal timestamp


def test_funnel_strict_order_and_counts(spark):
    df = _ev(spark, [
        # u1 completes view -> cart -> buy in order
        (1, "view", 0, 0), (1, "cart", 10, 0), (1, "buy", 20, 0),
        # u2: cart BEFORE view -> only reaches view
        (2, "cart", 0, 0), (2, "view", 10, 0),
        # u3: view then buy (skips cart) -> reaches view only
        (3, "view", 0, 0), (3, "buy", 5, 0),
        # u4 never views
        (4, "buy", 0, 0),
    ])
    got = {r.step: r.n_users for r in
           TP.funnel_steps(df, ["view", "cart", "buy"]).collect()}
    assert got == {"view": 3, "cart": 1, "buy": 1}


def test_funnel_within_window(spark):
    df = _ev(spark, [
        (1, "a", 0, 0), (1, "b", 5, 0),
        (2, "a", 0, 0), (2, "b", 500, 0),  # too late
    ])
    got = {r.step: r.n_users for r in
           TP.funnel_steps(df, ["a", "b"], within_seconds=60).collect()}
    assert got == {"a": 2, "b": 1}


def test_funnel_greedy_earliest_match(spark):
    # the earliest qualifying cart is matched, allowing the later buy
    df = _ev(spark, [
        (1, "view", 10, 0), (1, "cart", 5, 0),   # before view: unusable
        (1, "cart", 15, 0), (1, "buy", 16, 0),
    ])
    got = {r.step: r.n_users for r in
           TP.funnel_steps(df, ["view", "cart", "buy"]).collect()}
    assert got == {"view": 1, "cart": 1, "buy": 1}


def test_funnel_zero_users_step_present(spark):
    df = _ev(spark, [(1, "a", 0, 0)])
    got = {r.step: r.n_users for r in
           TP.funnel_steps(df, ["a", "never"]).collect()}
    assert got == {"a": 1, "never": 0}
    with pytest.raises(ValueError):
        TP.funnel_steps(df, [])


def test_twap_step_function_exact(spark):
    from pygridmap_spark.operators.temporal import time_weighted_avg

    # value 10 for 30s, then 20 for 10s -> twap = (300+200)/40 = 12.5
    df = _ev(spark, [
        (1, "m", 0, 10.0), (1, "m", 30, 20.0), (1, "m", 40, 99.0),
    ])
    [r] = time_weighted_avg(df, by=["user_id"], tie_col="event_id").collect()
    assert r.n == 3 and r.span_us == 40_000_000
    assert r.twap == pytest.approx(12.5)
    # the last observation (99.0) carries no weight


def test_twap_single_event_null(spark):
    from pygridmap_spark.operators.temporal import time_weighted_avg

    df = _ev(spark, [(1, "m", 0, 5.0)])
    [r] = time_weighted_avg(df, by=["user_id"]).collect()
    assert r.twap is None and r.span_us == 0 and r.n == 1


def test_twap_duplicate_ts_zero_width_with_tiebreak(spark):
    from pygridmap_spark.operators.temporal import time_weighted_avg

    # two observations at t=0 (ids 0, 1), then one at t=10: the id-1 row
    # (last of the tie group) carries the whole 10s gap
    df = _ev(spark, [
        (1, "m", 0, 100.0), (1, "m", 0, 4.0), (1, "m", 10, 7.0),
    ])
    [r] = time_weighted_avg(df, by=["user_id"], tie_col="event_id").collect()
    assert r.twap == pytest.approx(4.0)


def test_twap_partitioning_independent(spark):
    from pygridmap_spark.operators.temporal import time_weighted_avg

    rows = [(u, "m", s * 3 + u, float((s * 7 + u) % 23))
            for u in range(5) for s in range(40)]
    df = _ev(spark, rows)
    a = sorted(map(tuple, time_weighted_avg(
        df.repartition(1), by=["user_id"], tie_col="event_id").collect()))
    b = sorted(map(tuple, time_weighted_avg(
        df.repartition(7), by=["user_id"], tie_col="event_id").collect()))
    assert a == b  # exact decimal accumulation: bit-identical


# --- rolling z-score anomaly detection -------------------------------------


def test_rolling_zscore_matches_python_twin(spark):
    import math

    from pygridmap_spark.operators.temporal import rolling_zscore

    vals = [10.0, 11.0, 9.5, 10.2, 50.0, 10.1, 9.9, 10.0]
    rows = [(1, i, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).selectExpr("user_id", "event_id", "CAST(ts AS timestamp) ts", "value")
    n = 4
    out = {
        r["event_id"]: r["z"]
        for r in rolling_zscore(df, n, tie_col="event_id").collect()
    }

    def twin(i):
        if i < n - 1:
            return None
        win = [math.floor(v * 1e6 + 0.5) for v in vals[i - n + 1 : i + 1]]
        s, q, c = float(sum(win)), float(sum(x * x for x in win)), float(n)
        mean = s / c
        var = (q - s * s / c) / c
        if var <= 0:
            return None
        return (win[-1] - mean) / math.sqrt(var)

    for i in range(len(vals)):
        if twin(i) is None:
            assert out[i] is None, i
        else:
            assert out[i] == pytest.approx(twin(i), abs=1e-12), i
    # the spike is a strong positive anomaly; the next window flags recovery
    assert out[4] > 1.5


def test_rolling_zscore_edges(spark):
    from pygridmap_spark.operators.temporal import rolling_zscore

    rows = [
        (1, 0, "2024-01-01 00:00:00", 5.0),
        (1, 1, "2024-01-01 00:01:00", 5.0),
        (1, 2, "2024-01-01 00:02:00", 5.0),   # constant window -> NULL z
        (2, 3, "2024-01-01 00:00:30", None),  # NULL value excluded
        (2, 4, "2024-01-01 00:01:30", 1.0),
        (2, 5, "2024-01-01 00:02:30", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).selectExpr("user_id", "event_id", "CAST(ts AS timestamp) ts", "value")
    out = {r["event_id"]: r["z"] for r in rolling_zscore(df, 2, tie_col="event_id").collect()}
    assert 3 not in out                      # NULL value row dropped
    assert out[2] is None                    # zero variance
    assert out[5] is not None                # the NULL row did not poison u2
    with pytest.raises(ValueError, match="n must be"):
        rolling_zscore(df, 1)
    with pytest.raises(ValueError, match="min_periods"):
        rolling_zscore(df, 4, min_periods=9)
