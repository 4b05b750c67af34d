"""As-of join (operators/temporal.asof_join) contract pins.

The driver oracle (`asof_enrich`) hash-gates the operator against
DuckDB's NATIVE ASOF JOIN on real data; these pin the semantics on a
hand-built pair of frames: backward inclusive matching, no-match nulls,
tolerance staleness, forward direction, and column-clash suffixing.
"""

import datetime as dt

from pygridmap_spark.operators import temporal as TMP

T0 = dt.datetime(2024, 5, 1)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 101, _m(5)),
            (1, 102, _m(10)),
            (1, 103, _m(35)),
            (2, 201, _m(1)),
            (2, 202, _m(50)),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _m(0), "a"),
            (1, _m(10), "b"),   # exact-ts match for event 102
            (1, _m(30), "c"),
            (2, _m(40), "x"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    return left, right


def test_backward_inclusive_and_no_match_nulls(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in TMP.asof_join(left, right).collect()}
    assert out[101]["tag"] == "a" and out[101]["ts_r"] == _m(0)
    assert out[102]["tag"] == "b"          # inclusive: r.ts == l.ts matches
    assert out[103]["tag"] == "c"
    assert out[201]["tag"] is None and out[201]["ts_r"] is None  # before any right
    assert out[202]["tag"] == "x"


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r
        for r in TMP.asof_join(left, right, tolerance_s=300).collect()
    }
    assert out[101]["tag"] == "a"      # 5 min old == tolerance, inclusive
    assert out[102]["tag"] == "b"      # 0 old
    assert out[103]["tag"] == "c"      # 5 min old
    assert out[202]["tag"] is None     # 10 min old > 5 min tolerance


def test_forward_direction(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r
        for r in TMP.asof_join(left, right, direction="forward").collect()
    }
    assert out[101]["tag"] == "b"      # earliest at-or-after m(5) is m(10)
    assert out[102]["tag"] == "b"      # inclusive
    assert out[103]["tag"] is None     # nothing after m(35) for user 1
    assert out[201]["tag"] == "x"


def test_column_clash_gets_suffix(spark):
    left, right = _frames(spark)
    right2 = right.withColumnRenamed("tag", "event_id")  # clashes with left
    out = {r["event_id"]: r for r in TMP.asof_join(left, right2).collect()}
    assert out[102]["event_id_r"] == "b"
    assert out[102]["event_id"] == 102  # left column untouched
