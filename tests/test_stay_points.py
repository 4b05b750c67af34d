"""Stay-point detection (operators/trajectories.stay_points) contract pins.

The driver oracle (`stay_points`) hash-gates the full pipeline on real
data; these pin the segmentation rules on a hand-built trajectory: hop >
radius breaks, gap > max_gap breaks even in place, sub-min-dwell segments
drop (leaving seg_id gaps), NULL coordinates break, and the centroid is
the exact decimal mean.
"""

import datetime as dt

import pytest

from pygridmap_spark.operators import trajectories as TJ

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

# ~1e-5 deg latitude ~ 1.1 m: comfortably inside a 200 m radius
J = 1e-5


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lon double, lat double"
    )


def _m(ts_min):
    return T0 + dt.timedelta(minutes=ts_min)


def test_stay_detected_and_short_segment_dropped(spark):
    rows = [
        # 31-minute dwell at ~(10, 50), 4 pings with metre jitter
        (1, 1, _m(0), 10.0, 50.0),
        (1, 2, _m(10), 10.0 + J, 50.0 - J),
        (1, 3, _m(20), 10.0 - J, 50.0 + J),
        (1, 4, _m(31), 10.0, 50.0),
        # teleport 1 degree away, only 5 minutes there -> dropped
        (1, 5, _m(40), 11.0, 50.0),
        (1, 6, _m(45), 11.0 + J, 50.0),
    ]
    out = TJ.stay_points(
        _df(spark, rows), radius_m=200.0, max_gap_s=3600, min_dwell_s=900,
        tiebreak="event_id",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["seg_id"] == 1 and r["n_pings"] == 4
    assert r["dwell_s"] == 31 * 60
    assert r["t_start"] == _m(0) and r["t_end"] == _m(31)
    assert r["ctr_lon"] == pytest.approx(10.0, abs=1e-5)
    assert r["ctr_lat"] == pytest.approx(50.0, abs=1e-5)


def test_gap_breaks_in_place_and_seg_ids_gap(spark):
    rows = [
        # 20-minute dwell, then a 2-hour silence AT THE SAME SPOT, then
        # another 20-minute dwell: two separate stays (gap > max_gap)
        (2, 1, _m(0), 10.0, 50.0),
        (2, 2, _m(20), 10.0, 50.0 + J),
        (2, 3, _m(20 + 125), 10.0, 50.0),
        (2, 4, _m(40 + 125), 10.0 + J, 50.0),
    ]
    out = sorted(
        TJ.stay_points(
            _df(spark, rows), radius_m=200.0, max_gap_s=3600, min_dwell_s=900,
            tiebreak="event_id",
        ).collect(),
        key=lambda r: r["seg_id"],
    )
    assert [r["seg_id"] for r in out] == [1, 2]
    assert all(r["dwell_s"] == 1200 for r in out)


def test_null_coordinates_break_segment(spark):
    rows = [
        (3, 1, _m(0), 10.0, 50.0),
        (3, 2, _m(10), 10.0, 50.0),
        (3, 3, _m(20), None, None),  # blind spot splits the dwell
        (3, 4, _m(30), 10.0, 50.0),
        (3, 5, _m(40), 10.0, 50.0),
    ]
    out = TJ.stay_points(
        _df(spark, rows), radius_m=200.0, max_gap_s=3600, min_dwell_s=300,
        tiebreak="event_id",
    ).collect()
    # segments: [1,2] dwell 600, [null row] singleton, [4,5] dwell 600
    dwells = sorted(r["dwell_s"] for r in out)
    assert dwells == [600, 600]
    assert {r["seg_id"] for r in out} == {1, 3}
