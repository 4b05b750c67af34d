"""OD flow matrix from stay points (operators/trajectories.od_flows).

The driver oracle (`od_flows`) hash-gates the full stay->flow composition
on real data; these tests pin the pairing and rollup semantics on a
hand-built stay table: consecutive-order pairing, per-entity isolation,
self-loop handling, NULL-centroid drop, and distinct-entity counts.
"""

import pytest

from pygridmap_spark.operators import trajectories as TJ

Z = 3  # 8x8 grid; cell pitch 45 deg lon x 22.5 deg lat


def _stays(spark, rows):
    """(user, t_start, lon, lat) -> a minimal stay frame."""
    return spark.createDataFrame(
        rows, "user_id long, t_start long, ctr_lon double, ctr_lat double"
    )


def _key(r):
    return (r["o_ix"], r["o_iy"], r["d_ix"], r["d_iy"])


def test_consecutive_pairing_and_counts(spark):
    # cell centers: A=(-157.5,-78.75) ix0,iy0; B=(-112.5,-78.75) ix1,iy0;
    # C=(-157.5,-56.25) ix0,iy1
    A, B, C = (-157.5, -78.75), (-112.5, -78.75), (-157.5, -56.25)
    rows = [
        (1, 10, *A), (1, 20, *B), (1, 30, *C),   # A->B, B->C
        (2, 10, *A), (2, 25, *B),                 # A->B
    ]
    out = {_key(r): r for r in TJ.od_flows(_stays(spark, rows), Z).collect()}
    assert out[(0, 0, 1, 0)]["n_trips"] == 2      # A->B from both users
    assert out[(0, 0, 1, 0)]["n_entities"] == 2
    assert out[(1, 0, 0, 1)]["n_trips"] == 1      # B->C
    assert len(out) == 2


def test_entities_do_not_cross_pair(spark):
    # last stay of user 1 and first of user 2 must NOT form a flow
    A, B = (-157.5, -78.75), (-112.5, -78.75)
    rows = [(1, 10, *A), (2, 20, *B)]
    assert TJ.od_flows(_stays(spark, rows), Z).count() == 0


def test_self_loops_kept_then_dropped(spark):
    A, B = (-157.5, -78.75), (-112.5, -78.75)
    # user dwells twice in A (distinct stays, same cell), then moves to B
    rows = [(1, 10, *A), (1, 20, -157.0, -78.0), (1, 30, *B)]
    keep = {_key(r): r for r in TJ.od_flows(_stays(spark, rows), Z).collect()}
    assert keep[(0, 0, 0, 0)]["n_trips"] == 1     # the A->A self-loop
    assert keep[(0, 0, 1, 0)]["n_trips"] == 1
    drop = {_key(r): r
            for r in TJ.od_flows(_stays(spark, rows), Z, drop_self=True).collect()}
    assert (0, 0, 0, 0) not in drop
    assert drop[(0, 0, 1, 0)]["n_trips"] == 1


def test_null_centroid_breaks_the_chain(spark):
    A, B = (-157.5, -78.75), (-112.5, -78.75)
    rows = [(1, 10, *A), (1, 20, None, None), (1, 30, *B)]
    out = {_key(r): r for r in TJ.od_flows(_stays(spark, rows), Z).collect()}
    # the NULL stay drops entirely: A pairs directly with B
    assert list(out) == [(0, 0, 1, 0)]


def test_repeat_trips_same_user_counted_once_distinct(spark):
    A, B = (-157.5, -78.75), (-112.5, -78.75)
    rows = [(1, 10, *A), (1, 20, *B), (1, 30, *A), (1, 40, *B)]
    out = {_key(r): r for r in TJ.od_flows(_stays(spark, rows), Z).collect()}
    assert out[(0, 0, 1, 0)]["n_trips"] == 2
    assert out[(0, 0, 1, 0)]["n_entities"] == 1   # distinct, not trip count
    assert out[(1, 0, 0, 0)]["n_trips"] == 1      # the return B->A
