"""Binned interval-overlap join (operators/temporal.interval_join) pins.

The driver oracle (`interval_overlap`) hash-gates the operator against a
plain inequality join in DuckDB; these pin the semantics: closed-interval
overlap incl. touching endpoints, exactly-once emission across many
shared bins, bin_width invariance, by-key isolation, and NULL/reversed
interval drop.
"""

from pygridmap_spark.operators import temporal as TMP


def _ij(spark, lrows, rrows, **kw):
    left = spark.createDataFrame(lrows, "lid long, start long, end long")
    right = spark.createDataFrame(rrows, "rid long, start long, end long")
    out = TMP.interval_join(left, right, l_start="start", l_end="end",
                            r_start="start", r_end="end", **kw)
    return sorted((r["lid"], r["rid"]) for r in out.collect())


def test_overlap_semantics_closed_intervals(spark):
    lrows = [(1, 0, 10), (2, 20, 30), (3, 50, 60)]
    rrows = [(1, 10, 15), (2, 31, 40), (3, 55, 58), (4, 5, 100)]
    got = _ij(spark, lrows, rrows, bin_width=7)
    # r1 touches l1 at 10 (closed: overlap); r2 starts after l2 ends (31>30)
    assert got == [(1, 1), (1, 4), (2, 4), (3, 3), (3, 4)]


def test_exactly_once_across_many_bins(spark):
    # both intervals span ~30 bins; the pair must appear exactly once
    got = _ij(spark, [(1, 0, 300)], [(9, 10, 290)], bin_width=10)
    assert got == [(1, 9)]


def test_bin_width_invariance(spark):
    lrows = [(i, i * 7, i * 7 + 12) for i in range(30)]
    rrows = [(i, i * 11, i * 11 + 4) for i in range(20)]
    a = _ij(spark, lrows, rrows, bin_width=3)
    b = _ij(spark, lrows, rrows, bin_width=50)
    c = _ij(spark, lrows, rrows, bin_width=1000)  # everything in ~1 bin
    assert a == b == c and len(a) > 0


def test_by_key_isolation(spark):
    left = spark.createDataFrame(
        [(1, 10, 0, 100), (2, 20, 0, 100)], "lid long, k long, start long, end long"
    )
    right = spark.createDataFrame(
        [(7, 10, 50, 60), (8, 30, 50, 60)], "rid long, k long, start long, end long"
    )
    out = TMP.interval_join(left, right, bin_width=10, by="k")
    assert sorted((r["lid"], r["rid"]) for r in out.collect()) == [(1, 7)]


def test_null_and_reversed_intervals_vanish(spark):
    lrows = [(1, 0, 10), (2, None, 10), (3, 30, 20)]
    got = _ij(spark, lrows, [(1, 5, 6), (2, 25, 25)], bin_width=5)
    assert got == [(1, 1)]
