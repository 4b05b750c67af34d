"""Count-min sketch (operators/sketches.cm_sketch family) pins.

The driver oracle (`cm_heavy_hitters`) hash-gates the whole pipeline
against the identical md5 arithmetic in DuckDB; these pin the sketch
algebra itself: overestimate-only point queries, the EXACT shard-merge
identity, absent-item zero, weighted counts, and by-group isolation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygridmap_spark.operators import sketches as SK

D, W = 4, 256


def _items(spark, n=2000, card=37):
    # zipf-ish: item i appears ~ (card - i) times
    return spark.range(n).select(
        F.concat(F.lit("tok"), (F.col("id") % card) % ((F.col("id") % 11) + 1)).alias(
            "item"
        )
    )


def test_overestimate_only_and_heavy_hitters_exact_enough(spark):
    df = _items(spark)
    sk = SK.cm_sketch(df, "item", depth=D, width=W)
    exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("tf"))
    est = SK.cm_lookup(sk, exact.select("item", "tf"), "item", D, W)
    j = est.join(exact, "item").collect()
    assert len(j) > 5
    assert all(r.cm_est >= r.tf for r in j)  # CM never underestimates
    # width 256 >> distinct items here: most estimates are exact
    assert sum(r.cm_est == r.tf for r in j) >= len(j) - 2


def test_shard_merge_identity_exact(spark):
    df = _items(spark).withColumn(
        "shard", (F.crc32(F.col("item")) % 5).cast("long")
    )
    whole = SK.cm_sketch(df, "item", depth=D, width=W)
    per_shard = SK.cm_sketch(df, "item", depth=D, width=W, by=["shard"])
    merged = SK.cm_merge(per_shard)
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b  # cell-for-cell, count-for-count


def test_absent_item_estimates_zero_not_null(spark):
    sk = SK.cm_sketch(_items(spark), "item", depth=D, width=W)
    probe = sk.sparkSession.createDataFrame(
        [("never-seen-token-xyz",)], "item string"
    )
    [r] = SK.cm_lookup(sk, probe, "item", D, W).collect()
    assert r.cm_est == 0


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], "item string, w long"
    )
    sk = SK.cm_sketch(df, "item", depth=D, width=W, weight_col="w")
    est = SK.cm_lookup(
        sk, df.select("item").distinct(), "item", D, W
    ).collect()
    got = {r.item: r.cm_est for r in est}
    assert got["a"] >= 15 and got["b"] >= 7
    # width 256, 2 items: no collision -> exact
    assert got == {"a": 15, "b": 7}


def test_by_group_isolation(spark):
    df = spark.createDataFrame(
        [("g1", "x")] * 4 + [("g2", "x")] * 9, "g string, item string"
    )
    sk = SK.cm_sketch(df, "item", depth=D, width=W, by=["g"])
    probe = df.select("g", "item").distinct()
    got = {
        (r.g, r.item): r.cm_est
        for r in SK.cm_lookup(sk, probe, "item", D, W, by=["g"]).collect()
    }
    assert got == {("g1", "x"): 4, ("g2", "x"): 9}
