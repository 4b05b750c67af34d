"""Bloom filter (operators/sketches.bloom_sketch family) pins.

The driver oracle (`bloom_membership`) hash-gates the whole pipeline
against the identical md5/bit arithmetic in DuckDB; these pin the sketch
algebra itself: zero false negatives, the EXACT shard-merge identity,
definite-absent verdicts, by-group isolation, the NULL-item contract,
and the 63-bit word layout (bit 63 never set — the DuckDB shift bound).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygridmap_spark.operators import sketches as SK

W, K = 64, 4  # 64 words * 63 bits = 4032-bit filter


def _items(spark, n=500, prefix="tok"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id") % 200).alias("item")
    )


def test_no_false_negatives(spark):
    df = _items(spark)
    sk = SK.bloom_sketch(df, "item", words=W, k=K)
    got = SK.bloom_contains(
        sk, df.select("item").distinct(), "item", words=W, k=K
    ).collect()
    assert len(got) == 200
    assert all(r.maybe_present for r in got)  # Bloom never misses


def test_absent_items_mostly_definitely_absent(spark):
    df = _items(spark)
    sk = SK.bloom_sketch(df, "item", words=W, k=K)
    absent = _items(spark, prefix="never")
    got = SK.bloom_contains(
        sk, absent.select("item").distinct(), "item", words=W, k=K
    ).collect()
    # n=200, m=4032, k=4 -> FP rate ~ (1-e^{-0.198})^4 ~ 0.1 %; allow slack
    fps = sum(r.maybe_present for r in got)
    assert fps <= 5


def test_shard_merge_identity_exact(spark):
    df = _items(spark).withColumn(
        "shard", (F.crc32(F.col("item")) % 5).cast("long")
    )
    whole = SK.bloom_sketch(df, "item", words=W, k=K)
    per_shard = SK.bloom_sketch(df, "item", words=W, k=K, by=["shard"])
    merged = SK.bloom_merge(per_shard)
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b  # word-for-word, bit-for-bit


def test_bit63_never_set(spark):
    # the word layout keeps bit 63 clear so the DuckDB oracle's signed
    # left shift (max 62) can reproduce every mask
    sk = SK.bloom_sketch(_items(spark, n=5000), "item", words=4, k=8)
    rows = sk.collect()
    assert rows and all(r.bits >= 0 for r in rows)
    assert all(0 <= r.word < 4 for r in rows)


def test_by_group_isolation(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g2", "y")], "g string, item string"
    )
    sk = SK.bloom_sketch(df, "item", words=W, k=K, by=["g"])
    probe = spark.createDataFrame(
        [("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y")],
        "g string, item string",
    )
    got = {
        (r.g, r.item): r.maybe_present
        for r in SK.bloom_contains(
            sk, probe, "item", words=W, k=K, by=["g"]
        ).collect()
    }
    assert got == {
        ("g1", "x"): True,
        ("g1", "y"): False,
        ("g2", "x"): False,
        ("g2", "y"): True,
    }


def test_null_item_contract(spark):
    df = spark.createDataFrame([("a",), (None,)], "item string")
    sk = SK.bloom_sketch(df, "item", words=W, k=K)
    # NULL rows never contribute bits to the build
    assert SK.bloom_contains(
        sk, spark.createDataFrame([("a",)], "item string"), "item", W, K
    ).collect()[0].maybe_present
    # a NULL probe verdicts NULL (not FALSE): unknown, not absent
    [r] = SK.bloom_contains(sk, df.filter(F.col("item").isNull()), "item", W, K).collect()
    assert r.maybe_present is None


def test_probe_against_empty_sketch_is_false(spark):
    empty = SK.bloom_sketch(
        _items(spark).filter(F.lit(False)), "item", words=W, k=K
    )
    [r] = SK.bloom_contains(
        empty,
        empty.sparkSession.createDataFrame([("a",)], "item string"),
        "item", W, K,
    ).collect()
    assert r.maybe_present is False
