"""HDR quantile sketch: bucket exactness, merge algebra, error bound."""

import math

import pyspark.sql.functions as F
import pytest

from pygridmap_spark.operators import quantiles as Q


def _vals_df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v long")


def test_bucket_order_isomorphic_and_identity_regime(spark):
    # identity regime: v < 2^(p+1) buckets AS v; above: order preserved
    p = 4
    vals = list(range(0, 40)) + [97, 255, 256, 511, 1024, 123456]
    df = _vals_df(spark, vals)
    rows = (
        df.select("v", Q.hdr_bucket(F.col("v"), p).alias("b"))
        .orderBy("v")
        .collect()
    )
    for r in rows:
        if r["v"] < (1 << (p + 1)):
            assert r["b"] == r["v"], r
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)
    # upper bound contains the value and is within the 2^-p slice
    ubs = (
        df.select(
            "v", Q.hdr_bucket_upper(Q.hdr_bucket(F.col("v"), p), p).alias("ub")
        ).collect()
    )
    for r in ubs:
        assert r["v"] <= r["ub"] <= math.floor(r["v"] * (1 + 2.0**-p)) + 1


def test_null_and_negative_drop(spark):
    df = spark.createDataFrame(
        [(None,), (-5,), (0,), (7,)], "v long"
    )
    sk = Q.hdr_sketch(df, "v", p=3).collect()
    assert sorted((r["bucket"], r["cnt"]) for r in sk) == [(0, 1), (7, 1)]


def test_merge_algebra_exact(spark):
    # cm_merge contract: union of per-shard sketches, merged, equals the
    # whole-corpus sketch cell-for-cell
    vals = [(i * 2654435761) % 100_000 for i in range(5000)]
    df = spark.createDataFrame(
        [(v, v % 7) for v in vals], "v long, shard int"
    )
    whole = Q.hdr_sketch(df, "v", p=7)
    shards = Q.hdr_sketch(df, "v", by=["shard"], p=7)
    merged = Q.hdr_merge(shards.drop("shard"))
    a = sorted((r["bucket"], r["cnt"]) for r in whole.collect())
    b = sorted((r["bucket"], r["cnt"]) for r in merged.collect())
    assert a == b


@pytest.mark.parametrize("p", [5, 8])
def test_quantile_error_bound(spark, p):
    vals = sorted(((i * 1103515245) % 3_000_000 for i in range(4000)))
    df = _vals_df(spark, vals)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    sk = Q.hdr_sketch(df, "v", p=p)
    out = {r["q"]: r for r in Q.hdr_quantiles(sk, qs, p=p).collect()}
    n = len(vals)
    for q in qs:
        r = out[q]
        assert r["n"] == n
        true = vals[max(0, math.ceil(q * n) - 1)]
        # est = upper bound of the bucket holding the ranked element
        assert true <= r["est"]
        assert r["est"] <= true * (1 + 2.0**-p) + 1


def test_quantiles_exact_in_identity_regime(spark):
    # all values < 2^(p+1) -> est IS the discrete lower quantile
    p = 7
    vals = [(i * 97) % 250 for i in range(1000)]
    df = _vals_df(spark, vals)
    sv = sorted(vals)
    qs = [0.1, 0.5, 0.95]
    out = {r["q"]: r["est"] for r in
           Q.hdr_quantiles(Q.hdr_sketch(df, "v", p=p), qs, p=p).collect()}
    for q in qs:
        assert out[q] == sv[math.ceil(q * len(sv)) - 1]


def test_grouped_quantiles(spark):
    df = spark.createDataFrame(
        [("a", v) for v in range(1, 101)] + [("b", 10 * v) for v in range(1, 51)],
        "g string, v long",
    )
    sk = Q.hdr_sketch(df, "v", by=["g"], p=7)
    out = {(r["g"], r["q"]): r for r in
           Q.hdr_quantiles(sk, [0.5], by=["g"], p=7).collect()}
    assert out[("a", 0.5)]["est"] == 50 and out[("a", 0.5)]["n"] == 100
    # group b: values up to 500 leave the identity regime; bound holds
    assert 250 <= out[("b", 0.5)]["est"] <= 250 * (1 + 2.0**-7) + 1
    assert out[("b", 0.5)]["n"] == 50
