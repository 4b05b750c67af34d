"""Exact top-fraction selection: equivalence with the naive full window,
degenerate distributions, frac edges, NULL/NaN dropping, and the
threshold-bucket-only window claim."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pygridmap_spark.operators import selection as SEL


def _corpus(spark, n=400, groups=("en", "de", "fr")):
    # deterministic, collision-heavy scores (mod 37) so ties are real
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(g) for g in groups]),
            (F.col("id") % len(groups) + 1).cast("int"),
        ).alias("lang"),
        ((F.col("id") * 7919 % 37).cast("double") / 37.0).alias("quality"),
    )


def _naive(df, frac, by="lang", score="quality", idc="doc_id"):
    w = Window.partitionBy(by).orderBy(F.col(score).desc(), F.col(idc).asc())
    n = Window.partitionBy(by)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .withColumn("__k__", F.ceil(F.count(F.lit(1)).over(n) * F.lit(frac)))
        .filter(F.col("__rn__") <= F.col("__k__"))
        .drop("__rn__", "__k__")
    )


@pytest.mark.parametrize("frac", [0.1, 0.5, 0.83])
@pytest.mark.parametrize("buckets", [4, 512])
def test_matches_naive_window(spark, frac, buckets):
    df = _corpus(spark)
    got = sorted(
        (r.lang, r.doc_id)
        for r in SEL.topfrac_by_group(df, frac, buckets=buckets).collect()
    )
    want = sorted((r.lang, r.doc_id) for r in _naive(df, frac).collect())
    assert got == want


def test_all_equal_scores_degenerate(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit(0.5).alias("quality"),
    )
    out = SEL.topfrac_by_group(df, 0.3).collect()
    # ties broken by doc_id asc: the 30 smallest ids survive
    assert sorted(r.doc_id for r in out) == list(range(30))


def test_frac_edges(spark):
    df = _corpus(spark, n=90)
    assert SEL.topfrac_by_group(df, 0.0).count() == 0
    assert SEL.topfrac_by_group(df, 1.0).count() == 90
    with pytest.raises(ValueError):
        SEL.topfrac_by_group(df, 1.5)


def test_null_and_nan_dropped(spark):
    df = spark.createDataFrame(
        [(0, "en", 0.9), (1, "en", None), (2, "en", float("nan")),
         (3, "en", 0.1), (4, "en", 0.5)],
        "doc_id long, lang string, quality double",
    )
    out = SEL.topfrac_by_group(df, 0.67)
    # 3 clean rows, k = ceil(2.01) = 3... ceil(0.67*3)=ceil(2.01)=3 keeps all
    assert sorted(r.doc_id for r in out.collect()) == [0, 3, 4]
    out2 = SEL.topfrac_by_group(df, 0.34)
    # k = ceil(1.02) = 2 -> top two scores 0.9, 0.5
    assert sorted(r.doc_id for r in out2.collect()) == [0, 4]


def test_per_group_counts(spark):
    df = _corpus(spark, n=300)
    out = SEL.topfrac_by_group(df, 0.25)
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    base = {r.lang: r["count"] for r in df.groupBy("lang").count().collect()}
    assert got == {g: math.ceil(0.25 * n) for g, n in base.items()}


def test_output_columns_clean(spark):
    out = SEL.topfrac_by_group(_corpus(spark), 0.5)
    assert set(out.columns) == {"doc_id", "lang", "quality"}


def test_null_group_key_kept(spark):
    # NULL lang is its own group, exactly like the naive window treats it
    df = spark.createDataFrame(
        [(0, None, 0.9), (1, None, 0.5), (2, None, 0.1),
         (3, "en", 0.8), (4, "en", 0.2)],
        "doc_id long, lang string, quality double",
    )
    got = sorted(
        ((r.lang, r.doc_id)
         for r in SEL.topfrac_by_group(df, 0.5).collect()),
        key=lambda p: (p[0] or "", p[1]),
    )
    want = sorted(
        ((r.lang, r.doc_id) for r in _naive(df, 0.5).collect()),
        key=lambda p: (p[0] or "", p[1]),
    )
    # ceil(0.5*3)=2 of the NULL group, ceil(0.5*2)=1 of en
    assert got == want == [(None, 0), (None, 1), ("en", 3)]
