"""util.grouped_rows_sorted — the per-BATCH-fee grouped reducer.

Contract pinned here: identical results to groupBy().applyInPandas for a
one-row-per-group reducer, including when a group straddles Arrow batch
boundaries (forced via spark.sql.execution.arrow.maxRecordsPerBatch=7)
and when the key column contains nulls (grouped together, as Spark's
groupBy does)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark import util


SCHEMA = "k string, n long, s double, mx double"


def _make_reduce_row():
    # defined via a factory so cloudpickle serializes it by VALUE — a
    # module-level function of a test module is pickled by reference and
    # the workers have no test_util_grouped on their path
    def _reduce_row(pdf):
        vals = pdf["v"].to_numpy()
        return {
            "k": pdf["k"].iloc[0],
            "n": len(pdf),
            "s": float(vals.sum()),
            "mx": float(vals.max()),
        }

    return _reduce_row


def _apply_twin(df):
    row_fn = _make_reduce_row()

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        row = row_fn(pdf)
        return pd.DataFrame({c: [row[c]] for c in ("k", "n", "s", "mx")})

    return df.groupBy("k").applyInPandas(_fn, SCHEMA)


def _collect_sorted(df):
    pdf = df.toPandas().sort_values("k", na_position="first").reset_index(drop=True)
    return pdf


@pytest.fixture()
def grouped_input(spark):
    # 40 groups x 1-60 rows: several groups are far larger than the forced
    # 7-row Arrow batch, so every batch boundary lands inside some group
    rows = []
    for g in range(40):
        for i in range(1 + (g * 7) % 60):
            rows.append((f"g{g:02d}", float(g * 1000 + i)))
    rows.append((None, 5.0))
    rows.append((None, 7.0))
    return spark.createDataFrame(rows, "k string, v double").repartition(5)


def test_matches_apply_in_pandas(spark, grouped_input):
    a = _collect_sorted(_apply_twin(grouped_input))
    b = _collect_sorted(
        util.grouped_rows_sorted(grouped_input, ["k"], _make_reduce_row(), SCHEMA)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a["n"].sum() == grouped_input.count()


def test_group_straddles_batch_boundary(spark, grouped_input):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        b = _collect_sorted(
            util.grouped_rows_sorted(grouped_input, ["k"], _make_reduce_row(), SCHEMA)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    a = _collect_sorted(_apply_twin(grouped_input))
    pd.testing.assert_frame_equal(a, b)


def test_multi_key_and_decimal_type_schema(spark):
    df = spark.createDataFrame(
        [(i % 3, f"s{i % 5}", float(i)) for i in range(200)],
        "a long, b string, v double",
    )

    def _fn(pdf: pd.DataFrame) -> dict:
        return {
            "a": pdf["a"].iloc[0],
            "b": pdf["b"].iloc[0],
            "s": float(pdf["v"].sum()),
        }

    # decimal(38,10) in the DDL exercises the comma-in-type parse path
    out = util.grouped_rows_sorted(
        df.withColumn("v", F.col("v").cast("decimal(38,10)").cast("double")),
        ["a", "b"], _fn, "a long, b string, s double",
    )
    got = out.toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    exp = (
        df.groupBy("a", "b").agg(F.sum("v").alias("s"))
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_int64_keys_above_2_53_with_nulls(spark):
    # Arrow-to-pandas coerces long-with-null to float64, where 2^53 and
    # 2^53 + 1 are the same number — the encoded (value, flag) pair must
    # keep them distinct groups and return the EXACT key values.
    big = 2**53
    rows = [(big, 10.0), (big, 20.0), (big + 1, 30.0), (None, 1.0), (None, 2.0)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(2)

    def _fn(pdf: pd.DataFrame) -> dict:
        return {
            "k": pdf["k"].iloc[0],
            "n": len(pdf),
            "s": float(pdf["v"].sum()),
        }

    # collect() keeps longs exact (toPandas would round both frames)
    got = {
        (r.k, r.n, r.s)
        for r in util.grouped_rows_sorted(df, ["k"], _fn, "k long, n long, s double").collect()
    }
    exp = {
        (r.k, r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == exp
    assert {k for k, _, _ in got if k is not None} == {big, big + 1}


def test_double_keys_nan_and_null_are_distinct_groups(spark):
    # Spark's groupBy normalizes NaN (all NaNs = ONE group) but keeps it
    # DISTINCT from the NULL group; the helper must aggregate them apart.
    # (The NaN group's EMITTED key arrives as NULL — pandas->Arrow output
    # conversion maps NaN to null — exactly as an applyInPandas reducer
    # emitting pdf["k"].iloc[0] does, so equality vs the twin holds.)
    nan = float("nan")
    rows = [(nan, 1.0), (nan, 2.0), (None, 10.0), (None, 20.0), (3.5, 100.0)]
    df = spark.createDataFrame(rows, "k double, v double").repartition(2)

    def _fn(pdf: pd.DataFrame) -> dict:
        return {
            "k": pdf["k"].iloc[0],
            "n": len(pdf),
            "s": float(pdf["v"].sum()),
        }

    got = util.grouped_rows_sorted(
        df, ["k"], _fn, "k double, n long, s double"
    ).collect()
    assert len(got) == 3
    assert {r.s for r in got} == {3.0, 30.0, 100.0}

    def _twin(pdf: pd.DataFrame) -> pd.DataFrame:
        row = _fn(pdf)
        return pd.DataFrame({c: [row[c]] for c in ("k", "n", "s")})

    twin = df.groupBy("k").applyInPandas(_twin, "k double, n long, s double").collect()
    key = lambda r: (r.s, r.n, None if r.k is None else r.k)  # noqa: E731
    assert sorted(map(key, got), key=str) == sorted(map(key, twin), key=str)


def test_empty_input(spark):
    df = spark.createDataFrame([], "k string, v double")
    out = util.grouped_rows_sorted(df, ["k"], _make_reduce_row(), SCHEMA)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "n", "s", "mx"]
