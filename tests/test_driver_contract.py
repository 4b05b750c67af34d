"""Driver-contract gate: run every __spark_entry__ query and compare with
its DuckDB oracle on the same parquet tables — the same check the external
driver performs (row count + column names + order-insensitive values).

Runs at sf0.001 by default (SPARK_GRAFT_TEST_SF_DIR to override).
"""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the kind the driver's type-sensitive hash
    distinguishes: integer vs floating vs boolean vs everything-else."""
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    return "object"


def _compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    """Driver-faithful compare: the external driver hash-matches TYPED
    values (round-5 lesson: bit-identical ints vs DuckDB HUGEINT->float64
    came back hash-red), so this gate asserts dtype-kind agreement per
    column and BIT equality — no np.isclose tolerance."""
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        ka, kb = _dtype_kind(a[col]), _dtype_kind(b[col])
        assert ka == kb, (
            f"{name}.{col}: dtype kind {ka} ({a[col].dtype}) vs {kb} ({b[col].dtype})"
            " — the driver's typed hash would fail"
        )
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if ka == "float":
            av = np.asarray(av, dtype=np.float64)
            bv = np.asarray(bv, dtype=np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            assert eq.all(), (
                f"{name}.{col}: {len(av) - int(eq.sum())} bit-diffs, first "
                f"{[(x, y) for x, y in zip(av[~eq][:5], bv[~eq][:5])]}"
            )
        else:
            eq = av == bv
            # object columns may hold None on one side, NaN on the other
            if ka == "object":
                eq = eq | (pd.isna(a[col]).to_numpy() & pd.isna(b[col]).to_numpy())
            assert eq.all(), f"{name}.{col}: {av[~eq][:5]} vs {bv[~eq][:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"xt", "yt", "n_docs", "text_bytes", "n_cells"}


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = duck.sql(ORACLES[name]).df()
    _compare(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs and has a stable schema
    assert len(df.columns) > 0
