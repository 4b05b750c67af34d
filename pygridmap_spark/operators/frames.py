"""FrameProcessor analogs (SURVEY §2.2 P2/P3): the reference's parallel
frame map (`base.py:76-85` — np.array_split + mp.Pool + concat) and row
apply (`base.py:88-95`) ARE Spark primitives; these wrappers exist for API
parity and to keep user code Arrow-batched.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def frame_map(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
    """P2: apply an arbitrary DataFrame->DataFrame pandas function to every
    Arrow batch — the reference's FrameProcessor.__call__ without the
    pickle-per-chunk process pool."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = fn(batch)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_gen, schema)


def row_apply(df: DataFrame, fn: Callable[[pd.Series], object], out_col: str, out_type: str) -> DataFrame:
    """P3: per-row function lifted to a vectorized pandas UDF over Series
    batches (the reference chunks ``df.apply(fn, axis=1)``; here ``fn``
    receives the full row as a dict-like Series via a struct column)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(out_type)
    def _apply(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(fn, axis=1)

    return df.withColumn(out_col, _apply(F.struct(*df.columns)))


def grouped_apply(df: DataFrame, keys: list[str], fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
    """UDTF-shaped grouped map (N rows in, M rows out per group) — the
    per-tile frame functions of the reference's drivers."""
    return df.groupBy(*keys).applyInPandas(lambda _, pdf: fn(pdf), schema)
