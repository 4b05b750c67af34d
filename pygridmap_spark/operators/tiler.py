"""Tiler operators: grid_tiling (T1), grid_transformation (P1),
grid_aggregation (A5) — the reference gridtiler.py pipeline re-expressed as
one declarative Spark plan each.

Reference parity targets:
- grid_tiling:        gridtiler.py:33-171 (v1 semantics — the correct
  y_origin; v2's bug at :236 intentionally not reproduced)
- grid_transformation: gridtiler.py:306-346 (row fn, False drops the row)
- grid_aggregation:    gridtiler.py:357-453 + agg fns :460-534

Scale notes: tile assignment is pure projection (no shuffle); the write
shuffles once on (xt, yt) for file clustering; aggregation is one hash
aggregate with map-side partials. All arithmetic is whole-stage codegen.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import tiling as TF
from pygridmap_spark.sources import sinks


def grid_tiling(
    df: DataFrame,
    output_folder: str,
    resolution: float,
    tile_size_cell: int = 128,
    x_origin: float = 0.0,
    y_origin: float = 0.0,
    crs: str = "",
    format: str = "parquet",
    parquet_compression: str = "snappy",
    transform_fun: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    transform_schema: str | None = None,
    x: str = "x",
    y: str = "y",
) -> dict:
    """Tile a grid DataFrame into an (xt, yt) tree + info.json.

    The in-tile cell position overwrites the x/y columns as integers, same
    as the reference's output rows (gridtiler.py:111-118). Returns the
    info.json dict."""
    if transform_fun is not None:
        df = grid_transformation(df, transform_fun, transform_schema or df.schema)
    assigned = TF.with_tile_assignment(
        df, resolution, tile_size_cell, x_origin, y_origin, x=x, y=y
    )
    rest = [c for c in df.columns if c not in (x, y)]
    out = assigned.select(
        F.col("cx").alias(x),
        F.col("cy").alias(y),
        *rest,
        "xt",
        "yt",
    )
    return sinks.write_tiles(
        out,
        output_folder,
        resolution=resolution,
        tile_size_cell=tile_size_cell,
        x_origin=x_origin,
        y_origin=y_origin,
        crs=crs,
        format=format,
        parquet_compression=parquet_compression,
    )


def grid_transformation(
    df: DataFrame,
    fun: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Arbitrary per-batch transform with row dropping — the reference's
    per-row-dict fn (gridtiler.py:306-346) lifted to Arrow batches: ``fun``
    receives a pandas DataFrame and returns the transformed one (drop rows
    by filtering the batch; add/remove columns to match ``schema``)."""

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = fun(batch)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_apply, schema)


# --- aggregation rules (gridtiler.py:460-534) --------------------------------
# Each maps to a Spark aggregate over the value column; the cell count of a
# full aggregation block is a*a (average_2 divides by it, empty cells count).


def _agg_sum(col: Column, a: int) -> Column:
    return F.coalesce(F.sum(col), F.lit(0.0))


def _agg_average(col: Column, a: int) -> Column:
    # sum of non-null / count of ALL rows (reference divides by len(values))
    return F.coalesce(F.sum(col), F.lit(0.0)) / F.count(F.lit(1))


def _agg_average_2(col: Column, a: int) -> Column:
    return F.coalesce(F.sum(col), F.lit(0.0)) / F.lit(float(a * a))


def _agg_average_3(col: Column, a: int) -> Column:
    return F.avg(col)  # mean over non-null only; null when none


def _agg_single_value(col: Column, a: int) -> Column:
    return F.first(col)


AGG_FUNS: Mapping[str, Callable[[Column, int], Column]] = {
    "sum": _agg_sum,
    "average": _agg_average,
    "average_2": _agg_average_2,
    "average_3": _agg_average_3,
    "single_value": _agg_single_value,
}


def grid_aggregation(
    df: DataFrame,
    resolution: float,
    a: int,
    aggregation_fun: Mapping[str, str] | None = None,
    aggregation_rounding: int | None = 6,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Multi-resolution roll-up: coarsen (x, y) to ``a * resolution`` cells
    and aggregate every other column (default rule: sum).

    One shuffle (hash aggregate with map-side combine). Output x/y are the
    coarsened lower-left coordinates, reference formula R*floor(v/R)
    (gridtiler.py:392-393)."""
    aggregation_fun = dict(aggregation_fun or {})
    target = float(a) * float(resolution)
    xa, ya = TF.agg_cell_xy(F.col(x), F.col(y), target)
    value_cols = [c for c in df.columns if c not in (x, y)]
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("double", "float", "integer", "long", "short", "byte", "decimal")
    }
    aggs = []
    for c in value_cols:
        # numeric columns default to sum (the reference default); anything
        # else to single_value — summing a string column under Spark-4 ANSI
        # mode would throw at runtime (the reference's float() coercion
        # likewise fails on non-numeric values)
        rule = aggregation_fun.get(c, "sum" if c in numeric else "single_value")
        fn = AGG_FUNS[rule] if isinstance(rule, str) else rule
        expr = fn(F.col(c), a)
        # reference rounds only numeric aggregates (gridtiler.py:438-440)
        if aggregation_rounding is not None and c in numeric:
            expr = TF.round_to_tolerance(expr.cast("double"), aggregation_rounding)
        aggs.append(expr.alias(c))
    return (
        df.withColumns({"__xa__": xa, "__ya__": ya})
        .groupBy("__xa__", "__ya__")
        .agg(*aggs)
        .withColumnsRenamed({"__xa__": x, "__ya__": y})
    )
