"""Small shared Spark-side helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def schema_with(df: DataFrame, *extra: str) -> str:
    """DDL schema string of ``df`` plus appended ``"name type"`` fields —
    the mapInPandas output-schema idiom used across the Arrow kernels
    (single definition so quoting/duplicate-name fixes land everywhere)."""
    base = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return ", ".join([base, *extra]) if extra else base
