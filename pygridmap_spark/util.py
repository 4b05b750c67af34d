"""Small shared Spark-side helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def schema_with(df: DataFrame, *extra: str) -> str:
    """DDL schema string of ``df`` plus appended ``"name type"`` fields —
    the mapInPandas output-schema idiom used across the Arrow kernels
    (single definition so quoting/duplicate-name fixes land everywhere)."""
    base = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return ", ".join([base, *extra]) if extra else base


def box_wkb_udf():
    """Pandas UDF encoding rect corners (x, y, xmax, ymax) as WKB polygon
    boxes — the single cell-geometry encoder shared by gridding._finalize
    and the overlay emit_wkb paths. Defined WITHOUT type hints and with an
    explicit SCALAR functionType: this module uses ``from __future__ import
    annotations``, which turns hints into strings pandas_udf may fail to
    resolve (CLAUDE.md gotcha)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from pygridmap_spark.core import wkb

    def _box(x, y, x1, y1):
        return pd.Series(
            [wkb.encode_box(a, b, c, d) for a, b, c, d in zip(x, y, x1, y1)],
            dtype=object,
        )

    return pandas_udf(_box, returnType=BinaryType(), functionType=200)
