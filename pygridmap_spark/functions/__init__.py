"""Catalyst column-expression library (JVM-side, whole-stage codegen).

Everything here is built from ``pyspark.sql.functions`` — no Python UDFs.
"""

from pygridmap_spark.functions import (
    cellindex,
    geodesy,
    geolocate,
    hexgrid,
    pii,
    reproject,
    s2,
    text,
    tiling,
    urls,
    vectors,
)

__all__ = [
    "cellindex",
    "geodesy",
    "geolocate",
    "hexgrid",
    "pii",
    "reproject",
    "s2",
    "text",
    "tiling",
    "urls",
    "vectors",
]
