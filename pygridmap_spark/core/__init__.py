"""Pure (no-Spark) kernels — grid/tile coordinate math and numpy geometry.

``crs`` and ``fsio`` (which import pyspark) are exposed lazily so that the
numpy-only kernels stay importable without a Spark install and Arrow
workers importing a kernel don't pay the pyspark import.
"""

from pygridmap_spark.core import bboxes, geometry, sphere, wkb

__all__ = ["bboxes", "crs", "fsio", "geometry", "sphere", "wkb"]


def __getattr__(name):
    if name in ("crs", "fsio"):
        import importlib

        return importlib.import_module(f"pygridmap_spark.core.{name}")
    raise AttributeError(f"module 'pygridmap_spark.core' has no attribute {name!r}")
