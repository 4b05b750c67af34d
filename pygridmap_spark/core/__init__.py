"""Pure (no-Spark) kernels: grid/tile coordinate math and numpy geometry."""

from pygridmap_spark.core import bboxes, geometry, wkb

__all__ = ["bboxes", "geometry", "wkb"]
