"""Pure (no-Spark) kernels — grid/tile coordinate math and numpy geometry —
plus the CRS convention and the Hadoop-FS sidecar shim."""

from pygridmap_spark.core import bboxes, crs, fsio, geometry, wkb

__all__ = ["bboxes", "crs", "fsio", "geometry", "wkb"]
