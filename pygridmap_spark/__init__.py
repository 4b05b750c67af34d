"""pygridmap_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the capabilities of eurostat/pygridmap (reference at
/root/reference: base.py, gridding.py, overlay.py, gridtiler.py,
gridtiler_raster.py) as idiomatic Spark DataFrame pipelines:

- grid/tile coordinate math as Catalyst column expressions (whole-stage
  codegen, no Python in the hot path),
- point-in-polygon and grid-overlay as two-phase joins (cheap cell-id
  equi-join prefilter + exact vectorized-numpy Arrow UDF on the boundary),
- tiled partitioned parquet sinks with an ``info.json`` metadata sidecar,
- multi-resolution roll-ups as re-keyed groupBy aggregations,
- kNN via cell-ring expansion with a broadcast brute-force fallback,
- raster<->vector aggregation over dense cell DataFrames,
- plus the large-scale training-data toolkit (dedup, ANN similarity,
  text quality, multimodal column plumbing).

Nothing here ports the reference's multiprocessing/pandas execution engine;
we reproduce *what* it computes with Spark-first plans.
"""

__version__ = "0.1.0"

from pygridmap_spark import (
    core,
    functions,
    operators,
    plans,
    session,
    sources,
    streaming,
    util,
)

__all__ = [
    "core",
    "functions",
    "operators",
    "plans",
    "session",
    "sources",
    "streaming",
    "util",
    "__version__",
]
