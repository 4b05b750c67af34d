"""Engine operators: gridding, overlay, tiler, raster, kNN, dedup, ANN."""

from pygridmap_spark.operators import (
    dedup,
    gridding,
    knn,
    multimodal,
    overlay,
    raster,
    similarity,
    spatialjoin,
    textstats,
    tiler,
)

__all__ = [
    "dedup",
    "gridding",
    "knn",
    "multimodal",
    "overlay",
    "raster",
    "similarity",
    "spatialjoin",
    "textstats",
    "tiler",
]
