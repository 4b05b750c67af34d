"""Engine operators: gridding, overlay, tiler, raster, kNN, dedup, ANN."""

from pygridmap_spark.operators import (
    dedup,
    frames,
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
    "frames",
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
