"""Sources & sinks: synthetic pages/polygons generators, tiled writers."""

from pygridmap_spark.sources import pages, polygons, sinks

__all__ = ["pages", "polygons", "sinks"]
