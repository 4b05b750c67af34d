"""Sources & sinks: synthetic pages/polygons generators, tiled writers,
WARC record parsing."""

from pygridmap_spark.sources import pages, polygons, sinks, warc

__all__ = ["pages", "polygons", "sinks", "warc"]
