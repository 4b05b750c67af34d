"""Structured Streaming variant of the tiling pipeline."""

from pygridmap_spark.streaming import contacts, pipeline

__all__ = ["contacts", "pipeline"]
