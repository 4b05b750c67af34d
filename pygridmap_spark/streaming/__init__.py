"""Structured Streaming variant of the tiling pipeline."""

from pygridmap_spark.streaming import pipeline

__all__ = ["pipeline"]
