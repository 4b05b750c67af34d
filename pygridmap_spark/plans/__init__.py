"""Engine-level plan utilities: checkpoint/lineage/metrics, skew tools."""

from pygridmap_spark.plans import lineage, skew

__all__ = ["lineage", "skew"]
