"""Skew handling: salted repartitioning on cell-id prefix + AQE hints.

Dense cells (popular hosts, urban geocodes) concentrate rows on few
(xt, yt) / cell_id keys. Two engine-level tools (north-star requirement):

- `salted_repartition`: spread each hot key over ``salt`` subpartitions by
  hashing a high-cardinality discriminator column (url) — used before
  per-tile heavy work so one tile never serializes a stage,
- `repartition_by_prefix`: repartition on a coarsened Morton prefix —
  locality-preserving balance (neighboring cells share shuffle targets),
- AQE skew-join splitting is enabled session-wide (session.get_spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex


def salted_repartition(
    df: DataFrame,
    keys: list[str],
    salt: int = 8,
    discriminator: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (keys..., salt) where salt is derived from a
    discriminator column (stable) or spark_partition_id (cheap)."""
    if discriminator:
        salt_col = F.pmod(F.xxhash64(F.col(discriminator)), F.lit(salt))
    else:
        salt_col = F.pmod(F.spark_partition_id(), F.lit(salt))
    out = df.withColumn("__salt__", salt_col)
    cols = [*keys, "__salt__"]
    out = out.repartition(num_partitions, *cols) if num_partitions else out.repartition(*cols)
    return out.drop("__salt__")


def repartition_by_prefix(
    df: DataFrame,
    code_col: str = "cell_id",
    levels_up: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by coarsened Morton prefix (locality-preserving).

    Works identically on S2 compact ids (``functions.s2``): their curve-
    position prefix IS the ancestor cell (``compact_parent`` is the same
    shiftright), so passing ``code_col="s2_compact"`` buckets by the
    level-(L - levels_up) spherical cell — near-equal-area by
    construction, i.e. no cos(lat) polar collapse in the bucket sizes."""
    prefix = cellindex.morton_prefix(F.col(code_col), levels_up).alias("__prefix__")
    out = df.withColumn("__prefix__", prefix)
    out = (
        out.repartition(num_partitions, "__prefix__")
        if num_partitions
        else out.repartition("__prefix__")
    )
    return out.drop("__prefix__")


def key_histogram(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Skew diagnostic: row count per key, heaviest first."""
    return df.groupBy(*keys).count().orderBy(F.col("count").desc()).limit(top)
