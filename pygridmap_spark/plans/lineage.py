"""Checkpoint-to-parquet with per-partition lineage + row-count/hash
metrics, and resumable restarts (north-star requirement: "all stages
checkpoint ... with per-partition lineage and row-count/hash metrics for
resumable restarts").

A stage checkpoint is:
- the stage output written as parquet partitioned by the stage's partition
  columns (Iceberg-shaped layout: partition dirs + a manifest),
- ``_lineage.json``: per-partition row counts + order-insensitive xxhash64
  value hashes (computed in the same pass via groupBy — one aggregate, no
  second scan), the stage name, inputs, and the engine version.

``checkpoint`` skips recompute when a valid manifest already exists
(restart = skip completed stages); ``verify_lineage`` recomputes the
per-partition metrics from the files and compares.
"""

from __future__ import annotations

import json
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygridmap_spark import __version__
from pygridmap_spark.core import fsio

MANIFEST = "_lineage.json"


def _partition_metrics(df: DataFrame, partition_cols: Sequence[str]) -> list[dict]:
    """Per-partition (or global when no partition cols) row count + an
    order-insensitive content hash: sum of xxhash64 over all columns."""
    # decimal(38) accumulator: order-insensitive sum that cannot overflow
    # under ANSI mode (Spark 4 default) at any realistic partition size
    hash_col = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    keys = [F.col(c) for c in partition_cols] if partition_cols else [F.lit(0).alias("_all")]
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(hash_col).alias("value_hash"),
    )
    out = []
    for r in agg.collect():
        d = r.asDict()
        part = {c: d.pop(c) for c in (partition_cols or ["_all"])}
        out.append({"partition": part, "rows": d["rows"], "value_hash": str(d["value_hash"])})
    return sorted(out, key=lambda m: json.dumps(m["partition"], sort_keys=True))


def checkpoint(
    df: DataFrame,
    path: str,
    stage: str,
    partition_cols: Sequence[str] = (),
    inputs: Sequence[str] = (),
    mode: str = "overwrite",
    force: bool = False,
) -> DataFrame:
    """Write df to ``path`` with a lineage manifest; if a manifest for the
    same stage already exists (and not ``force``), skip the write and
    return the checkpointed data — the resumable-restart path."""
    spark = df.sparkSession
    # sidecar I/O goes through the Hadoop FS API: checkpoints land on the
    # same filesystem as the data (s3://, hdfs://, file://)
    manifest_path = fsio.join(path, MANIFEST)
    if not force and fsio.exists(spark, manifest_path):
        manifest = json.loads(fsio.read_text(spark, manifest_path))
        # resume only when stage identity AND lineage inputs match — a
        # stale checkpoint of the same stage over different inputs must
        # recompute, not silently serve old data
        if (
            manifest.get("stage") == stage
            and manifest.get("complete")
            and manifest.get("inputs") == list(inputs)
            and manifest.get("partition_cols") == list(partition_cols)
        ):
            return spark.read.parquet(path)

    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)

    # metrics from the written files (what readers will actually see)
    written = spark.read.parquet(path)
    metrics = _partition_metrics(written, partition_cols)
    manifest = {
        "stage": stage,
        "engine_version": __version__,
        "inputs": list(inputs),
        "partition_cols": list(partition_cols),
        "n_partitions": len(metrics),
        "total_rows": sum(m["rows"] for m in metrics),
        "partitions": metrics,
        "complete": True,
    }
    fsio.write_text(spark, manifest_path, json.dumps(manifest, indent=2))
    return written


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when the Iceberg Spark runtime is on the classpath AND a
    catalog is configured. The engine's checkpoint layer maps 1:1 onto
    Iceberg concepts — manifest == snapshot summary, ``inputs``/``stage``
    == snapshot properties, partition metrics == partition-level
    ``files`` metadata — so the Iceberg path is a thin writeTo binding,
    not a redesign."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None


def checkpoint_table(
    df: DataFrame,
    table: str,
    stage: str,
    partition_cols: Sequence[str] = (),
    inputs: Sequence[str] = (),
    force: bool = False,
    catalog: str = "spark_catalog",
) -> DataFrame:
    """Iceberg-table form of :func:`checkpoint` (north star names Iceberg
    explicitly): write the stage output with ``writeTo(table)`` using the
    Iceberg source, record stage identity + lineage inputs as TABLE
    PROPERTIES, and resume by reading the table back when the recorded
    stage/inputs match — snapshot-based restart instead of the parquet
    manifest file. Per-partition row/hash metrics stay in a
    ``<stage>.lineage`` property (same JSON the parquet path writes).

    Requires the Iceberg Spark runtime (iceberg-spark-runtime jar + a
    configured catalog); this container ships none, so the capability is
    gated by :func:`iceberg_available` and exercised here only up to the
    clear-error contract (tested); the parquet path carries the
    functional coverage — identical manifest semantics, different
    storage binding."""
    spark = df.sparkSession
    if not iceberg_available(spark, catalog):
        raise RuntimeError(
            "Iceberg runtime not available: add iceberg-spark-runtime to "
            "spark.jars.packages and configure "
            f"spark.sql.catalog.{catalog}=org.apache.iceberg.spark.SparkCatalog "
            "(+ its warehouse); or use plans.lineage.checkpoint(path, ...) "
            "for the parquet-manifest form with identical resume semantics"
        )
    props = {
        "pygridmap.stage": stage,
        "pygridmap.inputs": json.dumps(list(inputs)),
        "pygridmap.partition_cols": json.dumps(list(partition_cols)),
    }
    if not force:
        try:
            existing = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
            }
            if all(existing.get(k) == v for k, v in props.items()) and existing.get(
                "pygridmap.complete"
            ) == "true":
                return spark.read.table(table)
        except Exception:
            pass  # table absent: fall through to the write
    writer = df.writeTo(table).using("iceberg")
    if partition_cols:
        # one call with every column: repeated partitionedBy calls REPLACE
        # the previous spec rather than appending
        writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
    writer.createOrReplace()
    written = spark.read.table(table)
    metrics = _partition_metrics(written, partition_cols)
    props["pygridmap.lineage"] = json.dumps(metrics)
    props["pygridmap.complete"] = "true"
    # '' -> SQL-escaped single quotes: string partition values (and hence
    # the lineage JSON) may contain them; an unescaped quote would fail the
    # ALTER AFTER the table write, leaving complete unset forever
    sets = ", ".join(
        "'{}'='{}'".format(k.replace("'", "''"), v.replace("'", "''"))
        for k, v in props.items()
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({sets})")
    return written


def read_manifest(path: str, spark: SparkSession | None = None) -> dict:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("read_manifest needs an active SparkSession")
    return json.loads(fsio.read_text(spark, fsio.join(path, MANIFEST)))


def verify_lineage(spark: SparkSession, path: str) -> dict:
    """Recompute metrics from the checkpoint files and diff against the
    manifest. Returns {'ok': bool, 'mismatches': [...]}."""
    manifest = read_manifest(path, spark)
    df = spark.read.parquet(path)
    current = _partition_metrics(df, manifest["partition_cols"])
    want = {json.dumps(m["partition"], sort_keys=True): m for m in manifest["partitions"]}
    got = {json.dumps(m["partition"], sort_keys=True): m for m in current}
    mismatches = []
    for key in set(want) | set(got):
        a, b = want.get(key), got.get(key)
        if a is None or b is None or a["rows"] != b["rows"] or a["value_hash"] != b["value_hash"]:
            mismatches.append({"partition": key, "expected": a, "actual": b})
    return {"ok": not mismatches, "mismatches": mismatches}
