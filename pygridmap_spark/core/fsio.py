"""Cluster-filesystem-safe sidecar I/O.

Tile trees and lineage manifests carry small sidecar files (``info.json``,
``_lineage.json``) and need directory listings for bounds. Python's
``open``/``os.listdir`` only work on the driver's local disk; on a real
cluster the output folder is ``s3://`` / ``hdfs://`` / ``abfs://``. This
module routes those operations through the JVM Hadoop ``FileSystem`` API
(already on Spark's classpath, scheme-resolved per path), so
``write_tiles(df, "s3://bucket/tiles", ...)`` works unchanged. Local paths
resolve to ``file://`` and behave exactly as before.

These are driver-side metadata operations on tiny files — never data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # sidecars are tiny human-editable JSON: on the LOCAL filesystem skip
    # the .crc shadow files (a hand-edited manifest must read back, not
    # throw ChecksumException). FS instances are JVM-cached and shared, so
    # leave cluster filesystems' checksum behavior alone.
    if fs.getScheme() == "file":
        fs.setWriteChecksum(False)
        fs.setVerifyChecksum(False)
    return fs, hpath, jvm


def write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.exists(hpath))


def list_names(spark: SparkSession, folder: str) -> list[str]:
    """Child entry names (files and directories) of ``folder``."""
    fs, hpath, _ = _fs(spark, folder)
    if not fs.exists(hpath):
        return []
    return [status.getPath().getName() for status in fs.listStatus(hpath)]


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    fs.mkdirs(hpath)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, hsrc, jvm = _fs(spark, src)
    return bool(fs.rename(hsrc, jvm.org.apache.hadoop.fs.Path(dst)))


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.delete(hpath, recursive))


def join(folder: str, *names: str) -> str:
    """Scheme-agnostic path join (Hadoop paths always use '/')."""
    return "/".join([folder.rstrip("/"), *names])
