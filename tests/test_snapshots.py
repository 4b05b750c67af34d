"""Snapshot diff (operators/snapshots) pins.

The driver oracle (`snapshot_diff_docs`) hash-gates the diff against a
null-safe full-outer restatement in DuckDB; these pin the semantics:
insert/delete/update classification, unchanged filtering (and the
keep flag), NULL keys matching null-safely, NULL column values
fingerprinting via the sentinel (not colliding with the string
'null'), and multi-column keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygridmap_spark.operators import snapshots as SN


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


def test_insert_delete_update_unchanged(spark):
    old = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _snap(spark, [(2, "y", 20), (3, "Z", 30), (4, "w", 40)])
    got = {r.k: r.change_type for r in
           SN.snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}
    kept = {r.k: r.change_type for r in
            SN.snapshot_diff(old, new, ["k"], keep_unchanged=True).collect()}
    assert kept[2] == "unchanged" and len(kept) == 4


def test_null_key_matches_null_safely(spark):
    old = spark.createDataFrame([(None, "x")], "k string, a string")
    new = spark.createDataFrame([(None, "y")], "k string, a string")
    [r] = SN.snapshot_diff(old, new, ["k"]).collect()
    assert r.change_type == "update" and r.k is None


def test_null_value_vs_literal_null_string_differ(spark):
    old = spark.createDataFrame([(1, None)], "k long, a string")
    new = spark.createDataFrame([(1, "null")], "k long, a string")
    [r] = SN.snapshot_diff(old, new, ["k"]).collect()
    assert r.change_type == "update"  # sentinel != the string 'null'


def test_multi_column_key_and_subset_compare(spark):
    old = spark.createDataFrame(
        [(1, "a", 5, 100)], "k1 long, k2 string, v long, noise long"
    )
    new = spark.createDataFrame(
        [(1, "a", 5, 999)], "k1 long, k2 string, v long, noise long"
    )
    # comparing only v: the noise change is invisible
    assert SN.snapshot_diff(old, new, ["k1", "k2"], ["v"]).count() == 0
    [r] = SN.snapshot_diff(old, new, ["k1", "k2"]).collect()
    assert r.change_type == "update"


def test_fingerprints_null_on_missing_side(spark):
    old = _snap(spark, [(1, "x", 1)])
    new = _snap(spark, [(2, "y", 2)])
    got = {r.k: r for r in SN.snapshot_diff(old, new, ["k"]).collect()}
    assert got[1].change_type == "delete" and got[1].new_fp is None
    assert got[2].change_type == "insert" and got[2].old_fp is None
    assert got[1].old_fp is not None and got[2].new_fp is not None
