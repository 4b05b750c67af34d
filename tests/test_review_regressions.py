"""Regression tests for the round-1 adversarial-review findings — each
test pins a specific bug that was found and fixed."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.core import geometry as G
from pygridmap_spark.core import wkb
from pygridmap_spark.operators import dedup as DD
from pygridmap_spark.operators import gridding as GR
from pygridmap_spark.operators import overlay as OV
from pygridmap_spark.sources import polygons as PG


def test_overlapping_mask_rows_do_not_overcount(spark):
    """Two overlapping mask rows each covering ~60% of a cell must NOT sum
    to 'fully within' (reference OR-per-geometry, gridding.py:180-182)."""
    pdf = pd.DataFrame(
        {
            "poly_id": [0, 1],
            "geometry": [
                wkb.encode_box(0.0, 0.0, 6_000.0, 10_000.0),     # left 60%
                wkb.encode_box(4_000.0, 0.0, 10_000.0, 10_000.0), # right 60%
            ],
        }
    )
    mask = spark.createDataFrame(pdf)
    out = GR.grid_maker(
        spark, mask=mask, cell=(10_000.0, 10_000.0), bbox=(0.0, 0.0, 10_000.0, 10_000.0), trim=False
    ).collect()
    assert len(out) == 1
    # jointly the rows cover 100% of the cell, but no single row does
    assert out[0]["__intersects__"] is True
    assert out[0]["__within__"] is False


def test_overlay_intersection_keeps_cells_with_null_attrs(spark):
    """A cell overlapping only NULL-valued rows still overlaps: it must
    survive how='intersection' (match keyed on pieces, not attr nullness)."""
    grid = PG.grid_layer(spark, (0.0, 0.0, 20_000.0, 20_000.0), (10_000.0, 10_000.0))
    other = PG.grid_layer(spark, (0.0, 0.0, 20_000.0, 20_000.0), (10_000.0, 10_000.0)).withColumn(
        "val", F.when(F.col("cell_id") == 0, F.lit(None).cast("double")).otherwise(F.col("val"))
    )
    out = OV.grid_overlay_rects(grid, other, ["val"], rule="sum", how="intersection")
    rows = {r["cell_id"]: r["val"] for r in out.collect()}
    assert len(rows) == 4  # all cells overlap, incl. the null-attr one
    assert rows[0] is None
    assert "__n_pieces__" not in out.columns
    # union path also drops the internal marker
    uni = OV.grid_overlay_rects(grid, other, ["val"], rule="sum", how="union")
    assert "__n_pieces__" not in uni.columns


def test_connected_components_long_chain(spark):
    """26-node transitive chain converges (pointer jumping, O(log d))."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["component_id"] for r in DD.connected_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 26


def test_connected_components_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(25)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError):
        DD.connected_components(pairs, max_iter=1)


def test_minhash_bands_validation(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError):
        DD.minhash_lsh_pairs(df, num_hashes=16, bands=32)
    with pytest.raises(ValueError):
        DD.minhash_lsh_pairs(df, num_hashes=64, bands=24)


def test_qtree_disjoint_mask_returns_empty(spark):
    pdf = pd.DataFrame({"poly_id": [0], "geometry": [wkb.encode_box(1e6, 1e6, 2e6, 2e6)]})
    mask = spark.createDataFrame(pdf)
    out = GR.grid_maker(
        spark, mask=mask, cell=(10_000.0, 10_000.0), bbox=(0.0, 0.0, 100_000.0, 100_000.0),
        trim=True, mode="qtree",
    )
    assert out.count() == 0
    assert "cell_id" in out.columns  # schema intact


def test_unclosed_ring_pip_matches_closed():
    closed = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    unclosed = closed[:-1]
    px = np.array([5.0, 15.0, 0.5])
    py = np.array([5.0, 5.0, 9.5])
    a = G.points_in_polygon(px, py, [closed])
    b = G.points_in_polygon(px, py, [unclosed])
    assert a.tolist() == b.tolist() == [True, False, True]


def test_empty_multipolygon_rows_are_skipped(spark):
    """MULTIPOLYGON EMPTY rows (valid WKB) must not crash joins/overlays."""
    import struct

    empty_mp = struct.pack("<BII", 1, 6, 0)  # little-endian, type 6, 0 parts
    pdf = pd.DataFrame(
        {
            "poly_id": [0, 1],
            "geometry": [wkb.encode_box(0.0, 0.0, 50_000.0, 50_000.0), empty_mp],
            "pop": [10.0, 20.0],
        }
    )
    polys = spark.createDataFrame(pdf)
    grid = PG.grid_layer(spark, (0.0, 0.0, 100_000.0, 100_000.0), (50_000.0, 50_000.0))
    out = OV.grid_overlay_polygons(spark, grid, polys, ["pop"], rule=None).collect()
    assert {r["poly_id"] for r in out} == {0}
    out2 = OV.grid_overlay_polygons_distributed(grid, polys, ["pop"], rule=None).collect()
    assert {r["poly_id"] for r in out2} == {0}
    with pytest.raises(ValueError):
        G.multipolygon_bbox([])


def test_overlay_custom_poly_key_and_rule_max(spark):
    """poly_key forwarding: non-default key name works through every rule
    path in both polygon variants."""
    pdf = pd.DataFrame(
        {
            "region_code": [7, 9],
            "geometry": [
                wkb.encode_box(0.0, 0.0, 60_000.0, 100_000.0),
                wkb.encode_box(40_000.0, 0.0, 100_000.0, 100_000.0),
            ],
            "pop": [10.0, 20.0],
        }
    )
    polys = spark.createDataFrame(pdf)
    grid = PG.grid_layer(spark, (0.0, 0.0, 100_000.0, 100_000.0), (50_000.0, 50_000.0))
    for fn in (
        lambda: OV.grid_overlay_polygons(
            spark, grid, polys, ["pop"], rule="max", area=True, poly_key="region_code"
        ),
        lambda: OV.grid_overlay_polygons_distributed(
            grid, polys, ["pop"], rule="list", poly_key="region_code"
        ),
    ):
        out = fn().collect()
        assert len(out) > 0
