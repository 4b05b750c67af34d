"""M0 goldens: coordinate math pinned against the reference formulas.

Expected values computed by hand from the formulas at
base.py:271-344, 347-388 and gridtiler.py:101-112 (v1 semantics).
"""

import math

import pytest

from pygridmap_spark.core import bboxes as B


def test_get_grid_shape():
    # base.ipynb cell 17 uses a 500x501 bbox with 75x75 cells
    assert B.get_grid_shape([75, 75], [0, 0, 501, 500]) == [7, 7]
    assert B.get_grid_shape([10, 20], [0, 0, 100, 100]) == [10, 5]
    assert B.get_grid_shape([10, 20], [0, 0, 101, 101], buffer=[0, 0]) == [11, 6]


def test_set_tile_shape():
    assert B.set_tile_shape(16) == [4, 4]
    nr, nc = B.set_tile_shape(8)
    assert nr * nc >= 8
    # aspect-ratio path pinned to the reference formula (base.py:282-294):
    # n=sqrt(8), ratio=4 -> nf=0, nc=12 -> nf*nc<8 -> [nf+1, nc] = [1, 12]
    assert B.set_tile_shape(8, gridshape=[100, 25]) == [1, 12]


def test_get_tile_shape_and_size():
    bbox = [0, 0, 1000, 600]
    # 10x10 cells -> 60 rows x 100 cols; tiles of 32x32 cells -> 2x4 tiles
    assert B.get_tile_shape([10, 10], [32, 32], bbox) == [2, 4]
    # inverse: 2x4 tiles over the 60x100 grid -> 30x25-cell tiles
    assert B.get_tile_size([10, 10], [2, 4], bbox) == [30, 25]


def test_get_tile_bbox_crop():
    bbox = [0, 0, 1000, 600]
    # last column tile cropped at the cell-aligned grid edge
    tb = B.get_tile_bbox([1, 3], [10, 10], [32, 32], bbox, crop=True)
    assert tb == [960, 320, 1000, 600]
    tb = B.get_tile_bbox([0, 0], [10, 10], [32, 32], bbox, crop=False)
    assert tb == [0, 0, 320, 320]


def test_get_pos_location_anchors():
    rows, cols = B.get_pos_location([75, 75], [0, 0, 501, 500], xypos="LLc", yreverse=False)
    assert cols == [0 + 75 * i for i in range(7)]
    assert rows == [0 + 75 * i for i in range(7)]
    rows_r, _ = B.get_pos_location([75, 75], [0, 0, 501, 500], xypos="LLc", yreverse=True)
    assert rows_r == list(reversed(rows))
    rows_c, cols_c = B.get_pos_location([10, 10], [0, 0, 100, 100], xypos="CC", yreverse=False)
    assert cols_c[0] == 5 and rows_c[0] == 5
    with pytest.raises(ValueError):
        B.get_pos_location([10, 10], [0, 0, 1, 1], xypos="nope")


def test_build_from_pos_order_cols_outer():
    cells = B.build_from_pos([10, 10], [0, 10], [0, 10])
    # cols outer, rows inner (base.py:387)
    assert cells[0][:2] == [0, 0]
    assert cells[1][:2] == [0, 10]
    assert cells[2][:2] == [10, 0]
    assert all(c[2] - c[0] == 10 and c[3] - c[1] == 10 for c in cells)


def test_tile_assign_v1_goldens():
    # resolution=1000, tile_size_cell=128 -> tile_size_m = 128000
    assert B.tile_assign(0, 0, 1000) == (0, 0, 0, 0)
    assert B.tile_assign(127_999.0, 127_999.0, 1000) == (0, 0, 127, 127)
    assert B.tile_assign(128_000.0, 0.0, 1000) == (1, 0, 0, 0)
    # negative coordinates floor toward -inf
    assert B.tile_assign(-1.0, -1.0, 1000) == (-1, -1, 127, 127)
    assert B.tile_assign(-128_000.0, 0.0, 1000) == (-1, 0, 0, 0)
    # non-zero origin
    assert B.tile_assign(10_000.0, 5_000.0, 1000, x_origin=10_000.0, y_origin=5_000.0) == (0, 0, 0, 0)
    # y uses y_origin (v1 semantics; v2 bug at gridtiler.py:236 NOT reproduced)
    xt, yt, cx, cy = B.tile_assign(0.0, 130_000.0, 1000, x_origin=999_999.0, y_origin=0.0)
    assert (yt, cy) == (1, 2)


def test_agg_cell_assign():
    assert B.agg_cell_assign(4500, 7999, 4000) == (4000, 4000)
    assert B.agg_cell_assign(-1, -1, 4000) == (-4000, -4000)


def test_align_bbox_snaps_to_cell_multiples():
    out = B.align_bbox([10, 10], [0, 0, 95, 95])
    assert out == [0, 0, 100, 100]
    # exact multiples stay (within TOL_EPS)
    assert B.align_bbox([10, 10], [0, 0, 100, 100]) == [0, 0, 100, 100]


def test_tile_assign_matches_floor_formula_randomized():
    import random

    rng = random.Random(42)
    for _ in range(500):
        x = rng.uniform(-5e6, 5e6)
        y = rng.uniform(-5e6, 5e6)
        res = rng.choice([100.0, 250.0, 1000.0])
        ts = rng.choice([64, 128, 256])
        x0 = rng.choice([0.0, -1e6, 4321.0])
        y0 = rng.choice([0.0, -2e6, 1234.0])
        xt, yt, cx, cy = B.tile_assign(x, y, res, ts, x0, y0)
        assert xt == math.floor((x - x0) / (res * ts))
        assert yt == math.floor((y - y0) / (res * ts))
        assert 0 <= cx <= ts - 1
        assert 0 <= cy <= ts - 1
