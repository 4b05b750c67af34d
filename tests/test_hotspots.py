"""Grid-cell hotspot clustering (operators/hotspots) — semantics pins.

The driver oracle (`grid_hotspots`) hash-gates the full labeling on real
data; these tests pin the contract edges on hand-built fixtures: 8-neighbor
(diagonal) adjacency, antimeridian wrap, pole non-wrap, noise (sub-min
cells) dropped, NULL/NaN coordinates dropped, singleton cores labeled by
their own cell_id, and the stats rollup.
"""

from pygridmap_spark.functions.cellindex import py_morton
from pygridmap_spark.operators import hotspots as HS

Z = 3  # 8x8 grid: lon pitch 45 deg, lat pitch 22.5 deg
N = 1 << Z


def _center(ix: int, iy: int) -> tuple[float, float]:
    """(lon, lat) of the center of cell (ix, iy) at zoom Z."""
    return (
        -180.0 + (ix + 0.5) * 360.0 / N,
        -90.0 + (iy + 0.5) * 180.0 / N,
    )


def _points(spark, cells, copies=1):
    """DataFrame with `copies` points at the center of each (ix, iy)."""
    rows = []
    for ix, iy in cells:
        lon, lat = _center(ix, iy)
        rows += [(lon, lat)] * copies
    return spark.createDataFrame(rows, "lon double, lat double")


def _labels(df):
    return {
        (r["cell_ix"], r["cell_iy"]): r["cluster_id"]
        for r in df.collect()
    }


def test_diagonal_adjacency_single_cluster(spark):
    # (2,2) and (3,3) touch only diagonally -> one cluster (8-neighbor)
    pts = _points(spark, [(2, 2), (3, 3)], copies=2)
    lab = _labels(HS.hotspot_cells(pts, Z, min_points=2))
    assert len(lab) == 2
    assert lab[(2, 2)] == lab[(3, 3)] == py_morton(2, 2)


def test_gap_of_two_stays_separate(spark):
    pts = _points(spark, [(1, 1), (4, 1)], copies=2)
    lab = _labels(HS.hotspot_cells(pts, Z, min_points=2))
    assert lab[(1, 1)] != lab[(4, 1)]
    assert lab[(1, 1)] == py_morton(1, 1)
    assert lab[(4, 1)] == py_morton(4, 1)


def test_antimeridian_wrap_joins_east_west(spark):
    # ix=0 and ix=N-1 are lon neighbors across the antimeridian
    pts = _points(spark, [(0, 4), (N - 1, 4)], copies=2)
    lab = _labels(HS.hotspot_cells(pts, Z, min_points=2))
    assert lab[(0, 4)] == lab[(N - 1, 4)] == min(py_morton(0, 4), py_morton(N - 1, 4))


def test_pole_rows_do_not_wrap(spark):
    # iy=0 and iy=N-1 are the pole rows: no vertical wrap, so two clusters
    pts = _points(spark, [(3, 0), (3, N - 1)], copies=2)
    lab = _labels(HS.hotspot_cells(pts, Z, min_points=2))
    assert lab[(3, 0)] != lab[(3, N - 1)]


def test_noise_cells_dropped(spark):
    # one 1-point cell below min_points=2 vanishes entirely
    pts = _points(spark, [(2, 2)], copies=2).unionByName(
        _points(spark, [(5, 5)], copies=1)
    )
    out = HS.hotspot_cells(pts, Z, min_points=2)
    lab = _labels(out)
    assert set(lab) == {(2, 2)}
    # and the surviving core carries its exact count
    assert out.collect()[0]["n_points"] == 2


def test_null_and_nan_coords_drop(spark):
    pts = _points(spark, [(2, 2)], copies=3).unionByName(
        spark.createDataFrame(
            [(None, 10.0), (10.0, None), (float("nan"), 10.0)],
            "lon double, lat double",
        )
    )
    out = HS.hotspot_cells(pts, Z, min_points=1)
    lab = _labels(out)
    # the 3 bad rows can neither form a core cell nor join one
    assert set(lab) == {(2, 2)}
    assert out.collect()[0]["n_points"] == 3


def test_singleton_core_is_its_own_cluster(spark):
    pts = _points(spark, [(6, 2)], copies=5)
    row = HS.hotspot_cells(pts, Z, min_points=2).collect()[0]
    assert row["cluster_id"] == row["cell_id"] == py_morton(6, 2)


def test_stats_rollup(spark):
    # L-shaped 3-cell cluster (10 pts) + far singleton (4 pts)
    pts = (
        _points(spark, [(2, 2)], copies=4)
        .unionByName(_points(spark, [(2, 3)], copies=3))
        .unionByName(_points(spark, [(3, 3)], copies=3))
        .unionByName(_points(spark, [(6, 6)], copies=4))
    )
    stats = {
        r["cluster_id"]: (r["n_cells"], r["n_points"])
        for r in HS.hotspot_stats(pts, Z, min_points=2).collect()
    }
    big = min(py_morton(2, 2), py_morton(2, 3), py_morton(3, 3))
    assert stats[big] == (3, 10)
    assert stats[py_morton(6, 6)] == (1, 4)


def test_chain_transitivity(spark):
    # a 5-cell horizontal chain labels everything with the leftmost id
    chain = [(i, 4) for i in range(1, 6)]
    lab = _labels(HS.hotspot_cells(_points(spark, chain, 2), Z, min_points=2))
    want = min(py_morton(i, 4) for i in range(1, 6))
    assert all(lab[c] == want for c in chain)


def _label_with_blocks(spark, cells, block_bits):
    """label_cells on a hand-built core-cell frame with a forced block
    size (block_bits < Z exercises the cross-block merge path)."""
    rows = [(ix, iy, py_morton(ix, iy), 1) for ix, iy in cells]
    df = spark.createDataFrame(
        rows, "cell_ix long, cell_iy long, cell_id long, n_points long"
    )
    return {
        (r["cell_ix"], r["cell_iy"]): r["cluster_id"]
        for r in HS.label_cells(df, Z, block_bits=block_bits).collect()
    }


def test_multiblock_chain_crosses_block_borders(spark):
    # 2x2-cell blocks (block_bits=1): a full-width horizontal chain spans
    # 4 blocks and must still collapse to the leftmost id
    chain = [(i, 4) for i in range(N)]
    lab = _label_with_blocks(spark, chain, block_bits=1)
    want = min(py_morton(i, 4) for i in range(N))
    assert all(lab[c] == want for c in chain)


def test_multiblock_antimeridian_wrap(spark):
    # wrap adjacency is always a cross-block edge when blocks < grid
    lab = _label_with_blocks(spark, [(0, 4), (N - 1, 4)], block_bits=1)
    assert lab[(0, 4)] == lab[(N - 1, 4)] == min(py_morton(0, 4), py_morton(N - 1, 4))


def test_multiblock_parity_random_field(spark):
    # every occupancy pattern labels identically at block_bits 1, 2 and
    # the single-block default (deterministic LCG field, ~half occupied)
    cells = [
        (ix, iy)
        for ix in range(N)
        for iy in range(N)
        if (ix * 7 + iy * 13 + (ix * ix + iy * iy * 3) // 2) % 3 != 0
    ]
    want = _label_with_blocks(spark, cells, block_bits=Z)
    for bb in (1, 2):
        assert _label_with_blocks(spark, cells, bb) == want
    # and the diagonal-adjacency convention holds: (0,0)&(1,1) together
    assert len(set(want.values())) < len(want)
