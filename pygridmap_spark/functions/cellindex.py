"""Discrete global grid cell index — the engine's H3/S2-analog partition key.

No native H3/S2 library ships in this container, so the index is a pure-math
quadtree cell id over equirectangular lon/lat (the same regular-grid family
as the reference's square cells, gridtiler.py:101-112), in two encodings:

- ``(cell_ix, cell_iy)`` integer axis indices at zoom ``z`` (0..2^z-1),
- Morton / Z-order interleave (``cell_morton``) — the spatial-locality
  partition + sort key (classic bit-spreading, public-domain technique),
- quadkey string (Bing-tile-style base-4 of the Morton code) for humans.

All of it is Catalyst bitwise arithmetic: shiftleft/and/or — whole-stage
codegen, zero Python. The Morton prefix (``morton >> 2k``) is the salting /
skew-bucketing key: all SURVEY §2.11 skew handling hangs off it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 62-bit morton (31 bits/axis): 2^31 cells/axis is ~2 cm at the equator —
# finer than any practical discrete global index. z=32 would push iy's top
# spread bit into the SIGN bit of Spark's long, breaking Z-order
# monotonicity for range partitioning / clustered writes and the base-4
# quadkey conversion, so 31 is the honest 64-bit bound.
MAX_Z = 31


def lonlat_to_cell_xy(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """Equirectangular cell indices at zoom z, clamped to [0, 2^z - 1]."""
    if not 0 < z <= MAX_Z:
        raise ValueError(
            f"z must be in (0, {MAX_Z}]: the Morton bit-spreading masks to 31"
            " bits/axis and the code must stay non-negative in a signed long"
        )
    n = 1 << z
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long")
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))).cast("long")
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit(n - 1)))  # noqa: E731
    return clamp(ix), clamp(iy)


def _spread_bits(v: Column) -> Column:
    """Interleave zeros between the low 32 bits (x -> x<<? magic masks).

    Standard 64-bit Morton bit-spreading: 6 shift/mask stages, each a JVM
    bitwise expression (all masks positive in a signed long)."""
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def morton(ix: Column, iy: Column) -> Column:
    """Z-order code from cell indices (<= 31 bits each)."""
    return _spread_bits(ix).bitwiseOR(F.shiftleft(_spread_bits(iy), 1))


def cell_id(lon: Column, lat: Column, z: int) -> Column:
    """Morton cell id at zoom z — the engine's 'h3'-role column."""
    ix, iy = lonlat_to_cell_xy(lon, lat, z)
    return morton(ix, iy)


def quadkey(lon: Column, lat: Column, z: int) -> Column:
    """Base-4 quadkey string of length z (Bing-tile convention on the
    equirectangular grid; y NOT flipped — our grid is south-up like the
    reference's lower-left-corner cells)."""
    return F.lpad(F.conv(cell_id(lon, lat, z).cast("string"), 10, 4), z, "0")


def morton_prefix(code: Column, levels_up: int) -> Column:
    """Coarsen a Morton code by k levels — the salt/skew bucketing key."""
    return F.shiftright(code, 2 * levels_up)


def with_cell_index(df, z: int, lon: str = "lon", lat: str = "lat"):
    """Append (cell_ix, cell_iy, cell_id) at zoom z."""
    ix, iy = lonlat_to_cell_xy(F.col(lon), F.col(lat), z)
    return df.withColumns({"cell_ix": ix, "cell_iy": iy, "cell_id": morton(ix, iy)})


def ring_offsets(radius: int) -> list[tuple[int, int]]:
    """(dx, dy) offsets of the square ring at exactly ``radius`` — driver-side
    constant for the kNN cell-ring expansion (SURVEY §2.11)."""
    if radius == 0:
        return [(0, 0)]
    out = []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            if max(abs(dx), abs(dy)) == radius:
                out.append((dx, dy))
    return out


def disk_offsets(radius: int) -> list[tuple[int, int]]:
    """All offsets with Chebyshev distance <= radius (filled disk)."""
    return [
        (dx, dy)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ]


# --- Python twins for tests --------------------------------------------------


def py_cell_xy(lon: float, lat: float, z: int) -> tuple[int, int]:
    import math

    n = 1 << z
    ix = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    iy = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    return ix, iy


def py_morton(ix: int, iy: int) -> int:
    def spread(v: int) -> int:
        v &= 0xFFFFFFFF
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    return spread(ix) | (spread(iy) << 1)


def hilbert_xy2d(ix, iy, z: int):
    """Vectorized Hilbert distance of integer cells (numpy arrays in, int64
    out) — the classic per-level rotate/flip walk, vectorized over CELLS so
    the Python loop is O(z), not O(rows).

    Hilbert beats Morton on locality (no quadrant-boundary jumps: every
    consecutive d is an adjacent cell), which tightens range-partitioned
    file stats further. Not expressible as a reasonable Catalyst tree: the
    per-level swap makes the expression DAG exponential after
    CollapseProject re-inlining, so this lives in the Arrow kernel layer."""
    import numpy as np

    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (z - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: when ry==0, optionally flip then swap x/y
        flip = (ry == 0) & (rx == 1)
        x[flip] = s - 1 - x[flip]
        y[flip] = s - 1 - y[flip]
        swap = ry == 0
        x[swap], y[swap] = y[swap], x[swap].copy()
        s >>= 1
    return d


def with_hilbert_index(df, z: int, lon: str = "lon", lat: str = "lat"):
    """Append ``hilbert_d`` (int64 Hilbert distance at zoom z) via one
    Arrow batch kernel; cell (ix, iy) computed with the same
    lonlat_to_cell_xy arithmetic as the Morton index. Rows with null
    coordinates get hilbert_d = -1 (cluster together at the front)."""
    import pandas as pd
    from typing import Iterator

    import numpy as np

    if not 1 <= z <= MAX_Z:
        raise ValueError(f"z must be in [1, {MAX_Z}], got {z}")
    n = 1 << z
    from pygridmap_spark.util import schema_with

    schema = schema_with(df, "hilbert_d long")

    def _hil(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            lo = batch[lon].to_numpy(dtype=np.float64)
            la = batch[lat].to_numpy(dtype=np.float64)
            d = np.full(len(batch), -1, dtype=np.int64)  # null coords -> -1
            ok = ~(np.isnan(lo) | np.isnan(la))
            if ok.any():
                ix = np.clip(((lo[ok] + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
                iy = np.clip(((la[ok] + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
                d[ok] = hilbert_xy2d(ix, iy, z)
            out = batch.copy()
            out["hilbert_d"] = d
            yield out

    return df.mapInPandas(_hil, schema)
