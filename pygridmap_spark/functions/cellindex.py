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
    """Equirectangular cell indices at zoom z, clamped to [0, 2^z - 1].

    NULL/NaN coordinates yield NULL indices (and so a NULL Morton code /
    quadkey downstream): greatest/least SKIP nulls — without the guard a
    null coord would silently clamp to the edge cell — and NaN passes
    every comparison, landing in a corner cell. Same contract as the
    S2/hex/geohash encoders: bad rows drop from equi-joins instead of
    polluting a real cell's rollup."""
    if not 0 < z <= MAX_Z:
        raise ValueError(
            f"z must be in (0, {MAX_Z}]: the Morton bit-spreading masks to 31"
            " bits/axis and the code must stay non-negative in a signed long"
        )
    n = 1 << z
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long")
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))).cast("long")
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit(n - 1)))  # noqa: E731
    ok = lon.isNotNull() & lat.isNotNull() & ~F.isnan(lon) & ~F.isnan(lat)
    return F.when(ok, clamp(ix)), F.when(ok, clamp(iy))


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


def _compact_bits(v: Column) -> Column:
    """Inverse of :func:`_spread_bits`: gather the even-position bits back
    into the low 32 (6 shift/mask stages, all-JVM bitwise)."""
    v = v.bitwiseAND(F.lit(0x5555555555555555))
    v = v.bitwiseOR(F.shiftright(v, 1)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftright(v, 2)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftright(v, 4)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftright(v, 8)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftright(v, 16)).bitwiseAND(F.lit(0x00000000FFFFFFFF))
    return v


# Geohash (Niemeyer 2008, public domain): lon/lat bit-interleave, lon bit
# FIRST, base-32 encoded with this (non-contiguous) digit alphabet. The web's
# lingua-franca cell key — check-ins, tile caches, ES/Lucene geo fields all
# speak it, so a crawl-derived table is likely to carry one. Differences from
# the engine's Morton id: interleave order (lon first vs y-high), asymmetric
# bit counts at odd precisions, and the string form. Max precision 12 = 60
# bits — the conventional ceiling, and it keeps the code positive in a
# signed long.
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
# F.conv(_, 10, 32) emits digits 0-9 then A-V; translate those onto the
# geohash alphabet (and back for decode).
_CONV32_DIGITS = "abcdefghijklmnopqrstuv"
_GEOHASH_TAIL = GEOHASH_ALPHABET[10:]
MAX_GEOHASH_PRECISION = 12


def _geohash_bits(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= MAX_GEOHASH_PRECISION:
        raise ValueError(
            f"precision must be in [1, {MAX_GEOHASH_PRECISION}], got {precision}"
        )
    total = 5 * precision
    return (total + 1) // 2, total // 2  # (lon bits, lat bits)


def geohash_code(lon: Column, lat: Column, precision: int) -> Column:
    """The geohash's 5*precision-bit integer code (long) — the sortable /
    joinable form; prefix-coarsen with ``shiftright(code, 5*k)``."""
    lonbits, latbits = _geohash_bits(precision)
    nx, ny = 1 << lonbits, 1 << latbits
    clamp = lambda c, n: F.greatest(F.lit(0), F.least(c, F.lit(n - 1)))  # noqa: E731
    ix = clamp(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(nx))).cast("long"), nx)
    iy = clamp(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(ny))).cast("long"), ny)
    sx, sy = _spread_bits(ix), _spread_bits(iy)
    if lonbits == latbits:  # even precision: lon takes the high bit of each pair
        code = F.shiftleft(sx, 1).bitwiseOR(sy)
    else:
        code = sx.bitwiseOR(F.shiftleft(sy, 1))  # odd: lon holds the even positions
    # greatest/least SKIP nulls (a null coord would silently clamp to the
    # edge cell) and NaN passes every >= comparison (it would land in the
    # corner cell) — propagate null explicitly for both.
    ok = (
        lon.isNotNull() & lat.isNotNull() & ~F.isnan(lon) & ~F.isnan(lat)
    )
    return F.when(ok, code)


def geohash(lon: Column, lat: Column, precision: int) -> Column:
    """Base-32 geohash string of length ``precision`` (pure Catalyst:
    bit-interleave + conv + alphabet translate; zero Python). Coordinates
    outside the valid range clamp to the edge cell (lon=180 lands in the
    easternmost cell rather than wrapping)."""
    code = geohash_code(lon, lat, precision)
    b32 = F.lower(F.conv(code.cast("string"), 10, 32))
    return F.lpad(F.translate(b32, _CONV32_DIGITS, _GEOHASH_TAIL), precision, "0")


def geohash_decode(gh: Column, precision: int) -> tuple[Column, Column]:
    """(lon, lat) doubles of the geohash cell CENTER (so
    ``geohash(*geohash_decode(g, p), p) == g``). ``precision`` must match
    the string length. NOT a validator: the four letters absent from the
    geohash alphabet (a, i, l, o) are still valid base-32 digits after the
    translate, so a malformed key silently decodes as if it were the digit
    sharing its position ('a…' == 'b…'); filter untrusted keys with
    ``rlike('^[0-9b-hj-kmnp-z]+$')`` upstream."""
    lonbits, latbits = _geohash_bits(precision)
    code = F.conv(F.translate(gh, _GEOHASH_TAIL, _CONV32_DIGITS), 32, 10).cast("long")
    # CollapseProject re-inlines the conv/translate base 2^6 times through
    # the compact stages (blows the 64 KiB codegen limit and re-runs conv
    # per reference) — thread it in ONCE as a transform() argument so every
    # compact stage reads a bound lambda variable instead.
    def _axes(c: Column) -> Column:
        if lonbits == latbits:
            ix, iy = _compact_bits(F.shiftright(c, 1)), _compact_bits(c)
        else:
            ix, iy = _compact_bits(c), _compact_bits(F.shiftright(c, 1))
        lon = (ix.cast("double") + F.lit(0.5)) / F.lit(float(1 << lonbits)) * F.lit(360.0) - F.lit(180.0)
        lat = (iy.cast("double") + F.lit(0.5)) / F.lit(float(1 << latbits)) * F.lit(180.0) - F.lit(90.0)
        return F.struct(lon.alias("lon"), lat.alias("lat"))

    ll = F.element_at(F.transform(F.array(code), _axes), 1)
    return ll["lon"], ll["lat"]


def with_geohash(df, precision: int, lon: str = "lon", lat: str = "lat"):
    """Append a ``geohash`` string column at the given precision."""
    return df.withColumn("geohash", geohash(F.col(lon), F.col(lat), precision))


# Fixed neighbor slot order (dx=lon cells, dy=lat cells): W,E,S,N then the
# four diagonals — pinned so the oracle's k index means the same slot.
GEOHASH_NEIGHBOR_OFFSETS = (
    (-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1),
)


def geohash_neighbors(gh: Column, precision: int) -> Column:
    """The 8 adjacent cells as an ``array<string>`` in the fixed
    ``GEOHASH_NEIGHBOR_OFFSETS`` slot order — the probe set a
    geohash-keyed radius join expands each key into. East/west WRAP the
    antimeridian (the grid is periodic in lon); a north/south step past a
    pole has no cell and that slot is NULL (``array_compact`` the result
    for join explodes). Pure integer cell-space arithmetic — compact the
    base-32 code to (ix, iy), step ±1, re-interleave, re-encode — zero
    trig; the conv base is threaded through ONE ``transform`` so the
    compact stages read a bound variable (the CollapseProject hazard)."""
    lonbits, latbits = _geohash_bits(precision)
    nx, ny = 1 << lonbits, 1 << latbits
    code = F.conv(F.translate(gh, _GEOHASH_TAIL, _CONV32_DIGITS), 32, 10).cast("long")

    def _nbrs(c: Column) -> Column:
        if lonbits == latbits:
            ix, iy = _compact_bits(F.shiftright(c, 1)), _compact_bits(c)
        else:
            ix, iy = _compact_bits(c), _compact_bits(F.shiftright(c, 1))
        out = []
        for dx, dy in GEOHASH_NEIGHBOR_OFFSETS:
            nix = (ix + F.lit(dx + nx)) % F.lit(nx)  # lon wraps
            niy = iy + F.lit(dy)
            sx, sy = _spread_bits(nix), _spread_bits(niy)
            ncode = (
                F.shiftleft(sx, 1).bitwiseOR(sy)
                if lonbits == latbits
                else sx.bitwiseOR(F.shiftleft(sy, 1))
            )
            valid = (niy >= F.lit(0)) & (niy < F.lit(ny))  # lat clamps
            out.append(F.when(valid, ncode))
        return F.array(*out)

    codes = F.element_at(F.transform(F.array(code), _nbrs), 1)
    return F.transform(
        codes,
        lambda nc: F.lpad(
            F.translate(F.lower(F.conv(nc.cast("string"), 10, 32)), _CONV32_DIGITS, _GEOHASH_TAIL),
            precision,
            "0",
        ),
    )


def morton_prefix(code: Column, levels_up: int) -> Column:
    """Coarsen a Morton code by k levels — the salt/skew bucketing key."""
    return F.shiftright(code, 2 * levels_up)


def with_cell_index(df, z: int, lon: str = "lon", lat: str = "lat"):
    """Append (cell_ix, cell_iy, cell_id) at zoom z.

    Two projection steps on purpose: the Morton spread references its
    input ~2^6 times (each shift/mask stage doubles the fan-out), so
    inlining the clamped CASE WHEN coordinate expressions — worse, any
    big caller-side lon/lat expression underneath them — multiplies the
    codegen source past Janino's 64KB method cap and the whole stage
    silently falls back to interpreted. Staging (cell_ix, cell_iy) as
    columns first keeps them single-evaluation locals in the fused
    WholeStageCodegen (CollapseProject will not re-inline a non-cheap
    expression used more than once)."""
    ix, iy = lonlat_to_cell_xy(F.col(lon), F.col(lat), z)
    df = df.withColumns({"cell_ix": ix, "cell_iy": iy})
    return df.withColumn("cell_id", morton(F.col("cell_ix"), F.col("cell_iy")))


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


def py_geohash(lon: float, lat: float, precision: int) -> str:
    """Scalar twin of :func:`geohash` (same clamp + interleave + alphabet)."""
    import math

    lonbits, latbits = _geohash_bits(precision)
    nx, ny = 1 << lonbits, 1 << latbits
    ix = min(max(int(math.floor((lon + 180.0) / 360.0 * nx)), 0), nx - 1)
    iy = min(max(int(math.floor((lat + 90.0) / 180.0 * ny)), 0), ny - 1)
    sx, sy = py_morton(ix, 0), py_morton(iy, 0)
    code = (sx << 1) | sy if lonbits == latbits else sx | (sy << 1)
    return "".join(
        GEOHASH_ALPHABET[(code >> (5 * (precision - 1 - i))) & 31]
        for i in range(precision)
    )


def py_geohash_decode(gh: str) -> tuple[float, float]:
    """Scalar twin of :func:`geohash_decode` — cell-center (lon, lat)."""
    precision = len(gh)
    lonbits, latbits = _geohash_bits(precision)
    code = 0
    for ch in gh:
        code = (code << 5) | GEOHASH_ALPHABET.index(ch)

    def compact(v: int) -> int:
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        v = (v | (v >> 16)) & 0x00000000FFFFFFFF
        return v

    if lonbits == latbits:
        ix, iy = compact(code >> 1), compact(code)
    else:
        ix, iy = compact(code), compact(code >> 1)
    lon = (ix + 0.5) / (1 << lonbits) * 360.0 - 180.0
    lat = (iy + 0.5) / (1 << latbits) * 180.0 - 90.0
    return lon, lat


def py_geohash_neighbors(gh: str) -> list[str | None]:
    """Scalar twin of :func:`geohash_neighbors` (same slot order, same
    wrap/clamp rules)."""
    precision = len(gh)
    lonbits, latbits = _geohash_bits(precision)
    nx, ny = 1 << lonbits, 1 << latbits
    clon, clat = py_geohash_decode(gh)
    # recover integer cell indices from the center
    ix = int((clon + 180.0) / 360.0 * nx)
    iy = int((clat + 90.0) / 180.0 * ny)
    out: list[str | None] = []
    for dx, dy in GEOHASH_NEIGHBOR_OFFSETS:
        niy = iy + dy
        if not 0 <= niy < ny:
            out.append(None)
            continue
        nix = (ix + dx + nx) % nx
        sx, sy = py_morton(nix, 0), py_morton(niy, 0)
        ncode = (sx << 1) | sy if lonbits == latbits else sx | (sy << 1)
        out.append(
            "".join(
                GEOHASH_ALPHABET[(ncode >> (5 * (precision - 1 - i))) & 31]
                for i in range(precision)
            )
        )
    return out


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
