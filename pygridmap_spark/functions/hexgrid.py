"""Hexagonal cell index — the engine's H3-analog, over an equal-area plane.

The north star asks for "H3/S2 cells". ``s2.py`` supplies the spherical
quad family; this module supplies the hex family. No H3 build ships in
this container, and H3's icosahedral aperture-7 machinery exists to make
hexes *roughly* equal-area on the sphere — but this engine already has an
exact equal-area plane: EPSG:3035 (LAEA, functions/reproject.py). A
regular hex grid laid on an equal-area projection gives EXACTLY
equal-area cells on the ellipsoid (every hex covers size²·3√3/2 of true
ground area), which is the property H3 approximates. So: project with
``reproject.laea_forward``, then bin here.

All public-domain math (axial/cube hex coordinates and cube rounding, the
standard formulation popularized by the Red Blob Games article): pure
Catalyst arithmetic, zero Python, one codegen span; the DuckDB oracle twin
restates it exactly (driver query ``hex_rollup``).

Grid convention: pointy-top hexes, ``size`` = circumradius (center to
vertex) in the plane's units (meters for LAEA). Axial (q, r):

    q = (x·√3/3 − y/3) / size        x = size·√3·(q + r/2)
    r = (y·2/3) / size               y = size·(3/2)·r

Cell ids pack (q, r) into one positive long — ``(q+B)·2^26 + (r+B)``,
B = 2^25 — valid for |q|, |r| < 33.5M cells (an Earth circumference of
1 m hexes), float-exact below 2^52, and BIGINT-identical in DuckDB.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_B = 1 << 25  # axial-coordinate offset
_W = 1 << 26  # packing stride
SQRT3 = math.sqrt(3.0)


def axial_coords(x: Column, y: Column, size: float) -> tuple[Column, Column]:
    """Rounded axial (q, r) of the hex containing plane point (x, y):
    fractional axial transform + cube rounding (largest-residual repair
    keeps q + r + s == 0, i.e. the point maps to the NEAREST hex center
    — pinned by test)."""
    qf = (x * F.lit(SQRT3 / 3.0) - y * F.lit(1.0 / 3.0)) / F.lit(float(size))
    rf = (y * F.lit(2.0 / 3.0)) / F.lit(float(size))
    sf = -qf - rf
    rq = F.round(qf, 0)
    rr = F.round(rf, 0)
    rs = F.round(sf, 0)
    dq = F.abs(rq - qf)
    dr = F.abs(rr - rf)
    ds = F.abs(rs - sf)
    q = F.when((dq > dr) & (dq > ds), -rr - rs).otherwise(rq)
    r = F.when(~((dq > dr) & (dq > ds)) & (dr > ds), -rq - rs).otherwise(rr)
    # a NaN coordinate would CAST_OVERFLOW under ANSI mode and kill the
    # whole stage on one bad row — yield NULL axials instead (null coords
    # already propagate through the arithmetic)
    ok = ~(F.isnan(x) | F.isnan(y))
    return F.when(ok, q).cast("long"), F.when(ok, r).cast("long")


def pack(q: Column, r: Column) -> Column:
    """(q, r) -> one positive long id (offset-packed, see module doc)."""
    return (q + F.lit(_B)) * F.lit(_W) + (r + F.lit(_B))


def unpack(cell: Column) -> tuple[Column, Column]:
    """Inverse of ``pack``."""
    q = (cell / F.lit(_W)).cast("long") - F.lit(_B)
    r = cell % F.lit(_W) - F.lit(_B)
    return q, r


def hex_cell(x: Column, y: Column, size: float) -> Column:
    """Packed hex id of plane point (x, y)."""
    q, r = axial_coords(x, y, size)
    return pack(q, r)


def center(q: Column, r: Column, size: float) -> tuple[Column, Column]:
    """Plane coordinates of a hex center from axial (q, r)."""
    x = F.lit(float(size) * SQRT3) * (q + r / F.lit(2.0))
    y = F.lit(float(size) * 1.5) * r
    return x, y


def with_hex_index(
    df: DataFrame,
    size: float,
    x: str = "x",
    y: str = "y",
    prefix: str = "hex_",
) -> DataFrame:
    """Append ``{prefix}q``, ``{prefix}r``, ``{prefix}id`` for the hex grid
    of circumradius ``size`` — all Catalyst, zero Python, no shuffle."""
    q, r = axial_coords(F.col(x), F.col(y), size)
    df = df.withColumns({f"{prefix}q": q, f"{prefix}r": r})
    return df.withColumn(
        f"{prefix}id", pack(F.col(f"{prefix}q"), F.col(f"{prefix}r"))
    )


# --- neighbor / ring topology (driver-side constants, like cellindex) -------

AXIAL_NEIGHBORS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def ring_offsets(radius: int) -> list[tuple[int, int]]:
    """Axial offsets of the hex ring at exactly ``radius`` (6·radius cells;
    the kNN ring-expansion constant, hex analog of cellindex.ring_offsets)."""
    if radius == 0:
        return [(0, 0)]
    out = []
    q, r = -radius, radius  # start at the corner in direction 4 (-1, +1)
    for side in range(6):
        dq, dr = AXIAL_NEIGHBORS[side]
        for _ in range(radius):
            out.append((q, r))
            q, r = q + dq, r + dr
    return out


def disk_offsets(radius: int) -> list[tuple[int, int]]:
    """All axial offsets within hex distance ``radius``: 1 + 3·R·(R+1)."""
    return [
        (dq, dr)
        for dq in range(-radius, radius + 1)
        for dr in range(max(-radius, -dq - radius), min(radius, -dq + radius) + 1)
    ]


def hex_distance(q1, r1, q2, r2) -> int:
    """Hex (cube) distance between two axial cells — python helper."""
    dq, dr = q1 - q2, r1 - r2
    return int((abs(dq) + abs(dr) + abs(dq + dr)) // 2)


# --- numpy twins ------------------------------------------------------------


def py_axial(x: np.ndarray, y: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of ``axial_coords`` (same round-half-away-from-zero
    convention as Spark/DuckDB ``round``; ties are measure-zero)."""
    qf = (np.asarray(x, np.float64) * (SQRT3 / 3.0) - np.asarray(y, np.float64) / 3.0) / size
    rf = (np.asarray(y, np.float64) * (2.0 / 3.0)) / size
    sf = -qf - rf

    def _round_half_away(v):
        return np.sign(v) * np.floor(np.abs(v) + 0.5)

    rq, rr, rs = _round_half_away(qf), _round_half_away(rf), _round_half_away(sf)
    dq, dr, ds = np.abs(rq - qf), np.abs(rr - rf), np.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -rr - rs, rq)
    r = np.where(fix_r, -rq - rs, rr)
    return q.astype(np.int64), r.astype(np.int64)


def py_pack(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (np.asarray(q, np.int64) + _B) * _W + (np.asarray(r, np.int64) + _B)


def py_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, np.int64)
    return cell // _W - _B, cell % _W - _B


def py_center(q: np.ndarray, r: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    q = np.asarray(q, np.float64)
    r = np.asarray(r, np.float64)
    return size * SQRT3 * (q + r / 2.0), size * 1.5 * r


# --- polyfill (H3 polygonToCells parity) -------------------------------------

_MAX_SPAN = 4096  # candidate cap per range row (bounds per-task PIP work)
_PIP_SLAB = 32768  # points per ray-cast call ((P x E) temporaries stay ~MB)


def polyfill(
    polys: DataFrame,
    size: float,
    wkb_col: str = "wkb",
    id_col: str = "poly_id",
    prefix: str = "hex_",
    candidates_partitions: int | None = None,
    max_span: int = _MAX_SPAN,
) -> DataFrame:
    """All hex cells whose CENTER lies inside each (multi)polygon — H3's
    ``polygonToCells`` semantics (center containment) on the LAEA plane.

    Three stages, heavy work distributed and Catalyst-visible:

    1. an Arrow kernel turns each polygon into its bbox's ROW RANGES —
       one output row per hex row ``r`` with the inclusive ``[q_lo, q_hi]``
       span whose centers fall in the bbox (O(rows), tiny);
    2. the range rows equi-join the polygon WKB on ``id_col`` (AQE
       broadcasts dim-sized layers) — ONE WKB copy per <=``max_span``
       candidates, so a mega-polygon's geometry never rides an exchange
       once per cell;
    3. a second Arrow kernel expands each range to its candidate centers
       in numpy (per-range arange offsets, no per-cell Python) and runs
       the vectorized even-odd ray cast
       (core/geometry.points_in_multipolygon), decoding each polygon once
       per batch-group.

    ``candidates_partitions``: the range kernel is not an exchange — its
    rows inherit the (typically few) input partitions, so ONE
    mega-polygon's millions of candidates would ray-cast in a single
    task. Set this to round-robin the chunked range rows across N
    partitions (an O(cells/max_span) tiny-row exchange) so every task
    holds a bounded slice of the mega-polygon's work. Leave None (no
    exchange) when polygons are many and individually small — the
    default matches the engine's zero-exchange bias.

    Returns (id_col, {prefix}q, {prefix}r, {prefix}id). Centers exactly on
    a polygon edge follow the ray-cast half-open convention (standard
    caveat, same as the engine's PIP joins). Reference parity: pygridmap
    covers polygons with RECT grid cells (gridding.grid_maker); this is
    the hex-family analog the north star's "H3/S2 cells" implies.
    """
    size = float(size)
    sx = size * SQRT3  # center x stride per unit (q + r/2)
    sy = size * 1.5  # center y stride per unit r
    id_field = f"{id_col} {dict(polys.dtypes)[id_col]}"
    ranges_schema = f"{id_field}, _r long, _qlo long, _qhi long"

    def _row_ranges(batches):
        import pandas as pd

        from pygridmap_spark.core import geometry as G
        from pygridmap_spark.core import wkb as WKB

        for pdf in batches:
            ids, rs, qlos, qhis = [], [], [], []
            for pid, buf in zip(pdf[id_col], pdf[wkb_col]):
                if buf is None:
                    continue
                mp = WKB.decode_multipolygon(bytes(buf))
                if not mp or not any(len(p) for p in mp):
                    continue
                xmin, ymin, xmax, ymax = G.multipolygon_bbox(mp)
                rlo = int(np.ceil(ymin / sy))
                rhi = int(np.floor(ymax / sy))
                if rhi < rlo:
                    continue
                rr = np.arange(rlo, rhi + 1, dtype=np.int64)
                qlo = np.ceil(xmin / sx - rr / 2.0).astype(np.int64)
                qhi = np.floor(xmax / sx - rr / 2.0).astype(np.int64)
                ok = qhi >= qlo
                if not ok.any():
                    continue
                rr, qlo, qhi = rr[ok], qlo[ok], qhi[ok]
                # cap each range row at _MAX_SPAN candidates so a later
                # repartition bounds every task's PIP slice
                nch = (qhi - qlo) // max_span + 1
                rr = np.repeat(rr, nch)
                idx = np.arange(int(nch.sum())) - np.repeat(
                    np.cumsum(nch) - nch, nch
                )
                lo = np.repeat(qlo, nch) + idx * max_span
                hi = np.minimum(lo + max_span - 1, np.repeat(qhi, nch))
                ids.append(np.repeat(np.asarray(pid), len(rr)))
                rs.append(rr)
                qlos.append(lo)
                qhis.append(hi)
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "_r": np.concatenate(rs),
                        "_qlo": np.concatenate(qlos),
                        "_qhi": np.concatenate(qhis),
                    }
                )

    ranges = polys.select(id_col, wkb_col).mapInPandas(_row_ranges, ranges_schema)
    if candidates_partitions:
        ranges = ranges.repartition(int(candidates_partitions))
    # join the WKB onto the chunked RANGE rows (one copy per <=max_span
    # candidates), never onto candidate cells — a mega-polygon's geometry
    # must not ride the exchange once per cell
    joined = ranges.join(polys.select(id_col, wkb_col), id_col)

    out_schema = f"{id_field}, {prefix}q long, {prefix}r long, {prefix}id long"

    def _containment(batches):
        import pandas as pd

        from pygridmap_spark.core import geometry as G
        from pygridmap_spark.core import wkb as WKB

        for pdf in batches:
            if not len(pdf):
                continue
            parts = []
            for pid, g in pdf.groupby(id_col, sort=False):
                buf = g[wkb_col].iloc[0]
                if buf is None:
                    continue
                mp = WKB.decode_multipolygon(bytes(buf))
                lo = g["_qlo"].to_numpy()
                hi = g["_qhi"].to_numpy()
                rr = g["_r"].to_numpy()
                spans = hi - lo + 1
                # expand the ranges to candidate (q, r) in numpy (the
                # per-range arange offsets trick; no Python per-cell loop)
                total = int(spans.sum())
                idx = np.arange(total) - np.repeat(np.cumsum(spans) - spans, spans)
                q = np.repeat(lo, spans) + idx
                r = np.repeat(rr, spans)
                cx, cy = py_center(q, r, size)
                # slab the ray cast: the kernel builds (points x edges)
                # temporaries, so cap points per call to keep them
                # cache-/RAM-sized (CLAUDE.md slabbing hazard)
                if total <= _PIP_SLAB:
                    inside = G.points_in_multipolygon(cx, cy, mp)
                else:
                    inside = np.empty(total, dtype=bool)
                    for s in range(0, total, _PIP_SLAB):
                        e = min(s + _PIP_SLAB, total)
                        inside[s:e] = G.points_in_multipolygon(
                            cx[s:e], cy[s:e], mp
                        )
                if not inside.any():
                    continue
                q, r = q[inside], r[inside]
                parts.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(
                                g[id_col].to_numpy()[:1], len(q)
                            ),
                            f"{prefix}q": q,
                            f"{prefix}r": r,
                            f"{prefix}id": py_pack(q, r),
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return joined.mapInPandas(_containment, out_schema)
