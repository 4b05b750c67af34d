"""Minimal WKB codec for Polygon / MultiPolygon / Point (2D, little-endian).

The engine stores geometry columns as WKB ``BinaryType`` (the standard
lake-format convention — GeoParquet/Sedona-compatible byte layout), decoded
batch-at-a-time inside Arrow UDFs into the numpy ring representation of
:mod:`pygridmap_spark.core.geometry`. Implemented from the public OGC
Simple Features / ISO 13249-3 WKB byte layout; no external geometry
dependency.
"""

from __future__ import annotations

import struct

import numpy as np

_LE = 1
WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, WKB_POINT, x, y)


def encode_polygon(rings) -> bytes:
    """rings: iterable of (N,2) arrays / coordinate lists (first = shell)."""
    out = [struct.pack("<BII", _LE, WKB_POLYGON, len(rings))]
    for ring in rings:
        arr = _close_ring(np.asarray(ring, dtype="<f8"))
        out.append(struct.pack("<I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def encode_multipolygon(polygons) -> bytes:
    """polygons: iterable of ring-lists."""
    out = [struct.pack("<BII", _LE, WKB_MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        out.append(encode_polygon(rings))
    return b"".join(out)


def encode_box(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    """Axis-aligned rectangle as a WKB Polygon (CCW shell)."""
    return encode_polygon(
        [[(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]]
    )


def _close_ring(arr: np.ndarray) -> np.ndarray:
    if len(arr) == 0 or (arr[0] == arr[-1]).all():
        return arr
    return np.vstack([arr, arr[:1]])


def decode(buf: bytes):
    """Decode WKB -> ('point', (x, y)) | ('multipolygon', [polygon, ...]).

    Polygons are normalized to MultiPolygon form: a list of polygons, each a
    list of (N, 2) float64 rings. Raises ValueError on unsupported types.
    """
    geom, _ = _decode_at(memoryview(buf), 0)
    return geom


def decode_multipolygon(buf: bytes):
    """Decode, asserting a polygonal geometry; returns list-of-polygons."""
    kind, val = decode(buf)
    if kind != "multipolygon":
        raise ValueError(f"expected polygonal WKB, got {kind}")
    return val


def _decode_at(mv: memoryview, off: int):
    byte_order = mv[off]
    endian = "<" if byte_order == _LE else ">"
    (gtype,) = struct.unpack_from(endian + "I", mv, off + 1)
    off += 5
    gtype &= 0xFF  # mask off Z/M/SRID flag variants
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(endian + "dd", mv, off)
        return ("point", (x, y)), off + 16
    if gtype == WKB_POLYGON:
        rings, off = _decode_rings(mv, off, endian)
        return ("multipolygon", [rings]), off
    if gtype == WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        polys = []
        for _ in range(n):
            (inner_type,) = struct.unpack_from(("<" if mv[off] == _LE else ">") + "I", mv, off + 1)
            if inner_type & 0xFF != WKB_POLYGON:
                raise ValueError("MultiPolygon member is not a Polygon")
            inner_endian = "<" if mv[off] == _LE else ">"
            rings, off = _decode_rings(mv, off + 5, inner_endian)
            polys.append(rings)
        return ("multipolygon", polys), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _decode_rings(mv: memoryview, off: int, endian: str):
    (nrings,) = struct.unpack_from(endian + "I", mv, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        arr = np.frombuffer(mv, dtype=endian + "f8", count=npts * 2, offset=off).reshape(npts, 2)
        rings.append(np.array(arr, dtype=np.float64))
        off += npts * 16
    return rings, off
