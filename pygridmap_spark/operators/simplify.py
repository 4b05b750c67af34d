"""Douglas-Peucker simplification of polygonal WKB columns — the GEOS
``simplify`` parity op (the reference's geopandas surface exposes it;
pygridmap itself never simplifies because its cells are rectangles).

Ring contract: each ring is cut at its STORED first vertex and the open
vertex sequence v0..v(n-1) runs the same DP kernel as
``trajectories.simplify_trajectory`` (both cut endpoints are kept, so
the anchor vertex always survives — the result therefore depends on
ring rotation, exactly as anchor-based GEOS-style implementations do).
Rings whose simplification drops below 3 distinct vertices are removed;
a polygon losing its SHELL is removed with its holes; a geometry losing
every polygon becomes NULL. Like GEOS ``simplify`` (the
non-topology-preserving default), the output can self-intersect for
aggressive tolerances — the caller owns that tradeoff.

NULL WKB passes through as NULL; NaN coordinates raise (fail closed,
the engine's posture everywhere). Scale shape: a pure per-row Arrow
scalar kernel — zero shuffles, embarrassingly parallel, memory bounded
by one batch of geometries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pygridmap_spark.operators.trajectories import _dp_keep_mask


def _simplify_buf(buf: bytes, tol2: float):
    import struct

    import numpy as np

    from pygridmap_spark.core import wkb

    polygons = wkb.decode_multipolygon(bytes(buf))
    out_polys = []
    for rings in polygons:
        out_rings = []
        for ri, ring in enumerate(rings):
            arr = np.asarray(ring, dtype=np.float64)
            if len(arr) and (arr[0] == arr[-1]).all():
                arr = arr[:-1]
            if np.isnan(arr).any():
                raise ValueError(
                    "simplify_wkb: NaN coordinate in ring — fail closed"
                )
            if len(arr) >= 3:
                arr = arr[_dp_keep_mask(arr[:, 0], arr[:, 1], tol2)]
            if len(np.unique(arr, axis=0)) < 3:
                if ri == 0:
                    out_rings = None  # shell collapsed: drop polygon
                    break
                continue  # hole collapsed: drop hole only
            out_rings.append(arr)
        if out_rings:
            out_polys.append(out_rings)
    if not out_polys:
        return None
    # preserve the input's geometry type byte (decode normalizes to
    # multipolygon form)
    in_type = struct.unpack_from("<I" if buf[0] == 1 else ">I", buf, 1)[0]
    if (in_type & 0xFFFF) == wkb.WKB_POLYGON and len(out_polys) == 1:
        return wkb.encode_polygon(out_polys[0])
    return wkb.encode_multipolygon(out_polys)


def simplify_wkb(
    df: DataFrame,
    tolerance: float,
    wkb_col: str = "wkb",
    out_col: str | None = None,
) -> DataFrame:
    """Append (or replace) a column holding the DP-simplified geometry of
    ``wkb_col`` at ``tolerance`` (planar coordinate units — reproject
    first when metric fidelity matters, as with simplify_trajectory).
    Same kernel, same contract: the vertex-rows twin
    ``simplify_trajectory(..., entity_col=["poly", "ring"])`` over the
    exploded ring vertices keeps exactly the vertices this op keeps
    (pinned in tests)."""
    out = out_col or wkb_col
    return df.withColumn(out, simplify_wkb_col(df[wkb_col], tolerance))


def simplify_wkb_col(col: Column, tolerance: float) -> Column:
    """Column form of :func:`simplify_wkb` (compose inside selects)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    tol2 = float(tolerance) * float(tolerance)
    if not tol2 >= 0.0:  # NaN-proof
        raise ValueError("simplify_wkb: tolerance must be a number >= 0")

    # defined WITHOUT type hints + explicit SCALAR functionType: this
    # module uses `from __future__ import annotations` (CLAUDE.md gotcha)
    def _kern(bufs):
        return pd.Series(
            [None if b is None else _simplify_buf(b, tol2) for b in bufs],
            dtype=object,
        )

    return pandas_udf(_kern, returnType=BinaryType(), functionType=200)(col)
