"""Per-group 2D convex hulls of point sets — the footprint primitive the
reference gets from GEOS ``convex_hull`` (geopandas surface; pygridmap
itself never computes hulls because its grids are rectangles). Here it is
the point-cloud companion to ``domains.geo_dispersion``: the minimal
convex footprint of a domain's page geolocations, a zone's pings, a
cluster's cells.

Canonical form (pinned on both engines): vertices in COUNTERCLOCKWISE
order (y-up), starting at the lexicographically smallest (x, y) point,
collinear edge points EXCLUDED, duplicate input points collapsed. A
single point yields one row; a collinear set yields its two endpoints.

Scale shape: one exchange (the group hash repartition + sort from
util.grouped_frames_sorted), then a streaming Arrow pass paying per
batch. The kernel is Andrew's monotone chain (public, O(n log n)) —
with integer coordinates every orientation test is exact int64
arithmetic, which is what lets the driver oracle re-derive the hull in
DuckDB (gift-wrapping recursive CTE, a DIFFERENT algorithm) and
hash-match vertex-for-vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _chain_hull(pts):
    """Monotone chain over lexicographically sorted unique points; strict
    left turns only (cross <= 0 popped), so collinear edge points drop.
    Returns the CCW vertex list starting at the smallest (x, y)."""
    n = len(pts)
    if n <= 2:
        return list(pts)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def convex_hull_points(
    df: DataFrame,
    group_col: str,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-group convex hull: ``(group_col, pos, x, y)`` rows, one per
    hull vertex in the canonical form documented in the module docstring.

    Coordinates should be integers (or integer-valued doubles) when the
    result must be engine-exact: int64 cross products are exact up to
    |coord| ~ 1.5e9, while float orientation tests near collinear can
    flip. NULL/NaN coordinates raise (fail closed — a point with no
    position cannot be inside OR outside the hull)."""
    import numpy as np
    import pandas as pd

    from pygridmap_spark import util

    ftypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (
        f"{group_col} {ftypes[group_col]}, pos int, "
        f"{x} {ftypes[x]}, {y} {ftypes[y]}"
    )

    def _kern(sub):
        xs = sub[x].to_numpy()
        ys = sub[y].to_numpy()
        if (
            np.issubdtype(xs.dtype, np.floating)
            and (np.isnan(xs).any() or np.isnan(ys).any())
        ) or sub[x].isna().any() or sub[y].isna().any():
            raise ValueError(
                "convex_hull_points: NULL/NaN coordinates in group "
                f"{sub[group_col].iloc[0]!r} — filter upstream"
            )
        uniq = np.unique(np.stack([xs, ys], axis=1), axis=0)
        hull = _chain_hull([tuple(p) for p in uniq])
        return pd.DataFrame(
            {
                group_col: [sub[group_col].iloc[0]] * len(hull),
                "pos": np.arange(len(hull), dtype=np.int32),
                x: [p[0] for p in hull],
                y: [p[1] for p in hull],
            }
        )

    return util.grouped_frames_sorted(
        df.select(group_col, x, y), [group_col], _kern, schema
    )
