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
hash-match vertex-for-vertex. ``prereduce=True`` is the skew path: each
scan partition first collapses to its LOCAL per-group hull vertices
(exact — a hull vertex of the whole is a hull vertex of any subset
containing it), so a one-giant-group input ships only O(partitions x
hull-size) rows through the exchange instead of every point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _chain_hull_idx(u):
    """Monotone chain over a lexicographically sorted, deduped (m, 2)
    array; returns ROW POSITIONS of the hull in canonical CCW order.
    Strict left turns only (cross <= 0 popped) drop collinear points."""
    m = len(u)
    if m <= 2:
        return list(range(m))
    xs, ys = u[:, 0], u[:, 1]

    def cross(o, a, b):
        return (xs[a] - xs[o]) * (ys[b] - ys[o]) - (ys[a] - ys[o]) * (
            xs[b] - xs[o]
        )

    lower: list[int] = []
    for p in range(m):
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[int] = []
    for p in range(m - 1, -1, -1):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def _check_coords(xs, ys, label):
    import numpy as np

    bad = False
    for a in (xs, ys):
        if np.issubdtype(a.dtype, np.floating):
            bad = bad or bool(np.isnan(a).any())
        elif a.dtype == object:
            bad = bad or any(v is None for v in a)
    if bad:
        raise ValueError(
            f"convex_hull_points: NULL/NaN coordinates in {label} — "
            "filter upstream (a point with no position cannot be inside "
            "OR outside the hull)"
        )


def _local_hull_prereduce(df: DataFrame, group_col: str, x: str, y: str):
    """Exact per-partition pre-reduce: within each Arrow batch, keep only
    each group's LOCAL hull vertices (original rows, types untouched —
    selection by iloc, never value reconstruction). Zero shuffles; runs
    on whatever partitioning the scan produced.

    Grouping inside the batch uses the same exact-key (coalesced value,
    is-null flag) projection as util.grouped_rows_sorted — factorizing
    the raw column would see Arrow's long-with-null float64 coercion,
    where 2^53 and 2^53 + 1 COLLIDE and two groups get merged, silently
    dropping any hull vertex of one that is interior to the other
    (caught by test_prereduce_null_group_key_and_big_keys)."""
    import numpy as np
    import pandas as pd

    from pygridmap_spark import util

    proj, gv, gn = util._project_keys(df.select(group_col, x, y), [group_col])
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(group_col, x, y).schema.fields
    )

    def _run(batches):
        for b in batches:
            if not len(b):
                continue
            xs = b[x].to_numpy()
            ys = b[y].to_numpy()
            _check_coords(xs, ys, "prereduce batch")
            cv, _ = pd.factorize(b[gv[0]], use_na_sentinel=False)
            codes = cv * 2 + b[gn[0]].to_numpy().astype(np.int64)
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            bounds = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1], True])
            keep: list[np.ndarray] = []
            pts = np.stack([xs, ys], axis=1)
            for s, e in zip(bounds[:-1], bounds[1:]):
                idx = order[s:e]
                uniq, first = np.unique(pts[idx], axis=0, return_index=True)
                keep.append(idx[first[_chain_hull_idx(uniq)]])
            kept = b.iloc[np.concatenate(keep)]
            restored = util._restore_keys(kept.copy(), [group_col], gv, gn)
            yield restored[[group_col, x, y]]

    return proj.mapInPandas(_run, out_schema)


def convex_hull_points(
    df: DataFrame,
    group_col: str,
    x: str = "x",
    y: str = "y",
    prereduce: bool = False,
) -> DataFrame:
    """Per-group convex hull: ``(group_col, pos, x, y)`` rows, one per
    hull vertex in the canonical form documented in the module docstring.

    Coordinates should be integers (or integer-valued doubles) when the
    result must be engine-exact: int64 cross products are exact up to
    |coord| ~ 1.5e9, while float orientation tests near collinear can
    flip. NULL/NaN coordinates raise (fail closed).

    ``prereduce=True`` inserts the exact hull-of-hulls map-side pass
    (see module docstring) — same result, bit-for-bit (pinned in tests);
    turn it on when a group can hold millions of points, leave it off
    when groups are small (the extra Arrow pass would dominate)."""
    import numpy as np
    import pandas as pd

    from pygridmap_spark import util

    ftypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (
        f"{group_col} {ftypes[group_col]}, pos int, "
        f"{x} {ftypes[x]}, {y} {ftypes[y]}"
    )
    if prereduce:
        df = _local_hull_prereduce(df, group_col, x, y)

    def _kern(sub):
        xs = sub[x].to_numpy()
        ys = sub[y].to_numpy()
        _check_coords(xs, ys, f"group {sub[group_col].iloc[0]!r}")
        uniq = np.unique(np.stack([xs, ys], axis=1), axis=0)
        hull = uniq[_chain_hull_idx(uniq)]
        return pd.DataFrame(
            {
                group_col: [sub[group_col].iloc[0]] * len(hull),
                "pos": np.arange(len(hull), dtype=np.int32),
                x: hull[:, 0],
                y: hull[:, 1],
            }
        )

    return util.grouped_frames_sorted(
        df.select(group_col, x, y), [group_col], _kern, schema
    )
