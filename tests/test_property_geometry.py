"""Property-based tests (hypothesis) for the numpy geometry kernel and
coordinate math — the foundations every operator sits on."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pygridmap_spark.core import bboxes as B
from pygridmap_spark.core import geometry as G
from pygridmap_spark.core import wkb

finite = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)
small = st.floats(1.0, 1e4, allow_nan=False)


@st.composite
def convex_polygons(draw):
    """Random convex polygon: sorted angles around a center."""
    cx = draw(finite)
    cy = draw(finite)
    r = draw(st.floats(1.0, 1e4))
    n = draw(st.integers(3, 12))
    angles = sorted(draw(st.lists(st.floats(0, 2 * math.pi - 1e-6), min_size=n, max_size=n, unique=True)))
    if len(angles) < 3:
        angles = [0.0, 2.0, 4.0]
    ring = np.array([[cx + r * math.cos(a), cy + r * math.sin(a)] for a in angles] + [[cx + r * math.cos(angles[0]), cy + r * math.sin(angles[0])]])
    return ring


@given(convex_polygons())
@settings(max_examples=80, deadline=None)
def test_clip_area_never_exceeds_either_area(ring):
    poly_area = G.polygon_area([ring])
    xmin, ymin, xmax, ymax = G.ring_bbox(ring)
    # clip to a quarter of the bbox
    mx, my = (xmin + xmax) / 2, (ymin + ymax) / 2
    a = G.clip_area([ring], xmin, ymin, mx, my)
    rect_area = (mx - xmin) * (my - ymin)
    assert -1e-9 <= a <= min(poly_area, rect_area) + 1e-6 * max(poly_area, 1)


@given(convex_polygons())
@settings(max_examples=60, deadline=None)
def test_clip_partition_additivity(ring):
    """Clipping to the 4 bbox quadrants partitions the polygon: areas sum
    to the polygon area (S-H exactness on convex subjects)."""
    poly_area = G.polygon_area([ring])
    xmin, ymin, xmax, ymax = G.ring_bbox(ring)
    mx, my = (xmin + xmax) / 2, (ymin + ymax) / 2
    quads = [
        (xmin, ymin, mx, my),
        (mx, ymin, xmax, my),
        (xmin, my, mx, ymax),
        (mx, my, xmax, ymax),
    ]
    total = sum(G.clip_area([ring], *q) for q in quads)
    # shoelace rounding grows with coord^2 * eps * n_vertices
    scale = max(abs(xmin), abs(xmax), abs(ymin), abs(ymax), 1.0)
    tol = max(1e-9, len(ring) * scale * scale * 1e-14)
    assert abs(total - poly_area) <= tol


def approx(v, rel=1e-6):
    import pytest

    return pytest.approx(v, rel=rel, abs=1e-6)


@given(convex_polygons(), st.integers(0, 1000))
@settings(max_examples=60, deadline=None)
def test_pip_centroid_inside_far_point_outside(ring, seed):
    from hypothesis import assume

    area = G.polygon_area([ring])
    xmin_, ymin_, xmax_, ymax_ = G.ring_bbox(ring)
    # skip degenerate slivers: vertex centroid can sit within float-eps of
    # an edge and the even-odd ray cast legitimately resolves either way
    assume(area > 0.05 * max(xmax_ - xmin_, 1e-9) * max(ymax_ - ymin_, 1e-9))
    cx, cy = ring[:-1, 0].mean(), ring[:-1, 1].mean()
    xmin, ymin, xmax, ymax = G.ring_bbox(ring)
    far_x, far_y = xmax + (xmax - xmin + 1), ymax + (ymax - ymin + 1)
    got = G.points_in_polygon(np.array([cx, far_x]), np.array([cy, far_y]), [ring])
    assert got.tolist() == [True, False]


@given(convex_polygons())
@settings(max_examples=40, deadline=None)
def test_wkb_roundtrip_preserves_area(ring):
    buf = wkb.encode_polygon([ring])
    _, mp = wkb.decode(buf)
    assert G.multipolygon_area(mp) == approx(G.polygon_area([ring]))


@given(finite, finite, st.floats(0.01, 1e4), st.integers(2, 1024), finite, finite)
@settings(max_examples=200, deadline=None)
def test_tile_assign_in_tile_position_invariants(x, y, res, ts, x0, y0):
    xt, yt, cx, cy = B.tile_assign(x, y, res, ts, x0, y0)
    # reference semantics (gridtiler.py:101-118): in-tile positions land in
    # [0, ts-1] except for float-cancellation edges in BOTH directions —
    # the reference's own range check warns on cx < 0 (e.g. denormal
    # origins, where /(res*ts) underflows to -0 while /res doesn't) and on
    # cx > ts-1, keeping the value either way. Property pins that exact
    # behavior; goldens pin the well-conditioned cases.
    assert -1 <= cx <= ts
    assert -1 <= cy <= ts
    assert xt == math.floor((x - x0) / (res * ts))
    # the cell's reconstructed origin is never beyond the point
    cell_origin_x = x0 + (xt * ts + cx) * res
    assert cell_origin_x <= x + res * 1e-6 + 1e-9 * abs(x)


@given(st.lists(st.tuples(finite, finite, small, small), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_rect_intersection_vectorized_matches_scalar(rects):
    axmin = np.array([r[0] for r in rects])
    aymin = np.array([r[1] for r in rects])
    axmax = axmin + np.array([r[2] for r in rects])
    aymax = aymin + np.array([r[3] for r in rects])
    b = (0.0, 0.0, 5000.0, 5000.0)
    got = G.rect_intersection_area(
        axmin, aymin, axmax, aymax,
        np.full_like(axmin, b[0]), np.full_like(axmin, b[1]),
        np.full_like(axmin, b[2]), np.full_like(axmin, b[3]),
    )
    for i in range(len(rects)):
        w = max(0.0, min(axmax[i], b[2]) - max(axmin[i], b[0]))
        h = max(0.0, min(aymax[i], b[3]) - max(aymin[i], b[1]))
        assert got[i] == approx(w * h)


# --- A12/A13 properties (round 2) ---------------------------------------------


def _rect_mp(x0, y0, x1, y1):
    return [[np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)]]


@st.composite
def rect_sets(draw):
    n = draw(st.integers(2, 5))
    rects = []
    for _ in range(n):
        x0 = draw(st.floats(0, 50, allow_nan=False))
        y0 = draw(st.floats(0, 50, allow_nan=False))
        w = draw(st.floats(1, 30, allow_nan=False))
        h = draw(st.floats(1, 30, allow_nan=False))
        rects.append((x0, y0, x0 + w, y0 + h))
    return rects


def _exact_union_area_rects(rects):
    """Exact union area of axis-rects by coordinate-grid decomposition."""
    xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
    ys = sorted({r[1] for r in rects} | {r[3] for r in rects})
    total = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            cx, cy = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            if any(r[0] <= cx <= r[2] and r[1] <= cy <= r[3] for r in rects):
                total += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
    return total


@given(rect_sets())
@settings(max_examples=15, deadline=None)
def test_union_area_matches_exact_rect_decomposition(rects):
    geoms = [_rect_mp(*r) for r in rects]
    want = _exact_union_area_rects(rects)
    got = G.union_area(geoms, tol=2e-3)
    # guarantee is tol * UNION-BBOX area / 2 (documented), not tol * result
    bbox_area = (max(r[2] for r in rects) - min(r[0] for r in rects)) * (
        max(r[3] for r in rects) - min(r[1] for r in rects)
    )
    assert abs(got - want) <= 2e-3 * bbox_area / 2 + 1e-9


@given(rect_sets())
@settings(max_examples=15, deadline=None)
def test_intersection_area_matches_closed_form(rects):
    geoms = [_rect_mp(*r) for r in rects]
    x0 = max(r[0] for r in rects); y0 = max(r[1] for r in rects)
    x1 = min(r[2] for r in rects); y1 = min(r[3] for r in rects)
    want = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    got = G.intersection_area(geoms, tol=2e-3)
    assert abs(got - want) <= max(2e-3 * 2500.0, 1e-3)


@given(rect_sets())
@settings(max_examples=30, deadline=None)
def test_union_membership_consistent_with_area_decomposition(rects):
    geoms = [_rect_mp(*r) for r in rects]
    rng = np.random.default_rng(7)
    px = rng.uniform(-5, 90, 50)
    py = rng.uniform(-5, 90, 50)
    want = np.array(
        [any(r[0] < x < r[2] and r[1] < y < r[3] for r in rects) for x, y in zip(px, py)]
    )
    got = G.points_in_union(px, py, geoms)
    assert (got == want).all()
