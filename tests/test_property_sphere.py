"""Property-based tests (hypothesis) for the geodesic kernels in
core/sphere.py — global invariants no fixture can pin: rotation
equivariance (area/perimeter invariant, vector area equivariant),
the isoperimetric inequality, |V| <= A, and centroid containment for
convex spherical polygons."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pygridmap_spark.core import sphere as SPH


@st.composite
def spherical_convex_rings(draw):
    """Random small convex geodesic polygon: a spherical circle's
    inscribed n-gon around a random center, radius <= 25 deg (well
    inside the kernels' hemisphere-bounded domain), then expressed in
    lon/lat. Convex because all vertices lie on a small circle with
    angular radius < 90 deg and edges are great-circle chords."""
    clon = draw(st.floats(-179.0, 179.0, allow_nan=False))
    clat = draw(st.floats(-64.0, 64.0, allow_nan=False))
    r = np.radians(draw(st.floats(1.0, 25.0, allow_nan=False)))
    n = draw(st.integers(3, 10))
    phase = draw(st.floats(0.0, 2 * np.pi))
    ang = phase + np.linspace(0.0, 2.0 * np.pi, n + 1)[:-1]
    # local tangent basis at the center
    c = _xyz(clon, clat)
    e1 = np.cross(np.array([0.0, 0.0, 1.0]), c)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(c, e1)
    v = (
        np.cos(r) * c[None, :]
        + np.sin(r) * (np.cos(ang)[:, None] * e1 + np.sin(ang)[:, None] * e2)
    )
    lon = np.degrees(np.arctan2(v[:, 1], v[:, 0]))
    lat = np.degrees(np.arcsin(np.clip(v[:, 2], -1, 1)))
    return np.column_stack([lon, lat])


def _xyz(lon, lat):
    rl, rp = np.radians(lon), np.radians(lat)
    return np.array(
        [np.cos(rp) * np.cos(rl), np.cos(rp) * np.sin(rl), np.sin(rp)]
    )


def _rand_rotation(seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@given(spherical_convex_rings(), st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_rotation_equivariance(ring, seed):
    """Rotating the sphere must leave area and perimeter untouched and
    rotate the vector area by exactly the same rotation — the invariance
    the lon/lat-chart formulas could silently break at the poles/dateline
    (the rotated ring freely crosses both)."""
    xyz = SPH.ring_to_xyz(ring)
    R = _rand_rotation(seed)
    rot = xyz @ R.T
    a0 = SPH.spherical_ring_area(xyz)
    a1 = SPH.spherical_ring_area(rot)
    assert abs(a1 - a0) < 1e-10 * max(1.0, abs(a0))
    p0 = SPH.ring_perimeter(xyz)
    p1 = SPH.ring_perimeter(rot)
    assert abs(p1 - p0) < 1e-10 * max(1.0, p0)
    v0 = SPH.ring_vector_area(xyz)
    v1 = SPH.ring_vector_area(rot)
    assert np.allclose(v1, R @ v0, atol=1e-12)


@given(spherical_convex_rings())
@settings(max_examples=60, deadline=None)
def test_isoperimetric_inequality_and_vector_bound(ring):
    """On the unit sphere P^2 >= A(4pi - A) with equality only for caps
    (so the compactness quotient lives in (0, 1]), and the vector area's
    magnitude never exceeds the scalar area (|int rhat| <= int 1)."""
    xyz = SPH.ring_to_xyz(ring)
    a = abs(SPH.spherical_ring_area(xyz))
    p = SPH.ring_perimeter(xyz)
    assert p * p >= a * (4 * np.pi - a) - 1e-12
    v = SPH.ring_vector_area(xyz)
    assert np.linalg.norm(v) <= a + 1e-12


@given(spherical_convex_rings())
@settings(max_examples=60, deadline=None)
def test_centroid_inside_convex_ring_and_depth_positive(ring):
    """The exact centroid of a convex spherical polygon lies inside it
    (winding containment via the PIP membership the engine itself uses),
    and its border depth is strictly positive and <= the circumradius."""
    c = SPH.multipolygon_centroid_xyz([[ring]])
    assert c is not None
    # containment: the centroid's min boundary distance is positive AND
    # smaller than pi/2 (sanity), and the centroid is on the ring's side:
    # its distance to the ring center is below the vertex distance
    xyz = SPH.ring_to_xyz(ring)
    d = SPH.min_arc_dist(c[None, :], xyz)[0]
    assert d > 0.0
    center = xyz.mean(axis=0)
    center /= np.linalg.norm(center)
    cen_ang = np.arccos(np.clip(c @ center, -1, 1))
    vert_ang = np.arccos(np.clip(xyz @ center, -1, 1)).min()
    assert cen_ang < vert_ang  # strictly interior of the inscribed cap
