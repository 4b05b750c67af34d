"""Spherical polygon kernel: point-in-polygon on the unit sphere.

Geodesic polygons — rings of (lon, lat) vertices joined by great-circle
arcs (< 180 deg each) — tested by the tangent-plane winding number: for a
point ``p`` and ring edge ``(a, b)``, project both endpoints onto the
tangent plane at ``p`` and accumulate the signed angle between them; the
sum is ~±2π when ``p`` is inside the ring and ~0 outside. Rings combine
even-odd (holes XOR), matching the planar kernel's convention
(core/geometry.points_in_polygon) and WKB's ring layout.

Domain of validity (documented, not checked row-wise): each ring must lie
within an open hemisphere and must not contain the test point's antipode
— the standard winding-number caveat on the sphere. Web-scale zone layers
(admin areas, tiles, coverage footprints) satisfy this by orders of
magnitude.

All public spherical-geometry math (gnomonic straightness of geodesics,
tangent-plane winding); vectorized over points with a Python loop only
over edges, so it runs slab-sized inside Arrow batches like the planar
kernel.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "lonlat_to_xyz",
    "ring_to_xyz",
    "points_in_spherical_ring",
    "points_in_spherical_polygon",
    "min_arc_dist",
    "bounding_cap",
    "rings_to_arcs",
    "arcs_cross_pairs",
    "spherical_polygons_intersect",
    "spherical_ring_area",
    "spherical_polygon_area",
    "spherical_multipolygon_area",
    "solid_angle_uv_rect",
    "arc_lengths",
    "ring_perimeter",
    "multipolygon_perimeter",
    "ring_vector_area",
    "multipolygon_centroid_xyz",
    "multipolygon_stats",
    "EARTH_RADIUS_KM",
]

#: mean Earth radius (IUGG R1), km — the steradian->km^2 scale factor
EARTH_RADIUS_KM = 6371.0088


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(N,) degrees -> (N, 3) unit vectors."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    cp = np.cos(phi)
    return np.column_stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)])


def ring_to_xyz(ring: np.ndarray) -> np.ndarray:
    """(K, 2) lon/lat ring -> (K, 3) unit vectors, closing vertex dropped
    (the edge loop wraps)."""
    ring = np.asarray(ring, np.float64)
    if len(ring) > 1 and ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]:
        ring = ring[:-1]
    return lonlat_to_xyz(ring[:, 0], ring[:, 1])


def points_in_spherical_ring(p: np.ndarray, ring_xyz: np.ndarray) -> np.ndarray:
    """Winding-number containment of (P, 3) unit points in one geodesic
    ring given as (K, 3) unit vertices (open — no repeated closing
    vertex). Returns (P,) bool. Points exactly on an edge or vertex may
    resolve either way (measure zero, same caveat as the planar ray
    cast)."""
    p = np.asarray(p, np.float64)
    k = len(ring_xyz)
    if k < 3:
        return np.zeros(len(p), dtype=bool)
    wind = np.zeros(len(p), dtype=np.float64)
    # tangent-plane projections: loop over edges (K small), vectorize
    # over points; ta/tb are (P, 3) temporaries per step
    a = ring_xyz[-1]
    adot = p @ a
    ta = a[None, :] - adot[:, None] * p
    for e in range(k):
        b = ring_xyz[e]
        bdot = p @ b
        tb = b[None, :] - bdot[:, None] * p
        cross = np.cross(ta, tb)
        sin_ang = np.einsum("ij,ij->i", cross, p)
        cos_ang = np.einsum("ij,ij->i", ta, tb)
        wind += np.arctan2(sin_ang, cos_ang)
        ta = tb
    return np.abs(wind) > np.pi


def points_in_spherical_polygon(p: np.ndarray, rings_lonlat: list) -> np.ndarray:
    """Even-odd over all rings of one polygon (outer shell + holes),
    rings given as (K, 2) lon/lat arrays (WKB layout)."""
    inside = np.zeros(len(p), dtype=bool)
    for ring in rings_lonlat:
        inside ^= points_in_spherical_ring(p, ring_to_xyz(ring))
    return inside


def spherical_ring_area(ring_xyz: np.ndarray) -> float:
    """Signed solid angle (steradians) of one geodesic ring given as
    (K, 3) unit vertices (open — no repeated closing vertex); positive
    for counter-clockwise winding seen from outside the sphere.

    Fan triangulation from vertex 0 with the Van Oosterom & Strackee /
    Eriksson signed-triangle excess — for unit vectors (a, b, c):

        omega = 2 * atan2( a . (b x c),  1 + a.b + b.c + c.a )

    ("The solid angle of a plane triangle", IEEE Trans. Biomed. Eng.
    BME-30, 1983 — public formula, also the basis of s2geometry's
    S2::Area). Signed fan terms cancel outside the ring, so the sum is
    exact for arbitrary (also non-convex) simple rings under the module's
    hemisphere-bounded domain contract. Vectorized over the fan; no
    Python loop.

    Reference counterpart: the planar shoelace ``ring_signed_area``
    (core/geometry.py) — this is its geodesic twin, replacing the
    reference's delegation to GEOS/pyproj planar area after reprojection.
    """
    v = np.asarray(ring_xyz, np.float64)
    if len(v) < 3:
        return 0.0
    a = v[0]
    b = v[1:-1]
    c = v[2:]
    triple = np.cross(b, c) @ a
    denom = 1.0 + b @ a + np.einsum("ij,ij->i", b, c) + c @ a
    return float(np.sum(2.0 * np.arctan2(triple, denom)))


def spherical_polygon_area(rings_lonlat: list) -> float:
    """Even-odd area in steradians: |outer| minus the |holes| (the planar
    kernel's ``polygon_area`` convention, core/geometry.py:48), clamped
    at 0; rings as (K, 2) lon/lat arrays (WKB layout), any orientation."""
    if not rings_lonlat:
        return 0.0
    area = abs(spherical_ring_area(ring_to_xyz(rings_lonlat[0])))
    for hole in rings_lonlat[1:]:
        area -= abs(spherical_ring_area(ring_to_xyz(hole)))
    return max(area, 0.0)


def spherical_multipolygon_area(polys: list) -> float:
    """Sum of :func:`spherical_polygon_area` over a multipolygon's
    polygons (list of lists of rings)."""
    return float(sum(spherical_polygon_area(p) for p in polys))


def solid_angle_uv_rect(u0, v0, u1, v1):
    """EXACT solid angle (steradians) of the spherical quad that is the
    central projection of the planar rect [u0,u1] x [v0,v1] on a unit-
    distance tangent plane (an S2 cube-face gnomonic chart): the classic
    pyramid solid-angle closed form, by inclusion-exclusion of

        f(u, v) = atan2( u*v, sqrt(1 + u^2 + v^2) )

    over the 4 corners. Pure scalar/numpy arithmetic — the same formula
    ships as a Catalyst column expression (functions/s2.cell_area_sr) and
    as the DuckDB oracle twin; sanity anchor: the full face [-1,1]^2
    gives 4*atan2(1, sqrt(3)) = 2*pi/3."""
    u0 = np.asarray(u0, np.float64)
    v0 = np.asarray(v0, np.float64)
    u1 = np.asarray(u1, np.float64)
    v1 = np.asarray(v1, np.float64)

    def f(u, v):
        return np.arctan2(u * v, np.sqrt(1.0 + u * u + v * v))

    return f(u1, v1) - f(u0, v1) - f(u1, v0) + f(u0, v0)


def arc_lengths(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Great-circle angles (radians) between row-paired (N, 3) vectors —
    atan2(|a x b|, a . b), which is norm-free (the two magnitudes cancel)
    and stable at both the near-zero and near-antipodal ends where acos
    of a dot product loses half the mantissa."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    cr = np.cross(a, b)
    return np.arctan2(
        np.sqrt(np.einsum("ij,ij->i", cr, cr)), np.einsum("ij,ij->i", a, b)
    )


def ring_perimeter(ring_xyz: np.ndarray) -> float:
    """Geodesic boundary length (radians) of one ring given as (K, 3)
    vectors, open or closed — the wrap edge of an already-closed ring is
    a zero-length arc, so no special-casing. The geodesic twin of the
    planar ring perimeter (GEOS ``.length`` semantics on the sphere)."""
    v = np.asarray(ring_xyz, np.float64)
    if len(v) < 2:
        return 0.0
    return float(np.sum(arc_lengths(v, np.roll(v, -1, axis=0))))


def multipolygon_perimeter(polys: list) -> float:
    """Total geodesic boundary length (radians) of a multipolygon (list
    of lists of (K, 2) lon/lat rings): outer rings AND holes both bound
    the region, so both count — the GEOS ``.length`` convention."""
    return float(
        sum(
            ring_perimeter(ring_to_xyz(ring))
            for poly in polys
            for ring in poly
            if len(ring) >= 2
        )
    )


def ring_vector_area(ring_xyz: np.ndarray) -> np.ndarray:
    """Signed VECTOR area of one geodesic ring — the integral of the unit
    position over the enclosed spherical region. By Stokes,
    ``int_S rhat dOmega = (1/2) oint r x dr`` (the classic vector-area
    identity, surface-independent), and along a great-circle edge
    ``r(t) x r'(t)`` is CONSTANT — the edge's unit normal — so the whole
    line integral collapses to the exact per-edge closed form

        V = (1/2) * sum_i theta_i * nhat_i
          = (1/2) * sum_i atan2(|a x b|, a . b) / |a x b| * (a x b)

    (norm-free in a and b like arc_lengths). Orientation-signed with the
    same convention as :func:`spherical_ring_area`; open or closed rings
    (a closed ring's wrap edge is a zero arc with zero cross). Sanity
    anchor: the octant gives exactly (pi/4, pi/4, pi/4).
    """
    v = np.asarray(ring_xyz, np.float64)
    if len(v) < 3:
        return np.zeros(3)
    b = np.roll(v, -1, axis=0)
    cr = np.cross(v, b)
    ncr = np.sqrt(np.einsum("ij,ij->i", cr, cr))
    th = np.arctan2(ncr, np.einsum("ij,ij->i", v, b))
    # theta/|cross| -> theta * nhat; a zero cross has theta == 0 (term 0)
    w = th / np.where(ncr == 0.0, 1.0, ncr)
    return 0.5 * np.einsum("i,ij->j", w, cr)


def multipolygon_centroid_xyz(polys: list) -> np.ndarray | None:
    """Exact spherical centroid (unit vector) of a multipolygon (list of
    lists of (K, 2) lon/lat rings): the direction of the region's vector
    area under the same even-odd |outer| - |holes| convention as
    :func:`spherical_polygon_area` — each ring's vector area is oriented
    positive by the sign of its own scalar excess, outers add, holes
    subtract. ``None`` for empty input or a direction-degenerate region
    (|V| ~ 0, e.g. the whole sphere), never a garbage direction."""
    total = np.zeros(3)
    for rings in polys:
        for k, ring in enumerate(rings):
            xyz = ring_to_xyz(ring)
            a = spherical_ring_area(xyz)
            if a == 0.0:
                continue
            vec = ring_vector_area(xyz) * np.sign(a)
            total += vec if k == 0 else -vec
    n = float(np.sqrt(total @ total))
    if n < 1e-12:
        return None
    return total / n


def multipolygon_stats(polys: list) -> tuple:
    """``(area_sr, perimeter_rad, centroid_xyz | None)`` in ONE pass:
    each ring is lifted to unit vectors ONCE and feeds all three kernels
    — at lake scale the WKB decode + lon/lat->xyz lift dominates the
    per-zone cost, so chaining geodesic_area/length/centroid pays it
    three times for nothing. Accumulation order mirrors
    :func:`spherical_multipolygon_area` / :func:`multipolygon_perimeter`
    / :func:`multipolygon_centroid_xyz` term for term, so the results
    are bit-identical to the separate kernels (pinned in tests)."""
    area = 0.0
    perim = 0.0
    total = np.zeros(3)
    for rings in polys:
        parea = 0.0
        for k, ring in enumerate(rings):
            xyz = ring_to_xyz(ring)
            a = spherical_ring_area(xyz)
            parea = abs(a) if k == 0 else parea - abs(a)
            if len(xyz) >= 2:
                perim += ring_perimeter(xyz)
            if a != 0.0:
                vec = ring_vector_area(xyz) * np.sign(a)
                total += vec if k == 0 else -vec
        area += max(parea, 0.0) if rings else 0.0
    n = float(np.sqrt(total @ total))
    return float(area), float(perim), (total / n if n >= 1e-12 else None)


def _pdot(p: np.ndarray, v) -> np.ndarray:
    # ELEMENTWISE dot, deliberately not p @ v: BLAS matvec reductions
    # (FMA, blocked sums) are not bit-identical to the left-to-right
    # px*vx + py*vy + pz*vz an SQL oracle evaluates — a 1-ulp drift the
    # floor-rounding layer cannot always absorb (the stay_points lesson).
    return p[:, 0] * v[0] + p[:, 1] * v[1] + p[:, 2] * v[2]


def _edge_dist(p, a, da, b, db):
    """Distance of (P, 3) points to ONE great-circle arc (a, b), given the
    precomputed endpoint angles. Foot-on-arc math with every reduction
    written elementwise in SQL evaluation order (see _pdot); degenerate
    edges (|n| ~ 0: repeated or antipodal vertices) fall back to the
    endpoint distance."""
    nx = a[1] * b[2] - a[2] * b[1]
    ny = a[2] * b[0] - a[0] * b[2]
    nz = a[0] * b[1] - a[1] * b[0]
    nn = np.sqrt(nx * nx + ny * ny + nz * nz)
    if nn <= 1e-15:
        return np.minimum(da, db)
    nh = np.array([nx / nn, ny / nn, nz / nn])
    axp = (
        (a[1] * p[:, 2] - a[2] * p[:, 1]) * nh[0]
        + (a[2] * p[:, 0] - a[0] * p[:, 2]) * nh[1]
        + (a[0] * p[:, 1] - a[1] * p[:, 0]) * nh[2]
    )
    pxb = (
        (p[:, 1] * b[2] - p[:, 2] * b[1]) * nh[0]
        + (p[:, 2] * b[0] - p[:, 0] * b[2]) * nh[1]
        + (p[:, 0] * b[1] - p[:, 1] * b[0]) * nh[2]
    )
    on_arc = (axp >= 0.0) & (pxb >= 0.0)
    perp = np.arcsin(np.clip(np.abs(_pdot(p, nh)), 0.0, 1.0))
    return np.where(on_arc, perp, np.minimum(da, db))


def _arc_loop(p: np.ndarray, verts: np.ndarray, closed: bool) -> np.ndarray:
    """Shared edge loop of min_arc_dist (closed ring) and
    min_polyline_arc_dist (open polyline) — ONE copy of the trickiest
    numerics in the repo, IEEE-ordered for oracle parity."""
    p = np.asarray(p, np.float64)
    k = len(verts)
    out = np.full(len(p), np.pi, dtype=np.float64)
    if k == 0:
        return out
    a = verts[-1] if closed else verts[0]
    da = np.arccos(np.clip(_pdot(p, a), -1.0, 1.0))
    if not closed and k == 1:
        return da
    for e in range(0 if closed else 1, k):
        b = verts[e]
        db = np.arccos(np.clip(_pdot(p, b), -1.0, 1.0))
        np.minimum(out, _edge_dist(p, a, da, b, db), out=out)
        a, da = b, db
    return out


def min_arc_dist(p: np.ndarray, ring_xyz: np.ndarray) -> np.ndarray:
    """Minimum angular distance (radians) from each of (P, 3) unit points
    to the boundary of one geodesic ring given as (K, 3) unit vertices
    (open). Standard point-to-arc math: for edge (a, b) with great-circle
    normal n = a x b, the perpendicular foot lies on the arc iff
    (a x p)·n >= 0 and (p x b)·n >= 0, in which case the distance is
    asin(|p·n̂|); otherwise it is the nearer endpoint angle. Degenerate
    edges (|n| ~ 0: repeated or antipodal vertices) fall back to the
    endpoint distance. Vectorized over points, loop over edges; every
    reduction elementwise in SQL order (see _pdot)."""
    return _arc_loop(p, ring_xyz, closed=True)


def bounding_cap(rings_lonlat: list) -> tuple[np.ndarray, float]:
    """Small enclosing cap of a geodesic polygon: (center unit vector,
    angular radius). Center = normalized vertex mean; radius = max vertex
    angle + half the longest edge arc (any point of an arc lies within
    half its length of an endpoint), so the cap provably contains every
    boundary and interior point of a hemisphere-bounded ring."""
    vs = [ring_to_xyz(r) for r in rings_lonlat if len(r) >= 3]
    if not vs:
        return np.array([1.0, 0.0, 0.0]), 0.0
    allv = np.vstack(vs)
    c = allv.sum(axis=0)
    norm = np.linalg.norm(c)
    if norm < 1e-12:  # symmetric ring (e.g. a full great circle): no cap
        return np.array([1.0, 0.0, 0.0]), float(np.pi)
    c = c / norm
    vmax = float(np.arccos(np.clip(allv @ c, -1.0, 1.0)).max())
    emax = 0.0
    for v in vs:
        nxt = np.roll(v, -1, axis=0)
        arcs = np.arccos(np.clip(np.einsum("ij,ij->i", v, nxt), -1.0, 1.0))
        emax = max(emax, float(arcs.max()))
    return c, min(vmax + emax / 2.0, float(np.pi))


def rings_to_arcs(rings_lonlat: list) -> tuple[np.ndarray, np.ndarray]:
    """Every directed boundary arc of a multipolygon's rings: two (E, 3)
    unit-vector arrays (arc starts, arc ends). Degenerate zero-length
    arcs (repeated vertices) are dropped."""
    starts, ends = [], []
    for r in rings_lonlat:
        v = ring_to_xyz(r)
        if len(v) < 2:
            continue
        starts.append(v)
        ends.append(np.roll(v, -1, axis=0))
    if not starts:
        return np.zeros((0, 3)), np.zeros((0, 3))
    a = np.vstack(starts)
    b = np.vstack(ends)
    m = ~(a == b).all(axis=1)  # exact duplicate endpoints only
    return a[m], b[m]


def arcs_cross_pairs(
    a1: np.ndarray, a2: np.ndarray, b1: np.ndarray, b2: np.ndarray
) -> np.ndarray:
    """Transversal crossings of two families of great-circle arcs
    (each < 180 deg): (A, 3) x (B, 3) -> (A, B) bool.

    No antipodal ambiguity by construction: when arc b's endpoints
    straddle plane(a) (s1*s2 < 0), the point where arc b crosses that
    plane is the POSITIVE combination x = |s2|*b1 + |s1|*b2 (na.x = 0
    exactly in sign terms), which lies on arc b automatically; the arcs
    cross iff x also lies within arc a, tested with the two lune signs
    x.(na x a1) >= 0 and x.(a2 x na) >= 0. Endpoint tangencies (a zero
    sign anywhere) are NOT reported — degenerate contact is outside the
    kernel's generic-position contract, like the planar kernel."""
    a1 = np.asarray(a1, np.float64)
    a2 = np.asarray(a2, np.float64)
    b1 = np.asarray(b1, np.float64)
    b2 = np.asarray(b2, np.float64)
    if len(a1) == 0 or len(b1) == 0:
        return np.zeros((len(a1), len(b1)), dtype=bool)
    na = np.cross(a1, a2)  # (A, 3)
    nb = np.cross(b1, b2)  # (B, 3)
    s1 = na @ b1.T  # (A, B): b1 vs plane(a)
    s2 = na @ b2.T
    s3 = a1 @ nb.T  # (A, B): a1 vs plane(b)
    s4 = a2 @ nb.T
    straddle = (s1 * s2 < 0.0) & (s3 * s4 < 0.0)
    if not straddle.any():
        return straddle
    # crossing point of arc b with plane(a), as a positive combination
    x = (
        np.abs(s2)[:, :, None] * b1[None, :, :]
        + np.abs(s1)[:, :, None] * b2[None, :, :]
    )  # (A, B, 3)
    u1 = np.cross(na, a1)  # (A, 3): x on arc a iff x.u1 >= 0 ...
    u2 = np.cross(a2, na)  # ... and x.u2 >= 0
    c1 = np.einsum("abk,ak->ab", x, u1)
    c2 = np.einsum("abk,ak->ab", x, u2)
    return straddle & (c1 > 0.0) & (c2 > 0.0)


def spherical_polygons_intersect(
    rings_a: list,
    rings_b: list,
    rep_a: np.ndarray | None = None,
    rep_b: np.ndarray | None = None,
) -> bool:
    """Do the INTERIORS of two geodesic multipolygons intersect? Exact
    for generic-position inputs (no shared boundary segments / endpoint
    tangencies — the planar kernel's contract): interiors intersect iff
    (i) a boundary vertex of one lies strictly inside the other,
    (ii) a known interior representative point of one lies in the other
    (catches containment with no vertex inside — e.g. identical zones;
    pass any strictly-interior point such as a center-contained cover
    cell's center), or (iii) boundary arcs cross transversally.
    Vertex/representative tests are restricted to the other polygon's
    bounding cap first (the winding number is hemisphere-scoped)."""
    polys_a = rings_a if rings_a and isinstance(rings_a[0], list) else [rings_a]
    polys_b = rings_b if rings_b and isinstance(rings_b[0], list) else [rings_b]
    flat_a = [r for poly in polys_a for r in poly]
    flat_b = [r for poly in polys_b for r in poly]

    def _any_inside(points: np.ndarray, polys: list, flat: list) -> bool:
        if len(points) == 0:
            return False
        c, th = bounding_cap(flat)
        near = points @ c >= np.cos(min(th + 1e-12, np.pi))
        if not near.any():
            return False
        p = points[near]
        inside = np.zeros(len(p), dtype=bool)
        for poly in polys:
            inside |= points_in_spherical_polygon(p, poly)
        return bool(inside.any())

    va = np.vstack([ring_to_xyz(r) for r in flat_a])
    vb = np.vstack([ring_to_xyz(r) for r in flat_b])
    if rep_a is not None:
        va = np.vstack([va, np.asarray(rep_a, np.float64).reshape(-1, 3)])
    if rep_b is not None:
        vb = np.vstack([vb, np.asarray(rep_b, np.float64).reshape(-1, 3)])
    if _any_inside(va, polys_b, flat_b) or _any_inside(vb, polys_a, flat_a):
        return True
    a1, a2 = rings_to_arcs(flat_a)
    b1, b2 = rings_to_arcs(flat_b)
    return bool(arcs_cross_pairs(a1, a2, b1, b2).any())


def min_polyline_arc_dist(p: np.ndarray, line_xyz: np.ndarray) -> np.ndarray:
    """Minimum angular distance (radians) from each of (P, 3) unit points
    to an OPEN polyline given as (K, 3) unit vertices — the
    :func:`min_arc_dist` math without the ring-closing wrap edge (routes,
    coastline segments, transects). A single-vertex polyline degenerates
    to the point distance; empty input returns pi. Shares the IEEE-ordered
    edge loop (:func:`_arc_loop`) with the ring form — the expression
    tree an SQL oracle can restate bit-for-bit."""
    return _arc_loop(p, line_xyz, closed=False)
