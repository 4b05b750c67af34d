"""S2 polyfill (functions/s2.polyfill) + the spherical PIP kernel
(core/sphere.py): winding-number containment pins, polyfill vs a
cap-restricted whole-sphere brute enumeration across face edges / poles /
antimeridian / holes / multi-part, degenerate inputs, and the chunking /
repartition identity guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.functions import s2 as S2

LEVEL = 7
N = 1 << LEVEL


# --- kernel ------------------------------------------------------------------

def test_winding_basics():
    ring = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 15.0], [0.0, 15.0], [0.0, 0.0]])
    p_in = SPH.lonlat_to_xyz(np.array([10.0, 1.0, 19.0]), np.array([7.0, 1.0, 14.0]))
    p_out = SPH.lonlat_to_xyz(np.array([-5.0, 25.0, 10.0]), np.array([7.0, 7.0, 30.0]))
    assert SPH.points_in_spherical_ring(p_in, SPH.ring_to_xyz(ring)).all()
    assert not SPH.points_in_spherical_ring(p_out, SPH.ring_to_xyz(ring)).any()


def test_winding_pole_ring():
    # ring of constant latitude encircling the north pole: inside means
    # "poleward", with no special-casing
    lons = np.linspace(0, 360, 37)[:-1]
    cap = np.column_stack([lons, np.full(36, 80.0)])
    p = SPH.lonlat_to_xyz(np.array([50.0, 123.0, 50.0]), np.array([89.0, 85.0, 70.0]))
    got = SPH.points_in_spherical_ring(p, SPH.ring_to_xyz(cap))
    assert list(got) == [True, True, False]


def test_winding_hole_even_odd():
    ring = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 15.0], [0.0, 15.0], [0.0, 0.0]])
    hole = np.array([[5.0, 5.0], [15.0, 5.0], [15.0, 10.0], [5.0, 10.0], [5.0, 5.0]])
    p = SPH.lonlat_to_xyz(np.array([10.0, 2.0]), np.array([7.0, 2.0]))
    got = SPH.points_in_spherical_polygon(p, [ring, hole])
    assert list(got) == [False, True]


def test_bounding_cap_contains_boundary():
    rng = np.random.default_rng(9)
    for _ in range(20):
        k = rng.integers(4, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        clon, clat = rng.uniform(-180, 180), rng.uniform(-60, 60)
        rad = rng.uniform(2.0, 25.0, k)
        ring = np.column_stack(
            [clon + rad * np.cos(ang), clat + rad * np.sin(ang)]
        )
        ring = np.vstack([ring, ring[:1]])
        c, th = SPH.bounding_cap([ring])
        # densely sample each edge chordally; every sample within the cap
        v = SPH.ring_to_xyz(ring)
        t = np.linspace(0, 1, 33)[:, None]
        for e in range(len(v)):
            seg = v[e] * (1 - t) + v[(e + 1) % len(v)] * t
            seg /= np.linalg.norm(seg, axis=1, keepdims=True)
            assert (seg @ c >= np.cos(th) - 1e-12).all()


# --- polyfill vs brute ---------------------------------------------------------

def _brute(rings):
    f = np.repeat(np.arange(6, dtype=np.int64), N * N)
    i = np.tile(np.repeat(np.arange(N, dtype=np.int64), N), 6)
    j = np.tile(np.arange(N, dtype=np.int64), 6 * N)
    u = S2._np_st_to_uv((i + 0.5) / N)
    v = S2._np_st_to_uv((j + 0.5) / N)
    x, y, z = S2._np_face_uv_to_xyz(f, u, v)
    nn = np.sqrt(x * x + y * y + z * z)
    p = np.column_stack([x / nn, y / nn, z / nn])
    # the winding test is hemisphere-scoped: restrict the enumeration to
    # the polygon's bounding cap (as the operator does) so the antipodal
    # mirror region is excluded
    c, th = SPH.bounding_cap(rings)
    keep = p @ c >= np.cos(min(th * 1.0000001 + 1e-12, np.pi))
    f, i, j, p = f[keep], i[keep], j[keep], p[keep]
    inside = np.zeros(len(p), dtype=bool)
    for r in rings:
        inside ^= SPH.points_in_spherical_ring(p, SPH.ring_to_xyz(r))
    return set(zip(f[inside], i[inside], j[inside]))


def _cmp(spark, fixtures, **kw):
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": list(range(len(fixtures))),
                "wkb": [WKB.encode_multipolygon(mp) for mp in fixtures],
            }
        )
    )
    got = S2.polyfill(polys, LEVEL, **kw).toPandas()
    for pid, mp in enumerate(fixtures):
        rings = [r for poly in mp for r in poly]
        g = set(
            zip(
                got[got.poly_id == pid].s2_face.astype(int),
                got[got.poly_id == pid].s2_i,
                got[got.poly_id == pid].s2_j,
            )
        )
        assert g == _brute(rings), f"poly {pid}"
    # compact ids consistent with the Hilbert layout
    comp = (got.s2_face.to_numpy().astype(np.int64) << (2 * LEVEL)) + S2._np_hilbert_d(
        got.s2_i.to_numpy(), got.s2_j.to_numpy(), LEVEL
    )
    assert (comp == got.s2_compact.to_numpy()).all()
    return got


def _fixtures():
    lons = np.linspace(0, 360, 25)[:-1]
    shell = np.array([[-170.0, -20.0], [-140.0, -20.0], [-140.0, 10.0],
                      [-170.0, 10.0], [-170.0, -20.0]])
    hole = np.array([[-160.0, -10.0], [-150.0, -10.0], [-150.0, 0.0],
                     [-160.0, 0.0], [-160.0, -10.0]])
    p1 = np.array([[170.0, -5.0], [179.0, -5.0], [179.0, 5.0], [170.0, 5.0],
                   [170.0, -5.0]])
    p2 = np.array([[-179.0, -5.0], [-170.0, -5.0], [-170.0, 5.0],
                   [-179.0, 5.0], [-179.0, -5.0]])
    return [
        # quad crossing the lon-45 cube edge
        [[np.array([[30.0, -10.0], [60.0, -10.0], [60.0, 20.0], [30.0, 20.0],
                    [30.0, -10.0]])]],
        # polar ring (north pole inside; winding handles it unmodified)
        [[np.column_stack([lons, np.full(24, 75.0)])]],
        # shell + hole
        [[shell, hole]],
        # two-part multipolygon straddling the antimeridian
        [[p1], [p2]],
        # southern high-latitude concave star
        [[_star(77)]],
    ]


def _star(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(6, 12))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(4.0, 18.0, k)
    ring = np.column_stack([20.0 + rad * np.cos(ang), -70.0 + rad * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def test_polyfill_vs_brute(spark):
    _cmp(spark, _fixtures())


def test_polyfill_chunked_repartitioned_identical(spark):
    fixtures = _fixtures()[:2]
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": [0, 1],
                "wkb": [WKB.encode_multipolygon(mp) for mp in fixtures],
            }
        )
    )
    base = S2.polyfill(polys, LEVEL).toPandas()
    alt = S2.polyfill(
        polys, LEVEL, candidates_partitions=7, max_span=17
    ).toPandas()
    key = lambda df: sorted(zip(df.poly_id, df.s2_compact))
    assert key(alt) == key(base)


def test_polyfill_hemisphere_scale_polygon(spark):
    # cap too wide for any cover level -> whole-sphere candidate fallback
    lons = np.linspace(0, 360, 25)[:-1]
    ring = np.column_stack([lons, np.full(24, 8.0)])  # most of the north
    _cmp(spark, [[[ring]]])


def test_polyfill_degenerate(spark):
    sliver = [[np.array([[10.0001, 5.0001], [10.0002, 5.0001],
                         [10.0002, 5.0002], [10.0001, 5.0002],
                         [10.0001, 5.0001]])]]
    polys = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0, 1],
                      "wkb": [WKB.encode_multipolygon(sliver), None]})
    )
    out = S2.polyfill(polys, LEVEL).toPandas()
    assert len(out) == 0


def test_polyfill_quarter_sphere_cap_guard(spark):
    """A polygon whose bounding cap reaches a quarter-sphere (>= 90 deg)
    must FAIL CLOSED: beyond that the cap restriction can no longer
    exclude the antipodal winding mirror (pi - pad <= pad), so silent
    mirror tags would be possible — pinned regression from review: a
    polar ring at lat +0.5 (pad ~97 deg) previously emitted mirror cells
    south of lat -0.5 as inside."""
    import pytest as _pytest

    lons = np.linspace(0, 360, 25)[:-1]
    ring = np.column_stack([lons, np.full(24, 0.5)])
    polys = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0],
                      "wkb": [WKB.encode_multipolygon([[np.vstack([ring, ring[:1]])]])]})
    )
    with _pytest.raises(Exception, match="antipodal mirror"):
        S2.polyfill(polys, LEVEL).count()
    with _pytest.raises(Exception, match="antipodal mirror"):
        S2.polyfill(polys, LEVEL, classify=True).count()
    with _pytest.raises(Exception, match="antipodal mirror"):
        S2.covering(polys, max_cells=64, max_level=8).count()


def test_polyfill_wide_cap_below_quarter_sphere_still_exact(spark):
    """Caps in the whole-sphere-fallback band but below 90 deg (here a
    polar ring at lat 15: pad ~82 deg) stay exact: the mirror lies
    beyond pi - pad > pad and the cap prefilter excludes it."""
    lons = np.linspace(0, 360, 25)[:-1]
    ring = np.column_stack([lons, np.full(24, 15.0)])
    got = _cmp(spark, [[[ring]]])
    # explicit mirror check: no cell center south of -10 deg latitude
    u = S2._np_st_to_uv((got.s2_j.to_numpy() + 0.5) / N)
    su = S2._np_st_to_uv((got.s2_i.to_numpy() + 0.5) / N)
    x, y, z = S2._np_face_uv_to_xyz(got.s2_face.to_numpy().astype(np.int64), su, u)
    lat = np.degrees(np.arcsin(z / np.sqrt(x * x + y * y + z * z)))
    assert lat.min() > 10.0


def test_cell_corners_and_outline_wkb(spark):
    """Corners bound the cell: the center is inside its own outline, a
    neighbor's center is not; adjacent cells share corner coordinates;
    the DataFrame route emits decodable closed rings."""
    face = np.array([2, 2, 4], dtype=np.int64)
    i = np.array([10, 11, 77], dtype=np.int64)
    j = np.array([20, 20, 40], dtype=np.int64)
    lon, lat = S2.py_cell_corners(face, i, j, LEVEL)
    # shared edge between (10,20) and (11,20): corners 1,2 of the first
    # equal corners 0,3 of the second
    assert np.allclose([lon[0, 1], lat[0, 1]], [lon[1, 0], lat[1, 0]])
    assert np.allclose([lon[0, 2], lat[0, 2]], [lon[1, 3], lat[1, 3]])
    clon, clat = S2.py_cell_center(face, i, j, LEVEL)
    df = spark.createDataFrame(
        pd.DataFrame({"s2_face": face, "s2_i": i, "s2_j": j})
    )
    out = S2.cell_outline_wkb(df, LEVEL).toPandas()
    for r in range(3):
        mp = WKB.decode_multipolygon(bytes(out.cell_wkb[r]))
        ring = mp[0][0]
        assert len(ring) == 5 and (ring[0] == ring[-1]).all()
        ctr = SPH.lonlat_to_xyz(np.array([clon[r]]), np.array([clat[r]]))
        assert SPH.points_in_spherical_polygon(ctr, [ring])[0]
        other = SPH.lonlat_to_xyz(np.array([clon[(r + 1) % 3]]),
                                  np.array([clat[(r + 1) % 3]]))
        assert not SPH.points_in_spherical_polygon(other, [ring])[0]


def test_cells_to_multipolygon_kernel():
    """Topology of the exact cell dissolve: rect block -> 4-vertex ring
    (collinear seam vertices dropped), donut -> shell + hole, disjoint
    cells -> two polygons, duplicates deduped; on EVERY face (incl. the
    orientation-reversing face-5 chart) covered-cell centers are inside
    the outline and the hole / far centers are not (even-odd is
    orientation-insensitive)."""
    block = S2.py_cells_to_multipolygon(
        0, np.repeat(np.arange(10, 13), 2), np.tile(np.arange(4, 6), 3), 5
    )
    assert len(block) == 1 and [len(r) for r in block[0]] == [4]
    assert len(S2.py_cells_to_multipolygon(3, np.array([0, 5]), np.array([0, 5]), 5)) == 2
    dup = S2.py_cells_to_multipolygon(1, np.array([3, 3, 4]), np.array([3, 3, 3]), 5)
    assert len(dup) == 1 and len(dup[0][0]) == 4
    ij = [(a, b) for a in range(5, 8) for b in range(9, 12) if not (a == 6 and b == 10)]
    ii = np.array([a for a, _ in ij])
    jj = np.array([b for _, b in ij])
    for face in range(6):
        mp = S2.py_cells_to_multipolygon(face, ii, jj, 5)
        assert len(mp) == 1 and len(mp[0]) == 2  # shell + hole
        clon, clat = S2.py_cell_center(
            np.full(len(ij) + 2, face),
            np.append(ii, [6, 20]), np.append(jj, [10, 25]), 5,
        )
        p = SPH.lonlat_to_xyz(clon, clat)
        inside = SPH.points_in_spherical_polygon(p, mp[0])
        assert inside[: len(ij)].all() and not inside[len(ij):].any()


def test_cells_to_wkb_matches_local_kernel(spark):
    """The distributed operator (one grouped exchange, per-batch Arrow
    fee) emits byte-identical WKB to the local kernel for every
    (group, face), with consistent n_polys / n_vertices; a cross-face
    group emits one row per face."""
    rng = np.random.default_rng(11)
    rows = []
    for gid in range(25):
        face = gid % 6
        a0, b0 = rng.integers(0, 28, 2)
        w, h = 1 + gid % 4, 1 + (gid // 4) % 3
        for a in range(a0, min(a0 + w, 32)):
            for b in range(b0, min(b0 + h, 32)):
                rows.append((gid, face, a, b))
    # one deliberately cross-face group
    rows += [(99, 0, 1, 1), (99, 0, 2, 1), (99, 5, 7, 7)]
    pdf = pd.DataFrame(rows, columns=["poly_id", "s2_face", "s2_i", "s2_j"])
    df = spark.createDataFrame(pdf).repartition(8)
    out = S2.cells_to_wkb(df, 5).toPandas()
    assert len(out) == 27  # 25 single-face groups + 2 rows for the cross-face one
    for (gid, face), sub in pdf.groupby(["poly_id", "s2_face"]):
        mp = S2.py_cells_to_multipolygon(
            int(face), sub.s2_i.to_numpy(), sub.s2_j.to_numpy(), 5
        )
        row = out[(out.poly_id == gid) & (out.s2_face == face)].iloc[0]
        assert bytes(row.wkb) == WKB.encode_multipolygon(mp)
        assert row.n_polys == len(mp)
        assert row.n_vertices == sum(len(r) for rings in mp for r in rings)


def test_polyfill_cells_to_wkb_roundtrip(spark):
    """Vector -> cells -> vector: dissolving a polyfill cover back to WKB
    preserves cell membership exactly — a point at ANY covered cell's
    center is inside the group's outline set (even-odd over its per-face
    rows) and a neighboring uncovered cell's center is not."""
    fixtures = _fixtures()[:3]
    polys = spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": range(len(fixtures)),
                "wkb": [WKB.encode_multipolygon(mp) for mp in fixtures],
            }
        )
    )
    cells = S2.polyfill(polys, LEVEL)
    out = S2.cells_to_wkb(cells, LEVEL).toPandas()
    cpd = cells.toPandas()
    for pid in range(len(fixtures)):
        covered = set(
            zip(
                cpd[cpd.poly_id == pid].s2_face.astype(int),
                cpd[cpd.poly_id == pid].s2_i,
                cpd[cpd.poly_id == pid].s2_j,
            )
        )
        probes = list(covered)
        outside = set()
        for f, a, b in list(covered)[:40]:
            for da, db in ((1, 0), (0, 1), (-1, 0), (0, -1)):
                nb = (f, a + da, b + db)
                if nb not in covered and 0 <= nb[1] < N and 0 <= nb[2] < N:
                    outside.add(nb)
        probes += sorted(outside)
        fc = np.array([p[0] for p in probes])
        ic = np.array([p[1] for p in probes])
        jc = np.array([p[2] for p in probes])
        clon, clat = S2.py_cell_center(fc, ic, jc, LEVEL)
        p = SPH.lonlat_to_xyz(clon, clat)
        inside = np.zeros(len(probes), dtype=bool)
        for _, row in out[out.poly_id == pid].iterrows():
            for poly in WKB.decode_multipolygon(bytes(row.wkb)):
                inside |= SPH.points_in_spherical_polygon(p, poly)
        want = np.array([pr in covered for pr in probes])
        assert (inside == want).all(), f"poly {pid}"


def _canon_rings(mp):
    out = []
    for poly in mp:
        for r in poly:
            r = np.asarray(r)
            if len(r) > 1 and (r[0] == r[-1]).all():
                r = r[:-1]
            k = np.lexsort((r[:, 1], r[:, 0]))[0]
            out.append(tuple(map(tuple, np.roll(r, -k, axis=0))))
    return sorted(out)


def test_grid_outline_equals_general_dissolve():
    """The vectorized grid stitcher (_grid_outline) is ring-for-ring
    equivalent to running the general strict dissolve over the unit
    squares — including the subtle corner semantics: two diagonally
    touching squares MERGE into one pinched CCW ring (the tightest-left-
    turn rule crosses at the corner) while a hole touching the shell
    diagonally stays a separate CW ring."""
    cases = []
    for seed in range(12):
        r = np.random.default_rng(seed)
        k = int(r.integers(1, 400))
        cases.append(
            np.unique(np.stack([r.integers(0, 20, k), r.integers(0, 20, k)], 1), axis=0)
        )
    # donut, checkerboard (pinch merges), singleton, dense-with-holes,
    # island-in-hole-in-shell nesting
    cases.append(np.array([(a, b) for a in range(10) for b in range(10)
                           if not (3 <= a <= 6 and 3 <= b <= 6)]))
    cases.append(np.array([(a, b) for a in range(8) for b in range(8) if (a + b) % 2 == 0]))
    cases.append(np.array([[5, 5]]))
    r = np.random.default_rng(99)
    dense = np.array([(a, b) for a in range(15) for b in range(15)])
    cases.append(dense[r.random(len(dense)) > 0.08])
    big = set((a, b) for a in range(12) for b in range(12))
    hole = set((a, b) for a in range(2, 10) for b in range(2, 10))
    island = set((a, b) for a in range(4, 8) for b in range(4, 8))
    cases.append(np.array(sorted((big - hole) | island)))
    for n, ij in enumerate(cases):
        got = S2._grid_outline(ij)
        want = S2._cells_outline_via_dissolve(ij)
        assert _canon_rings(got) == _canon_rings(want), f"case {n}"
    # checkerboard pinch pinned explicitly: 2 diagonal squares -> ONE ring
    one = S2._grid_outline(np.array([[0, 0], [1, 1]]))
    assert len(one) == 1 and len(one[0]) == 1 and len(one[0][0]) == 8
