"""Geodesic point-in-polygon join (operators/pip_sphere.py) — == brute
spherical containment on global zone layers (face edges, antimeridian,
holes, overlaps), the interior/boundary classified cover's soundness
(functions/s2.polyfill classify=True), exactness on slivers thinner than a
cell, and the key-collision guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pygridmap_spark.core import sphere as SPH
from pygridmap_spark.core import wkb as WKB
from pygridmap_spark.functions import s2 as S2
from pygridmap_spark.operators.pip_sphere import point_in_polygon_s2

LEVEL = 9


def _zones():
    rng = np.random.default_rng(7)
    rows = []
    for zid in range(10):
        clat = float(rng.uniform(-65, 65))
        clon = float(rng.uniform(-180, 180))
        r = float(rng.uniform(2.0, 6.0))
        ang = np.linspace(0, 2 * np.pi, 9)[:-1]
        ring = np.column_stack(
            [clon + r * np.cos(ang) / max(0.2, np.cos(np.radians(clat))),
             clat + r * np.sin(ang)]
        )
        rows.append((zid, [[np.vstack([ring, ring[:1]])]]))
    # shell + hole
    outer = np.array([[10, 40], [20, 40], [20, 50], [10, 50], [10, 40]], float)
    inner = np.array([[13, 43], [17, 43], [17, 47], [13, 47], [13, 43]], float)
    rows.append((10, [[outer, inner]]))
    # two-part multipolygon straddling the antimeridian
    p1 = np.array([[172.0, -5.0], [179.5, -5.0], [179.5, 5.0], [172.0, 5.0],
                   [172.0, -5.0]])
    p2 = np.array([[-179.5, -5.0], [-172.0, -5.0], [-172.0, 5.0],
                   [-179.5, 5.0], [-179.5, -5.0]])
    rows.append((11, [[p1], [p2]]))
    # a zone overlapping zone 10's shell (multi-tag region)
    ov = np.array([[18, 44], [26, 44], [26, 52], [18, 52], [18, 44]], float)
    rows.append((12, [[ov]]))
    return rows


def _points(n, seed=3):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return lon, lat


def _brute_pairs(zone_rows, lon, lat):
    p = SPH.lonlat_to_xyz(lon, lat)
    pairs = set()
    for zid, mp in zone_rows:
        for poly in mp:
            rings = [r for r in poly if len(r) >= 3]
            c, rad = SPH.bounding_cap(rings)
            incap = p @ c >= np.cos(min(rad * 1.000001 + 1e-9, np.pi))
            sub = SPH.points_in_spherical_polygon(p[incap], rings)
            for k in np.flatnonzero(incap)[sub]:
                pairs.add((int(k), zid))
    return pairs


def _zone_df(spark, zone_rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "poly_id": [z for z, _ in zone_rows],
                "wkb": [WKB.encode_multipolygon(mp) for _, mp in zone_rows],
            }
        )
    )


def test_pip_s2_matches_bruteforce(spark):
    zone_rows = _zones()
    lon, lat = _points(20_000)
    pts = spark.createDataFrame(
        pd.DataFrame({"pt": np.arange(len(lon)), "lon": lon, "lat": lat})
    )
    out = point_in_polygon_s2(pts, _zone_df(spark, zone_rows), LEVEL)
    got = {(int(r["pt"]), int(r["poly_id"])) for r in out.collect()}
    assert got == _brute_pairs(zone_rows, lon, lat)
    # the overlap region must multi-tag: some point is in both 10 and 12
    by_pt: dict = {}
    for k, z in got:
        by_pt.setdefault(k, set()).add(z)
    assert any({10, 12} <= zs for zs in by_pt.values())


def test_classified_cover_sound_and_consistent(spark):
    """interior=true cells are PROVABLY inside (dense corner/edge samples
    all contained); the classified cover's center-inside cells equal the
    plain polyfill set."""
    zone_rows = _zones()[:6]
    zdf = _zone_df(spark, zone_rows)
    plain = S2.polyfill(zdf, LEVEL).toPandas()
    cls = S2.polyfill(zdf, LEVEL, classify=True).toPandas()

    def key(df):
        return set(zip(df.poly_id, df.s2_face.astype(int), df.s2_i, df.s2_j))

    # center-inside == plain polyfill: interior cells plus the boundary
    # cells whose center is inside; recompute center containment for
    # boundary cells via the kernel
    rings_by_zone = {
        z: [r for poly in mp for r in poly if len(r) >= 3] for z, mp in zone_rows
    }
    bnd = cls[~cls.s2_interior]
    n = 1 << LEVEL
    u = S2._np_st_to_uv((bnd.s2_i.to_numpy() + 0.5) / n)
    v = S2._np_st_to_uv((bnd.s2_j.to_numpy() + 0.5) / n)
    x, y, z_ = S2._np_face_uv_to_xyz(bnd.s2_face.to_numpy().astype(np.int64), u, v)
    nn = np.sqrt(x * x + y * y + z_ * z_)
    p = np.column_stack([x / nn, y / nn, z_ / nn])
    center_in = np.zeros(len(bnd), dtype=bool)
    for zid, rings in rings_by_zone.items():
        sel = (bnd.poly_id == zid).to_numpy()
        acc = np.zeros(int(sel.sum()), dtype=bool)
        for r in rings:
            acc ^= SPH.points_in_spherical_ring(p[sel], SPH.ring_to_xyz(r))
        center_in[sel] = acc
    got_center_inside = key(cls[cls.s2_interior]) | key(bnd[center_in])
    assert got_center_inside == key(plain)

    # soundness: every interior cell fully contained — sample a 5x5 st
    # grid across each interior cell (corners included) and require
    # containment of every sample
    it = cls[cls.s2_interior]
    for zid in it.poly_id.unique():
        g = it[it.poly_id == zid]
        fr = np.linspace(0.0, 1.0, 5)
        offs = [(a, b) for a in fr for b in fr]
        rings = rings_by_zone[int(zid)]
        for da, db in offs:
            su = S2._np_st_to_uv((g.s2_i.to_numpy() + da) / n)
            sv = S2._np_st_to_uv((g.s2_j.to_numpy() + db) / n)
            sx, sy, sz = S2._np_face_uv_to_xyz(
                g.s2_face.to_numpy().astype(np.int64), su, sv
            )
            sn = np.sqrt(sx * sx + sy * sy + sz * sz)
            sp = np.column_stack([sx / sn, sy / sn, sz / sn])
            acc = np.zeros(len(g), dtype=bool)
            for r in rings:
                acc ^= SPH.points_in_spherical_ring(sp, SPH.ring_to_xyz(r))
            assert acc.all(), f"zone {zid}: interior cell sample escaped"


def test_interior_fastpath_dominates(spark):
    """For a zone large relative to the cell, interior cells (zero refine
    work) outnumber boundary cells — the property that bounds refine cost
    by boundary LENGTH, not zone area."""
    ring = np.array([[0.0, 0.0], [12.0, 0.0], [12.0, 12.0], [0.0, 12.0],
                     [0.0, 0.0]])
    zdf = _zone_df(spark, [(0, [[ring]])])
    cls = S2.polyfill(zdf, 10, classify=True).toPandas()
    n_int = int(cls.s2_interior.sum())
    n_bnd = int((~cls.s2_interior).sum())
    assert n_int > 3 * n_bnd


def test_sliver_thinner_than_cell_is_exact(spark):
    """A sliver zone that threads BETWEEN cell centers has zero
    center-inside cells, yet its points must still be tagged — boundary
    cells carry the exactness."""
    sliver = np.array([[40.001, 10.001], [47.003, 10.001], [47.003, 10.002],
                       [40.001, 10.002], [40.001, 10.001]])
    zdf = _zone_df(spark, [(0, [[sliver]])])
    lon = np.linspace(40.01, 46.99, 50)
    lat = np.full(50, 10.0015)
    inpts = pd.DataFrame({"pt": np.arange(50), "lon": lon, "lat": lat})
    outpts = pd.DataFrame(
        {"pt": np.arange(50, 100), "lon": lon, "lat": np.full(50, 10.01)}
    )
    pts = spark.createDataFrame(pd.concat([inpts, outpts]))
    out = point_in_polygon_s2(pts, zdf, 8)
    got = sorted(int(r["pt"]) for r in out.collect())
    # the whole inside row is caught, nothing from the outside row (the
    # sliver interior at lat 10.0015 lies strictly inside: geodesic edge
    # sag over 7 deg of lon at lat 10 is ~1e-3 deg < the 1e-3 sliver
    # height at its midpoint — verify against the kernel, not assumption)
    p = SPH.lonlat_to_xyz(
        np.concatenate([lon, lon]), np.concatenate([lat, np.full(50, 10.01)])
    )
    exp = np.flatnonzero(SPH.points_in_spherical_polygon(p, [sliver]))
    assert got == sorted(int(k) for k in exp)
    assert len(got) > 0


def test_null_wkb_matches_nothing(spark):
    zdf = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0], "wkb": [None]})
    )
    pts = spark.createDataFrame(
        pd.DataFrame({"pt": [0], "lon": [10.0], "lat": [10.0]})
    )
    assert point_in_polygon_s2(pts, zdf, 8).count() == 0


def test_poly_key_collision_raises(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0], "lon": [1.0], "lat": [1.0]})
    )
    with pytest.raises(ValueError, match="poly_id"):
        point_in_polygon_s2(pts, pts, 8)


# --- adaptive covering + region_filter --------------------------------------

from pygridmap_spark.operators.pip_sphere import region_filter  # noqa: E402


def test_covering_budget_mixed_levels_and_containment(spark):
    """<= max_cells GUARANTEED, coarse interior + finer boundary levels,
    and the covering contains every interior point (sampled densely)."""
    ang = np.linspace(0, 2 * np.pi, 13)[:-1]
    ring = np.column_stack([10 + 4 * np.cos(ang), 45 + 3 * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    zdf = _zone_df(spark, [(0, [[ring]])])
    for max_cells in (9, 32, 64, 256):
        cov = S2.covering(zdf, max_cells=max_cells, max_level=14).toPandas()
        assert 0 < len(cov) <= max_cells
    # budgets below the 9-cell cap seed cannot be guaranteed -> refused
    # (review finding: an all-boundary seed round used to emit 9 > budget)
    with pytest.raises(ValueError, match="9-cell cap seed"):
        S2.covering(zdf, max_cells=8, max_level=14).count()
    cov = S2.covering(zdf, max_cells=64, max_level=14).toPandas()
    assert cov.s2_level.nunique() > 1  # mixed levels
    # boundary cells sit at finer levels than the coarsest interior cell
    assert cov[~cov.s2_interior].s2_level.min() >= cov.s2_level.min()
    rng = np.random.default_rng(0)
    lon = rng.uniform(5.5, 14.5, 4000)
    lat = rng.uniform(41.5, 48.5, 4000)
    p = SPH.lonlat_to_xyz(lon, lat)
    ins = SPH.points_in_spherical_ring(p, SPH.ring_to_xyz(ring))
    leaf = S2.py_s2_index(lon[ins], lat[ins], 30)["cell"]
    order = np.argsort(cov.s2_range_min.to_numpy())
    lo = cov.s2_range_min.to_numpy()[order]
    hi = cov.s2_range_max.to_numpy()[order]
    k = np.searchsorted(lo, leaf, side="right") - 1
    assert ((k >= 0) & (leaf <= hi[np.clip(k, 0, len(hi) - 1)])).all()
    # interior ranges are PROOF of containment: sampled points whose leaf
    # lands in an interior range must be inside
    it = cov[cov.s2_interior]
    leaf_all = S2.py_s2_index(lon, lat, 30)["cell"]
    in_interior = np.zeros(len(lon), dtype=bool)
    for lo_i, hi_i in zip(it.s2_range_min, it.s2_range_max):
        in_interior |= (leaf_all >= lo_i) & (leaf_all <= hi_i)
    assert (~in_interior | ins).all()


def test_covering_whole_sphere_seed(spark):
    """A cap-scale ring (most of the north) seeds from the 6 face cells
    and still yields a valid bounded covering."""
    lons = np.linspace(0, 360, 25)[:-1]
    ring = np.column_stack([lons, np.full(24, 8.0)])
    zdf = _zone_df(spark, [(0, [[np.vstack([ring, ring[:1]])]])])
    cov = S2.covering(zdf, max_cells=96, max_level=6).toPandas()
    assert 0 < len(cov) <= 96
    # the north pole is deep inside: its leaf lies in an interior range
    leaf = S2.py_s2_index(np.array([13.0]), np.array([89.9]), 30)["cell"]
    it = cov[cov.s2_interior]
    hit = ((leaf[0] >= it.s2_range_min) & (leaf[0] <= it.s2_range_max)).any()
    assert hit


def test_region_filter_matches_bruteforce(spark):
    zone_rows = _zones()
    lon, lat = _points(20_000)
    pts = spark.createDataFrame(
        pd.DataFrame({"pt": np.arange(len(lon)), "lon": lon, "lat": lat})
    )
    out = region_filter(pts, _zone_df(spark, zone_rows), max_cells=64, max_level=12)
    got = {(int(r["pt"]), int(r["poly_id"])) for r in out.collect()}
    assert got == _brute_pairs(zone_rows, lon, lat)


def test_region_filter_pushdown_on_sorted_cell_column(spark, tmp_path):
    """The covering ranges must reach the parquet scan as PushedFilters
    on the indexed cell column, and the result must equal the inline
    route."""
    zone_rows = _zones()[:4]
    lon, lat = _points(8_000, seed=11)
    pts = spark.createDataFrame(
        pd.DataFrame({"pt": np.arange(len(lon)), "lon": lon, "lat": lat})
    )
    from pyspark.sql import functions as F

    idx = S2.with_s2_index(pts, 14).select(
        "pt", "lon", "lat", F.col("s2_cell").alias("cell")
    )
    path = str(tmp_path / "cells")
    idx.repartitionByRange(4, "cell").sortWithinPartitions("cell").write.parquet(path)
    tbl = spark.read.parquet(path)
    zdf = _zone_df(spark, zone_rows)
    out = region_filter(tbl, zdf, max_cells=64, max_level=12, cell_col="cell")
    got = {(int(r["pt"]), int(r["poly_id"])) for r in out.collect()}
    assert got == _brute_pairs(zone_rows, lon, lat)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and ("GreaterThanOrEqual(cell" in pushed[0] or "Or(And" in pushed[0])


def test_region_filter_guards(spark):
    zdf = spark.createDataFrame(pd.DataFrame({"poly_id": [0], "wkb": [None]}))
    pts = spark.createDataFrame(
        pd.DataFrame({"pt": [0], "lon": [10.0], "lat": [10.0]})
    )
    empty = region_filter(pts, zdf, max_cells=16, max_level=8)
    assert empty.count() == 0 and empty.columns == ["pt", "lon", "lat", "poly_id"]
    with pytest.raises(ValueError, match="max_ranges"):
        region_filter(
            pts, _zone_df(spark, _zones()), max_cells=64, max_level=12, max_ranges=10
        )


def test_region_filter_cap_scale_zone_excludes_antipodal_mirror(spark):
    """A cap-scale zone seeds the covering from the whole sphere, where
    the winding test also flags the zone's ANTIPODAL mirror — the cap
    restriction must keep mirror cells out of the covering (regression:
    mirror points were tagged interior)."""
    ang = np.linspace(0, 2 * np.pi, 25)[:-1]
    ring = np.column_stack([11 + 40 * np.cos(ang), 40 * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    zone_rows = [(0, [[ring]])]
    zdf = _zone_df(spark, zone_rows)
    # points: inside the zone, at its antipodal mirror, and far away
    lon = np.array([11.0, 20.0, -169.0, -160.0, 100.0])
    lat = np.array([0.0, 10.0, 0.0, -10.0, 60.0])
    pts = spark.createDataFrame(
        pd.DataFrame({"pt": np.arange(5), "lon": lon, "lat": lat})
    )
    out = region_filter(pts, zdf, max_cells=64, max_level=8)
    got = sorted(int(r["pt"]) for r in out.collect())
    assert got == [0, 1]


def test_point_in_polygon_s2_streaming_matches_batch(spark, tmp_path):
    """The geodesic PIP join runs unchanged under Structured Streaming: a
    file-source point stream against the static (localCheckpointed)
    classified cover — stream-static equi-join + the refine kernel +
    union are all append-mode legal — and the streamed result equals the
    batch result."""
    zone_rows = _zones()[:6]
    zdf = _zone_df(spark, zone_rows)
    lon, lat = _points(4_000, seed=21)
    pdf = pd.DataFrame({"pt": np.arange(len(lon)), "lon": lon, "lat": lat})
    src = str(tmp_path / "pts")
    batch_pts = spark.createDataFrame(pdf)
    batch_pts.repartition(3).write.parquet(src)
    expect = {
        (int(r["pt"]), int(r["poly_id"]))
        for r in point_in_polygon_s2(batch_pts, zdf, LEVEL).collect()
    }
    stream = (
        spark.readStream.schema(batch_pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tagged = point_in_polygon_s2(stream, zdf, LEVEL)
    q = (
        tagged.writeStream.format("memory")
        .queryName("pip_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (int(r["pt"]), int(r["poly_id"]))
        for r in spark.sql("select * from pip_stream").collect()
    }
    assert got == expect and len(got) > 0


def test_zone_border_depth_streaming_matches_batch(spark, tmp_path):
    """The border-depth enrichment runs unchanged under Structured
    Streaming: PIP tagging + the broadcast zone join + the mapInPandas
    distance kernel are all append-mode legal on a stream-static plan,
    and the streamed depths equal the batch depths bit for bit."""
    from pygridmap_spark.operators.pip_sphere import zone_border_depth

    zone_rows = _zones()[:6]
    zdf = _zone_df(spark, zone_rows)
    lon, lat = _points(3_000, seed=33)
    pdf = pd.DataFrame({"pt": np.arange(len(lon)), "lon": lon, "lat": lat})
    src = str(tmp_path / "pts")
    batch_pts = spark.createDataFrame(pdf)
    batch_pts.repartition(3).write.parquet(src)
    expect = {
        (int(r["pt"]), int(r["poly_id"])): float(r["border_depth_rad"])
        for r in zone_border_depth(
            point_in_polygon_s2(batch_pts, zdf, LEVEL), zdf
        ).collect()
    }
    stream = (
        spark.readStream.schema(batch_pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    depth = zone_border_depth(point_in_polygon_s2(stream, zdf, LEVEL), zdf)
    q = (
        depth.writeStream.format("memory")
        .queryName("depth_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (int(r["pt"]), int(r["poly_id"])): float(r["border_depth_rad"])
        for r in spark.sql("select * from depth_stream").collect()
    }
    assert got == expect and len(got) > 0  # keys AND values (exact ==)


# --- zones_intersect_s2 --------------------------------------------------------

def test_spherical_intersect_kernel_cases():
    """arcs_cross_pairs + spherical_polygons_intersect unit pins: the
    transversal cross, the antipodal-mirror trap (arcs on crossing great
    circles but opposite sides of the sphere), endpoint tangency (not
    reported — generic-position contract), hole semantics, containment,
    and identical zones via the representative interior point."""
    def arc(lo1, la1, lo2, la2):
        return (SPH.lonlat_to_xyz(np.array([lo1]), np.array([la1])),
                SPH.lonlat_to_xyz(np.array([lo2]), np.array([la2])))

    a1, a2 = arc(-10, 0, 10, 0)
    assert SPH.arcs_cross_pairs(a1, a2, *arc(0, -10, 0, 10))[0, 0]
    assert not SPH.arcs_cross_pairs(a1, a2, *arc(20, -10, 20, 10))[0, 0]
    assert not SPH.arcs_cross_pairs(a1, a2, *arc(180, -10, 180, 10))[0, 0]
    assert not SPH.arcs_cross_pairs(a1, a2, *arc(10, 0, 10, 10))[0, 0]

    sq = lambda x0, y0, x1, y1: [np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)]
    A, B, C = [sq(0, 0, 10, 10)], [sq(5, 5, 15, 15)], [sq(20, 20, 30, 30)]
    big = [sq(-20, -20, 40, 40)]
    assert SPH.spherical_polygons_intersect(A, B)
    assert not SPH.spherical_polygons_intersect(A, C)
    assert SPH.spherical_polygons_intersect(big, B)
    assert SPH.spherical_polygons_intersect(B, big)
    rep = SPH.lonlat_to_xyz(np.array([5.0]), np.array([5.0]))
    assert SPH.spherical_polygons_intersect(A, [sq(0, 0, 10, 10)], rep_a=rep)
    donut = [[np.array([[0., 0.], [30., 0.], [30., 30.], [0., 30.], [0., 0.]]),
              np.array([[10., 10.], [20., 10.], [20., 20.], [10., 20.],
                        [10., 10.]])]]
    assert not SPH.spherical_polygons_intersect(donut, [sq(12, 12, 18, 18)])
    assert SPH.spherical_polygons_intersect(donut, [sq(8, 12, 14, 18)])


def _zones_b():
    """Second layer: shifted stars, an exact duplicate of layer-A zone 0,
    a zone nested inside A-10's hole (must NOT pair with 10), one
    overlapping the hole edge (must pair), and an antimeridian box."""
    rng = np.random.default_rng(23)
    rows, reps = [], {}
    for zid in range(8):
        clat = float(rng.uniform(-60, 60))
        clon = float(rng.uniform(-180, 180))
        r = float(rng.uniform(2.0, 7.0))
        ang = np.linspace(0, 2 * np.pi, 8)[:-1]
        ring = np.column_stack(
            [clon + r * np.cos(ang) / max(0.2, np.cos(np.radians(clat))),
             clat + r * np.sin(ang)]
        )
        rows.append((zid, [[np.vstack([ring, ring[:1]])]]))
        reps[zid] = (clon, clat)
    dup = _zones()[0]
    rows.append((8, dup[1]))  # exact duplicate of A zone 0
    inhole = np.array([[14, 44], [16, 44], [16, 46], [14, 46], [14, 44]], float)
    rows.append((9, [[inhole]]))
    reps[9] = (15.0, 45.0)
    acrosshole = np.array([[12, 42], [15, 42], [15, 45.5], [12, 45.5], [12, 42]], float)
    rows.append((10, [[acrosshole]]))
    reps[10] = (12.5, 42.5)
    am = np.array([[178.0, -3.0], [-178.0, -3.0], [-178.0, 3.0], [178.0, 3.0],
                   [178.0, -3.0]], float)
    rows.append((11, [[am]]))
    reps[11] = (180.0, 0.0)
    return rows, reps


def _reps_a():
    rng = np.random.default_rng(7)
    reps = {}
    for zid in range(10):
        clat = float(rng.uniform(-65, 65))
        clon = float(rng.uniform(-180, 180))
        rng.uniform(2.0, 6.0)
        reps[zid] = (clon, clat)
    reps[10] = (11.0, 41.0)  # in the shell, outside the hole
    reps[11] = (175.0, 0.0)
    reps[12] = (22.0, 48.0)
    return reps


def test_zones_intersect_matches_allpairs_refine(spark):
    """The operator (classified-cover candidates + interior-cell witness
    + Arrow refine) equals the exhaustive all-pairs kernel decision on
    global layers with duplicates, hole nesting, antimeridian straddlers
    and overlaps — and the duplicate zone IS paired (caught by the
    representative interior point, not by vertex containment)."""
    from pygridmap_spark.operators.pip_sphere import zones_intersect_s2

    za = _zones()
    zb, reps_b = _zones_b()
    reps_a = _reps_a()
    reps_b[8] = reps_a[0]
    want = set()
    for aid, mpa in za:
        for bid, mpb in zb:
            ra = SPH.lonlat_to_xyz(*[np.array([v]) for v in reps_a[aid]])
            rb = SPH.lonlat_to_xyz(*[np.array([v]) for v in reps_b[bid]])
            if SPH.spherical_polygons_intersect(mpa, mpb, rep_a=ra, rep_b=rb):
                want.add((aid, bid))
    got = zones_intersect_s2(_zone_df(spark, za), _zone_df(spark, zb), LEVEL)
    pairs = set(map(tuple, got.toPandas()[["poly_id_l", "poly_id_r"]].to_numpy()))
    assert pairs == want
    assert (0, 8) in pairs  # the exact duplicate
    assert (10, 9) not in pairs  # nested fully inside the hole
    assert (10, 10) in pairs  # straddles the hole edge
    assert (11, 11) in pairs  # antimeridian x antimeridian


def test_zones_intersect_precomputed_cover_identical(spark):
    """A materialized polyfill(classify=True) cover passed via
    left_cover/right_cover yields the identical pair set — the
    index-reuse contract (the cover is the layer's spatial index,
    built once and shared across the join family)."""
    from pygridmap_spark.operators.pip_sphere import zones_intersect_s2

    za = _zone_df(spark, _zones())
    zb = _zone_df(spark, _zones_b()[0])
    base = zones_intersect_s2(za, zb, LEVEL).toPandas()
    covl = S2.polyfill(za, LEVEL, classify=True)
    covr = S2.polyfill(zb, LEVEL, classify=True)
    alt = zones_intersect_s2(
        za, zb, LEVEL, left_cover=covl, right_cover=covr
    ).toPandas()
    key = lambda df: sorted(zip(df.poly_id_l, df.poly_id_r))
    assert key(alt) == key(base)
