"""S2-scheme spherical cell index (functions/s2.py).

Structural pins: Hilbert curve algebra (round-trip / continuity / prefix),
Catalyst == numpy twin == Arrow kernel bit-identity, LINEAR plan growth in
`level` (the CollapseProject guard the unroll relies on), id-layout
algebra (parent/range/level/token), cube-wrap neighbor topology, and the
near-equal-area property that is the module's reason to exist next to the
equirectangular cellindex.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex as CI
from pygridmap_spark.functions import s2 as S2


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180.0, 180.0, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, n)))  # uniform on sphere
    return lon, lat


# --- pure-numpy curve algebra ----------------------------------------------


def test_hilbert_round_trip_and_injective():
    rng = np.random.default_rng(0)
    L = 14
    i = rng.integers(0, 1 << L, 50_000)
    j = rng.integers(0, 1 << L, 50_000)
    d = S2._np_hilbert_d(i, j, L)
    xi, yj = S2._np_hilbert_xy(d, L)
    assert (xi == i).all() and (yj == j).all()


def test_hilbert_curve_is_continuous():
    L = 7
    d = np.arange(1 << (2 * L))
    x, y = S2._np_hilbert_xy(d, L)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()


def test_hilbert_prefix_is_parent():
    rng = np.random.default_rng(1)
    L = 12
    i = rng.integers(0, 1 << L, 20_000)
    j = rng.integers(0, 1 << L, 20_000)
    d = S2._np_hilbert_d(i, j, L)
    d_up = S2._np_hilbert_d(i >> 3, j >> 3, L - 3)
    assert (d_up == (d >> 6)).all()


def test_py_index_direct_coarse_equals_derived_parent():
    lon, lat = _rand_lonlat(20_000)
    fine = S2.py_s2_index(lon, lat, 12)
    coarse = S2.py_s2_index(lon, lat, 5)
    assert (coarse["face"] == fine["face"]).all()
    assert (coarse["i"] == (fine["i"] >> 7)).all()
    assert (coarse["pos"] == (fine["pos"] >> 14)).all()
    assert (coarse["compact"] == (fine["compact"] >> 14)).all()


def test_known_points():
    # pinned anchors: each cube-face center and the poles
    lon = np.array([0.0, 90.0, 180.0, -90.0, 0.0, 0.0])
    lat = np.array([0.0, 0.0, 0.0, 0.0, 90.0, -90.0])
    r = S2.py_s2_index(lon, lat, 10)
    assert list(r["face"]) == [0, 1, 3, 4, 2, 5]
    # face centers hit the middle cell of their face
    mid = 1 << 9
    assert (r["i"][[0, 1, 4]] == mid).all()
    # full ids carry the face in the top 3 bits (uint view)
    top = (r["cell"].view(np.uint64) >> np.uint64(61)).astype(np.int64)
    assert list(top) == [0, 1, 3, 4, 2, 5]


# --- Catalyst / kernel parity ----------------------------------------------


@pytest.fixture(scope="module")
def lonlat_df(spark):
    lon, lat = _rand_lonlat(4_000, seed=11)
    # adversarial edge points: poles, antimeridian, face centers/edges
    edge = np.array(
        [
            [0.0, 90.0], [0.0, -90.0], [180.0, 0.0], [-180.0, 0.0],
            [45.0, 35.26438968], [-45.0, -35.26438968], [135.0, 0.0],
            [0.001, 0.001], [-0.001, -0.001], [90.0, 45.0],
        ]
    )
    lon = np.concatenate([lon, edge[:, 0]])
    lat = np.concatenate([lat, edge[:, 1]])
    pdf = pd.DataFrame({"pid": np.arange(len(lon)), "lon": lon, "lat": lat})
    # repartition so ConvertToLocalRelation can't fold the whole pipeline
    # into a driver-evaluated LocalRelation — parity must run through the
    # same distributed codegen path production uses
    return spark.createDataFrame(pdf).repartition(3), pdf


def test_catalyst_matches_numpy_twin(lonlat_df):
    df, pdf = lonlat_df
    out = (
        S2.with_s2_index(df, 12)
        .orderBy("pid")
        .select("s2_face", "s2_i", "s2_j", "s2_pos", "s2_cell", "s2_compact")
        .toPandas()
    )
    exp = S2.py_s2_index(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 12)
    assert (out["s2_face"].to_numpy() == exp["face"]).all()
    assert (out["s2_i"].to_numpy() == exp["i"]).all()
    assert (out["s2_j"].to_numpy() == exp["j"]).all()
    assert (out["s2_pos"].to_numpy() == exp["pos"]).all()
    assert (out["s2_cell"].to_numpy() == exp["cell"]).all()
    assert (out["s2_compact"].to_numpy() == exp["compact"]).all()


def test_kernel_route_matches_catalyst(lonlat_df):
    df, _ = lonlat_df
    a = S2.with_s2_index(df, 14).orderBy("pid").select("s2_cell").toPandas()
    b = S2.with_s2_index_kernel(df, 14).orderBy("pid").select("s2_cell").toPandas()
    assert (a["s2_cell"].to_numpy() == b["s2_cell"].to_numpy()).all()


def test_kernel_route_supports_level_30(lonlat_df):
    df, pdf = lonlat_df
    out = S2.with_s2_index_kernel(df, 30).orderBy("pid").select("s2_cell").toPandas()
    exp = S2.py_s2_index(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 30)
    assert (out["s2_cell"].to_numpy() == exp["cell"]).all()
    # leaf sentinel: lsb == 1
    assert (out["s2_cell"].to_numpy() & 1 == 1).all()


def test_plan_is_linear_in_level_and_codegen(lonlat_df):
    df, _ = lonlat_df
    sizes = {}
    for lv in (6, 12):
        plan = S2.with_s2_index(df, lv)._jdf.queryExecution().optimizedPlan().toString()
        sizes[lv] = (len(plan), plan.count("Project"))
    # one Project per Hilbert level + a small constant number of stages
    assert sizes[12][1] - sizes[6][1] == 6
    # linear, not exponential: doubling the level must not double-squared the text
    assert sizes[12][0] < 3 * sizes[6][0]
    # under AQE the Python-side executedPlan is the never-executed
    # isFinalPlan=false copy with no codegen annotation (CLAUDE.md gotcha);
    # build one non-adaptive plan to read the WholeStageCodegen spans
    spark = df.sparkSession
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        phys = S2.with_s2_index(df, 12)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert phys.lstrip().startswith("*(")  # '*(n)' = inside a codegen stage
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


def test_catalyst_level_cap():
    with pytest.raises(ValueError):
        S2.with_s2_index(None, S2.CATALYST_MAX_LEVEL + 1)


# --- id algebra -------------------------------------------------------------


def test_id_algebra_parent_range_level_token(spark, lonlat_df):
    df, pdf = lonlat_df
    out = (
        S2.with_s2_index(df, 12)
        .select(
            "pid",
            "s2_cell",
            S2.cell_level(F.col("s2_cell")).alias("lv"),
            S2.parent_id(F.col("s2_cell"), 5).alias("p5"),
            S2.range_min(S2.parent_id(F.col("s2_cell"), 5)).alias("rmin"),
            S2.range_max(S2.parent_id(F.col("s2_cell"), 5)).alias("rmax"),
            S2.token(F.col("s2_cell")).alias("tok"),
        )
        .orderBy("pid")
        .toPandas()
    )
    exp5 = S2.py_s2_index(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 5)
    assert (out["lv"] == 12).all()
    assert (out["p5"].to_numpy() == exp5["cell"]).all()
    # range containment holds in UNSIGNED id space (face 4/5 ids are
    # negative two's complement; comparisons must be on the uint view)
    cell_u = out["s2_cell"].to_numpy().view(np.uint64)
    rmin_u = out["rmin"].to_numpy().view(np.uint64)
    rmax_u = out["rmax"].to_numpy().view(np.uint64)
    assert ((rmin_u <= cell_u) & (cell_u <= rmax_u)).all()
    # token round-trip: hex of the uint64, trailing zeros stripped
    exp_tok = [format(v, "016x").rstrip("0") for v in cell_u]
    assert list(out["tok"]) == exp_tok


def test_compact_parent_matches_direct():
    lon, lat = _rand_lonlat(10_000, seed=3)
    fine = S2.py_s2_index(lon, lat, 12)["compact"]
    coarse = S2.py_s2_index(lon, lat, 8)["compact"]
    assert (coarse == (fine >> 8)).all()


# --- neighbors --------------------------------------------------------------


def test_neighbors_symmetry_and_counts():
    lon, lat = _rand_lonlat(500, seed=5)
    L = 4  # coarse: plenty of cells sit on face edges and cube corners
    r = S2.py_s2_index(lon, lat, L)
    nbrs = S2.py_s2_neighbors(r["face"], r["i"], r["j"], L)
    comp = r["compact"]
    by_cell = dict(zip(comp.tolist(), nbrs))
    for own, ns in by_cell.items():
        assert own not in ns
        assert 7 <= len(ns) <= 8
        for other in ns:
            if other in by_cell:  # symmetry where both sampled
                assert own in by_cell[other]


def test_neighbors_cube_corner_has_seven():
    # (i, j) = (0, 0) at any level sits on a cube corner for every face
    face = np.arange(6, dtype=np.int64)
    z = np.zeros(6, dtype=np.int64)
    nbrs = S2.py_s2_neighbors(face, z, z, 6)
    assert all(len(n) == 7 for n in nbrs)


def test_neighbor_centers_are_nearby():
    # every neighbor's center is within ~2.5 cell diagonals of the source
    lon, lat = _rand_lonlat(300, seed=9)
    L = 6
    r = S2.py_s2_index(lon, lat, L)
    clon, clat = S2.py_cell_center(r["face"], r["i"], r["j"], L)
    nbrs = S2.py_s2_neighbors(r["face"], r["i"], r["j"], L)
    # max cell edge at level L is ~ (pi/2)/2^L * sqrt(2.1) radians
    max_sep = 2.5 * (np.pi / 2) / (1 << L) * 1.5
    for k, ns in enumerate(nbrs):
        arr = np.array(sorted(ns), dtype=np.int64)
        f2 = arr >> (2 * L)
        pos2 = arr & ((np.int64(1) << (2 * L)) - 1)
        i2, j2 = S2._np_hilbert_xy(pos2, L)
        nlon, nlat = S2.py_cell_center(f2, i2, j2, L)
        # great-circle distance via chord
        a = np.radians([clat[k]]), np.radians([clon[k]])
        b = np.radians(nlat), np.radians(nlon)
        ax = np.cos(a[0]) * np.cos(a[1]); ay = np.cos(a[0]) * np.sin(a[1]); az = np.sin(a[0])
        bx = np.cos(b[0]) * np.cos(b[1]); by = np.cos(b[0]) * np.sin(b[1]); bz = np.sin(b[0])
        chord = np.sqrt((ax - bx) ** 2 + (ay - by) ** 2 + (az - bz) ** 2)
        assert (2 * np.arcsin(chord / 2) < max_sep).all()


# --- the reason this module exists ------------------------------------------


def test_s2_cells_are_near_equal_area_vs_equirect():
    # level 4 = 1536 cells, ~195 uniform points/cell: Poisson noise CV is
    # ~0.07, so the count CV reads the true cell-AREA spread, not sampling
    lon, lat = _rand_lonlat(300_000, seed=13)
    s2c = S2.py_s2_index(lon, lat, 4)["compact"]
    _, cnt = np.unique(s2c, return_counts=True)
    cv_s2 = cnt.std() / cnt.mean()
    # equirectangular 40x40 = 1600 cells (comparable count), cos(lat) area
    # collapse toward the poles
    ix = np.clip(((lon + 180.0) / 360.0 * 40).astype(np.int64), 0, 39)
    iy = np.clip(((lat + 90.0) / 180.0 * 40).astype(np.int64), 0, 39)
    _, cnt_eq = np.unique(ix * 40 + iy, return_counts=True)
    cv_eq = cnt_eq.std() / cnt_eq.mean()
    assert cv_s2 < 0.35  # quadratic-projection spread (~2.1x max/min area)
    assert cv_s2 < 0.6 * cv_eq  # the partition-skew win over the planar index


def test_s2_index_null_and_nan_coords_yield_null_keys(spark):
    """Review finding: NULL coords used to fabricate face 5 / (n-1, n-1)
    (greatest/least skip nulls, the face CaseWhen otherwise fires) and NaN
    coords landed on face 0 cell (0,0) — both must yield NULL face/i/j so
    bad rows DROP from equi-joins instead of polluting a real cell."""
    from pyspark.sql import functions as F

    from pygridmap_spark.functions import s2 as S2

    df = spark.createDataFrame(
        [
            (1, None, None),
            (2, 10.0, None),
            (3, None, 45.0),
            (4, float("nan"), float("nan")),
            (5, 10.0, float("nan")),
            (6, 10.0, 45.0),
        ],
        "id long, lon double, lat double",
    )
    out = {r["id"]: r for r in S2.with_s2_index(df, 12).collect()}
    for bad in (1, 2, 3, 4, 5):
        r = out[bad]
        assert r["s2_face"] is None and r["s2_i"] is None and r["s2_j"] is None, bad
        assert r["s2_cell"] is None and r["s2_compact"] is None, bad
    good = out[6]
    assert good["s2_face"] is not None and good["s2_cell"] is not None
    # face/ij-only variant too
    fij = {r["id"]: r for r in S2.with_s2_face_ij(df, 12).collect()}
    assert fij[1]["s2_face"] is None and fij[4]["s2_i"] is None
    assert fij[6]["s2_face"] == good["s2_face"]
