"""Geohash encode/decode (functions/cellindex.py) — the web's base-32 cell
key (Niemeyer 2008, public domain). Pinned against the two canonical public
test vectors, the scalar twin, the truncation-prefix property, and exact
cell-center roundtrips at every precision."""

import math

from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex as CI

# The two textbook vectors (geohash.org / Wikipedia "Geohash"):
KNOWN = [
    (10.40744, 57.64911, 11, "u4pruydqqvj"),
    (-5.603, 42.605, 5, "ezs42"),
]


def test_py_geohash_known_vectors():
    for lon, lat, p, want in KNOWN:
        assert CI.py_geohash(lon, lat, p) == want
        glon, glat = CI.py_geohash_decode(want)
        assert CI.py_geohash(glon, glat, p) == want  # center re-encodes


def test_geohash_catalyst_matches_scalar_twin(spark):
    # Grid sweep incl. poles, dateline, clamp-out-of-range, both parities.
    pts = [
        (i, -180.0 + (i * 77) % 360 + 0.123, -90.0 + (i * 37) % 180 + 0.456)
        for i in range(60)
    ]
    pts += [(100, 180.0, 90.0), (101, -180.0, -90.0), (102, 200.0, -95.0)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    for p in (1, 5, 6, 11, 12):
        got = {
            r["id"]: r["gh"]
            for r in df.select(
                "id", CI.geohash(F.col("lon"), F.col("lat"), p).alias("gh")
            ).collect()
        }
        for i, lon, lat in pts:
            assert got[i] == CI.py_geohash(lon, lat, p), (i, p)


def test_geohash_decode_roundtrip_catalyst(spark):
    df = spark.createDataFrame(
        [(i, -179.9 + i * 6.7, -89.9 + i * 3.3) for i in range(54)],
        "id long, lon double, lat double",
    )
    for p in (2, 7, 12):
        gh = df.select("id", CI.geohash(F.col("lon"), F.col("lat"), p).alias("gh"))
        lon2, lat2 = CI.geohash_decode(F.col("gh"), p)
        back = gh.select(
            "id", "gh", CI.geohash(lon2, lat2, p).alias("gh2"), lon2.alias("clon")
        )
        rows = back.collect()
        assert all(r["gh"] == r["gh2"] for r in rows)
        # decoded center stays inside the cell width
        width = 360.0 / (1 << ((5 * p + 1) // 2))
        for r in rows:
            glon, _ = CI.py_geohash_decode(r["gh"])
            assert math.isclose(r["clon"], glon, abs_tol=width * 1e-9)


def test_geohash_truncation_prefix_property():
    # geohash(p-1) IS the first p-1 chars of geohash(p) — the containment
    # property that makes prefix-range scans work as cell coarsening.
    for lon, lat in [(10.4, 57.6), (-5.6, 42.6), (179.99, -89.99), (0.0, 0.0)]:
        full = CI.py_geohash(lon, lat, 12)
        for p in range(1, 12):
            assert CI.py_geohash(lon, lat, p) == full[:p]


def test_geohash_null_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, 10.0, None), (3, 10.0, 10.0),
         (4, float("nan"), 10.0), (5, 10.0, float("nan"))],
        "id long, lon double, lat double",
    )
    out = df.select("id", CI.geohash(F.col("lon"), F.col("lat"), 6).alias("gh")).collect()
    vals = {r["id"]: r["gh"] for r in out}
    assert vals[1] is None and vals[2] is None
    # NaN passes >= comparisons and would land in the (-180,-90) corner
    # cell ('000000') — must be NULL like the null-coord case
    assert vals[4] is None and vals[5] is None
    assert vals[3] == CI.py_geohash(10.0, 10.0, 6)
    import pytest

    with pytest.raises(ValueError):
        CI.geohash(F.col("lon"), F.col("lat"), 13)
    with pytest.raises(ValueError):
        CI.geohash(F.col("lon"), F.col("lat"), 0)


def test_with_geohash_helper(spark):
    df = spark.createDataFrame([(1, 10.40744, 57.64911)], "id long, lon double, lat double")
    out = CI.with_geohash(df, 11)
    assert out.columns[-1] == "geohash"
    assert out.collect()[0]["geohash"] == "u4pruydqqvj"


# --- property tests (scalar twins; no Spark) ----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    st.integers(min_value=1, max_value=12),
)
def test_property_decode_center_reencodes(lon, lat, p):
    gh = CI.py_geohash(lon, lat, p)
    assert len(gh) == p and all(c in CI.GEOHASH_ALPHABET for c in gh)
    clon, clat = CI.py_geohash_decode(gh)
    assert CI.py_geohash(clon, clat, p) == gh
    # the center never leaves the cell: within half a cell of the input
    # along each axis (modulo the edge clamp)
    lonbits = (5 * p + 1) // 2
    latbits = 5 * p // 2
    if -180.0 <= lon < 180.0:
        assert abs(clon - lon) <= 360.0 / (1 << lonbits)
    if -90.0 <= lat < 90.0:
        assert abs(clat - lat) <= 180.0 / (1 << latbits)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-179.999, max_value=179.999, allow_nan=False),
    st.floats(min_value=-89.999, max_value=89.999, allow_nan=False),
)
def test_property_prefix_is_containment(lon, lat):
    full = CI.py_geohash(lon, lat, 12)
    for p in range(1, 12):
        assert CI.py_geohash(lon, lat, p) == full[:p]


# --- neighbors -----------------------------------------------------------------


def test_py_neighbors_geometry():
    # each neighbor's center is exactly one cell step away (wrapped in lon)
    for gh in ("ezs42", "u4pruy", "s0000", "zzzzz"):
        p = len(gh)
        lonbits, latbits = (5 * p + 1) // 2, 5 * p // 2
        w, h = 360.0 / (1 << lonbits), 180.0 / (1 << latbits)
        clon, clat = CI.py_geohash_decode(gh)
        for (dx, dy), ngh in zip(CI.GEOHASH_NEIGHBOR_OFFSETS, CI.py_geohash_neighbors(gh)):
            if ngh is None:
                continue
            nlon, nlat = CI.py_geohash_decode(ngh)
            dlon = (nlon - clon + 180.0) % 360.0 - 180.0
            assert abs(dlon - dx * w) < 1e-9, (gh, dx, dy)
            assert abs((nlat - clat) - dy * h) < 1e-9, (gh, dx, dy)


def test_py_neighbors_symmetry_and_pole_clamp():
    # adjacency is symmetric; the pole-adjacent row loses its 3 north slots
    gh = CI.py_geohash(10.0, 45.0, 6)
    for ngh in CI.py_geohash_neighbors(gh):
        assert ngh is not None
        assert gh in CI.py_geohash_neighbors(ngh)
    top = CI.py_geohash(10.0, 89.999999, 5)
    ns = CI.py_geohash_neighbors(top)
    assert sum(n is None for n in ns) == 3  # N, NW, NE clamp at the pole
    # antimeridian wrap: west of the westernmost column is the easternmost
    west_edge = CI.py_geohash(-179.999999, 0.0, 5)
    wn = CI.py_geohash_neighbors(west_edge)[0]  # slot 0 = W
    assert wn is not None
    nlon, _ = CI.py_geohash_decode(wn)
    assert nlon > 179.0


def test_catalyst_neighbors_match_twin(spark):
    ghs = [
        CI.py_geohash(-180.0 + (i * 77.7) % 360, -90.0 + (i * 37.3) % 180, 5 + i % 3)
        for i in range(30)
    ]
    for p in (5, 6, 7):
        sub = [g for g in ghs if len(g) == p]
        df = spark.createDataFrame([(g,) for g in sub], "gh string")
        got = {
            r["gh"]: r["n"]
            for r in df.select("gh", CI.geohash_neighbors(F.col("gh"), p).alias("n")).collect()
        }
        for g in sub:
            assert list(got[g]) == CI.py_geohash_neighbors(g), (g, p)
