"""M1: pages source determinism, geolocation, tile assignment, cell index,
byte-identity of text through every stage (BASELINE input_hint invariant)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pygridmap_spark.core.bboxes import tile_assign
from pygridmap_spark.functions import cellindex as CI
from pygridmap_spark.functions import geolocate as GEO
from pygridmap_spark.functions import tiling as TF
from pygridmap_spark.functions.cellindex import py_cell_xy, py_morton
from pygridmap_spark.functions.geolocate import py_lat_lon
from pygridmap_spark.sources import pages as P
from pygridmap_spark.sources.pages import py_text, py_url


@pytest.fixture(scope="module")
def pages_df(spark):
    return P.pages(spark, 500).cache()


def test_pages_determinism_vs_python_twin(pages_df):
    rows = pages_df.orderBy("url").limit(20).collect()
    for r in rows:
        assert r["text"] == py_text(r["url"])
        assert r["html"] == f"<html><body>{r['text']}</body></html>".encode()


def test_pages_urls_cover_ids(spark):
    df = P.pages(spark, 100, n_hosts=10)
    urls = {r[0] for r in df.select("url").collect()}
    assert urls == {py_url(i, 10) for i in range(100)}


def test_geolocation_matches_python_twin(pages_df):
    rows = GEO.with_geolocation(pages_df).select("url", "lat", "lon").limit(50).collect()
    for r in rows:
        lat, lon = py_lat_lon(r["url"])
        assert r["lat"] == pytest.approx(lat, abs=1e-12)
        assert r["lon"] == pytest.approx(lon, abs=1e-12)
        assert -60 <= r["lat"] <= 70 and -180 <= r["lon"] <= 180


def test_tile_assignment_matches_kernel(pages_df):
    df = TF.with_tile_assignment(
        GEO.with_geolocation(pages_df), resolution=0.01, tile_size_cell=128, x="lon", y="lat"
    )
    for r in df.select("lon", "lat", "xt", "yt", "cx", "cy").limit(50).collect():
        assert (r["xt"], r["yt"], r["cx"], r["cy"]) == tile_assign(
            r["lon"], r["lat"], 0.01, 128
        )
        assert 0 <= r["cx"] <= 127 and 0 <= r["cy"] <= 127


def test_cell_index_matches_python_twin(pages_df):
    df = CI.with_cell_index(GEO.with_geolocation(pages_df), 8)
    for r in df.select("lon", "lat", "cell_ix", "cell_iy", "cell_id").limit(50).collect():
        ix, iy = py_cell_xy(r["lon"], r["lat"], 8)
        assert (r["cell_ix"], r["cell_iy"]) == (ix, iy)
        assert r["cell_id"] == py_morton(ix, iy)


def test_quadkey_roundtrip(spark):
    df = spark.createDataFrame([(0.0, 0.0), (-179.9, -89.9), (179.9, 89.9)], "lon double, lat double")
    out = df.select(CI.quadkey(F.col("lon"), F.col("lat"), 4).alias("qk")).collect()
    assert all(len(r["qk"]) == 4 and set(r["qk"]) <= set("0123") for r in out)
    assert out[1]["qk"] == "0000"  # SW corner
    assert out[2]["qk"] == "3333"  # NE corner


def test_text_byte_identity_through_pipeline(spark, tmp_path, pages_df):
    """sha256(text) per url unchanged across geolocate -> encode -> tile ->
    partitioned write -> read-back (the north-star per-row invariant)."""
    src_hash = {
        r["url"]: hashlib.sha256(r["text"].encode()).hexdigest()
        for r in pages_df.select("url", "text").collect()
    }
    df = CI.with_cell_index(GEO.with_geolocation(pages_df), 8)
    df = TF.with_tile_assignment(df, 0.01, 128, x="lon", y="lat")
    out_dir = str(tmp_path / "tiles")
    df.write.partitionBy("xt", "yt").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    assert back.count() == len(src_hash)
    for r in back.select("url", "text").collect():
        assert hashlib.sha256(r["text"].encode()).hexdigest() == src_hash[r["url"]]


def test_morton_prefix_and_skew_tools(spark, pages_df):
    from pygridmap_spark.plans import skew

    df = CI.with_cell_index(GEO.with_geolocation(pages_df), 8)
    pref = df.select(CI.morton_prefix(F.col("cell_id"), 2).alias("p"), "cell_id").limit(10).collect()
    for r in pref:
        assert r["p"] == r["cell_id"] >> 4
    salted = skew.salted_repartition(df, ["cell_id"], salt=4, discriminator="url")
    assert salted.count() == df.count()
    hist = skew.key_histogram(df, ["cell_id"], top=5).collect()
    assert len(hist) <= 5


def test_salted_repartition_balances_hot_key(spark):
    """90%-hot-key data: plain repartition on the key puts the hot key in
    one partition; salting spreads it across ~salt partitions."""
    from pyspark.sql import functions as F

    from pygridmap_spark.plans import skew

    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("cell_id"),
        F.col("id").cast("string").alias("url"),
    )
    plain = df.repartition(8, "cell_id").withColumn(
        "p", F.spark_partition_id()
    )
    hot_parts_plain = (
        plain.filter("cell_id = 7").select("p").distinct().count()
    )
    salted = skew.salted_repartition(
        df, ["cell_id"], salt=8, discriminator="url", num_partitions=8
    ).withColumn("p", F.spark_partition_id())
    hot_parts_salted = (
        salted.filter("cell_id = 7").select("p").distinct().count()
    )
    assert hot_parts_plain == 1
    assert hot_parts_salted >= 4  # hot key spread over most partitions


def test_crop_grid_variants(spark):
    from pygridmap_spark.operators import gridding as GR
    from pygridmap_spark.operators.overlay import crop_grid

    g = GR.grid_maker(
        spark, bbox=(0.0, 0.0, 100_000.0, 100_000.0), cell=(10_000.0, 10_000.0), tile=(5, 5)
    )
    assert crop_grid(g, tile=0).count() == 25
    assert crop_grid(g, cell_range=(0, 0, 3, 3)).count() == 9
    assert crop_grid(g, bbox=(0.0, 0.0, 25_000.0, 15_000.0)).count() == 3 * 2


def test_morton_64bit_bijection_at_bound(spark):
    """Round-3: MAX_Z raised 16 -> 31 (64-bit spreading). Bijection pinned
    at the new bound: distinct (ix, iy) pairs -> distinct codes, Python
    twin == Spark expression, interleave exactly recoverable, and the code
    stays NON-NEGATIVE (sign bit untouched — Z-order monotonic in a signed
    long)."""
    import random

    from pygridmap_spark.functions import cellindex as CI

    z = 31
    n = 1 << z
    rng = random.Random(7)
    pts = [(0, 0), (n - 1, n - 1), (n - 1, 0), (0, n - 1)] + [
        (rng.randrange(n), rng.randrange(n)) for _ in range(200)
    ]
    codes = [CI.py_morton(ix, iy) for ix, iy in pts]
    assert len(set(codes)) == len(set(pts))  # injective on the sample
    assert all(c >= 0 for c in codes)
    assert CI.py_morton(n - 1, n - 1) == (1 << 62) - 1  # fills exactly 62 bits

    def unspread(v):
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        v = (v | (v >> 16)) & 0xFFFFFFFF
        return v

    for (ix, iy), c in zip(pts, codes):
        assert (unspread(c), unspread(c >> 1)) == (ix, iy)  # exact inverse

    df = spark.createDataFrame(pts, "ix long, iy long")
    got = df.select(CI.morton(F.col("ix"), F.col("iy")).alias("m")).collect()
    assert [r["m"] for r in got] == codes  # Catalyst == Python twin
    with pytest.raises(ValueError, match="31"):
        CI.lonlat_to_cell_xy(F.lit(0.0), F.lit(0.0), 32)
