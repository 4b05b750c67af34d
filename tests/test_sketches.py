"""Mergeable HLL distinct-count sketch rollups."""

from pyspark.sql import functions as F

from pygridmap_spark.operators import sketches as SK


def _events(spark):
    # 7 groups x 5000 true distinct values each (every group sees all)
    return spark.range(100_000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 5000).alias("v"),
        (F.col("id") % 3).alias("shard"),
    )


def test_sketch_estimate_within_hll_error(spark):
    df = _events(spark)
    got = SK.distinct_sketch_rollup(df, ["g"], "v")
    rows = got.collect()
    assert len(rows) == 7
    for r in rows:
        assert abs(r.approx_distinct - 5000) / 5000 < 0.05  # lgK=12 ~1.6% typical
    # higher lgK must not be worse on average
    hi = SK.distinct_sketch_rollup(df, ["g"], "v", lgk=14).collect()
    assert all(abs(r.approx_distinct - 5000) / 5000 < 0.03 for r in hi)


def test_sketch_merge_identity(spark):
    """Merging per-shard sketches == sketching the whole input, exactly:
    the union is deterministic in the value set — the property that makes
    stored per-day rollups safely combinable months later."""
    df = _events(spark)
    whole = {
        (r.g,): r.approx_distinct
        for r in SK.distinct_sketch_rollup(df, ["g"], "v").collect()
    }
    per_shard = SK.distinct_sketch_rollup(df, ["g", "shard"], "v")
    merged = {
        (r.g,): r.approx_distinct
        for r in SK.merge_sketch_rollups(per_shard, ["g"]).collect()
    }
    assert merged == whole


def test_sketch_merge_tolerates_mixed_lgk(spark):
    """Rollups stored in different periods with different lgk must merge
    (union downgrades precision) instead of throwing."""
    df = _events(spark)
    a = SK.distinct_sketch_rollup(df.filter(F.col("shard") == 0), ["g"], "v", lgk=12)
    b = SK.distinct_sketch_rollup(df.filter(F.col("shard") != 0), ["g"], "v", lgk=14)
    merged = SK.merge_sketch_rollups(a.unionByName(b), ["g"]).collect()
    assert len(merged) == 7
    for r in merged:
        assert abs(r.approx_distinct - 5000) / 5000 < 0.05
