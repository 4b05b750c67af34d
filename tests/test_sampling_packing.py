"""Deterministic sampling (data mixing) and sequence-packing operators."""

import pytest
from pyspark.sql import functions as F

from pygridmap_spark.operators import packing as PK
from pygridmap_spark.operators import sampling as SA


def _docs(spark, n=10000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("wiki"), F.lit("cc"), F.lit("books")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("source"),
    )


def test_deterministic_sample_rate_and_reproducibility(spark):
    docs = _docs(spark)
    n = SA.deterministic_sample(docs, 0.25).count()
    assert abs(n / 10000 - 0.25) < 0.02  # md5 buckets are uniform enough
    # identical sample regardless of partitioning (df.sample is NOT)
    ids_a = {r.doc_id for r in SA.deterministic_sample(docs, 0.25).collect()}
    ids_b = {r.doc_id for r in SA.deterministic_sample(docs.repartition(13), 0.25).collect()}
    assert ids_a == ids_b
    # different seed -> different (independent) sample
    ids_c = {r.doc_id for r in SA.deterministic_sample(docs, 0.25, seed="other").collect()}
    assert ids_a != ids_c


def test_deterministic_sample_bounds(spark):
    docs = _docs(spark, 100)
    assert SA.deterministic_sample(docs, 0.0).count() == 0
    assert SA.deterministic_sample(docs, 1.0).count() == 100
    with pytest.raises(ValueError):
        SA.deterministic_sample(docs, 1.5)


def test_stratified_sample(spark):
    docs = _docs(spark)
    got = {
        r["source"]: r["count"]
        for r in SA.stratified_sample(
            docs, {"wiki": 1.0, "cc": 0.1}, strata_col="source"
        )
        .groupBy("source")
        .count()
        .collect()
    }
    assert got["wiki"] == 3334  # fraction 1.0 keeps every row
    assert abs(got["cc"] / 3333 - 0.1) < 0.03
    assert "books" not in got  # default_fraction=0.0 drops unlisted strata


def test_pack_sequences(spark):
    rows = [(i, 0, t) for i, t in enumerate([300, 300, 300, 300, 2048, 100, 0, 500])]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
    got = {
        r.doc_id: (r.seq_id, r.seq_offset, r.n_seqs)
        for r in PK.pack_sequences(df, 1024, shard_col="shard").collect()
    }
    assert got[0] == (0, 0, 1)
    assert got[3] == (0, 900, 2)  # straddles the 1024 boundary
    assert got[4] == (1, 176, 3)  # 2048 tokens span three sequences
    assert got[6] == (3, 276, 0)  # empty doc: position recorded, 0 seqs
    assert got[7] == (3, 276, 1)


def test_pack_sequences_sharded_determinism(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("shard"),
        (F.col("id") % 97 + 1).alias("n_tokens"),
    )
    a = sorted(map(tuple, PK.pack_sequences(df, 512, shard_col="shard").collect()))
    b = sorted(
        map(tuple, PK.pack_sequences(df.repartition(7), 512, shard_col="shard").collect())
    )
    assert a == b
    with pytest.raises(ValueError):
        PK.pack_sequences(df, 0, shard_col="shard")


def test_chunk_documents(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 11), (4, 25), (5, 0)], "doc_id long, n_tokens long"
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_end)
        for r in PK.chunk_documents(df, window=10, overlap=2).collect()
    }
    assert got[(1, 0)] == (0, 5)  # short doc: one truncated chunk
    assert got[(2, 0)] == (0, 10)  # exact fit: one chunk
    assert got[(3, 0)] == (0, 10) and got[(3, 1)] == (8, 11)
    assert got[(4, 2)] == (16, 25)
    assert not any(d == 5 for d, _ in got)  # empty doc emits nothing
    assert len(got) == 7
    with pytest.raises(ValueError):
        PK.chunk_documents(df, window=10, overlap=10)


def test_chunk_documents_null_tokens_emit_nothing(spark):
    df = spark.createDataFrame([(1, 50), (2, None)], "doc_id long, n_tokens long")
    rows = PK.chunk_documents(df, window=10).collect()
    assert {r.doc_id for r in rows} == {1}  # NULL-token row: no phantom chunk


def test_null_keys_survive_full_fraction(spark):
    # a fraction=1.0 "keep all" stratum must keep NULL-keyed rows too
    # (review finding: NULL key -> NULL bucket -> silently dropped)
    df = spark.createDataFrame(
        [(None, "wiki"), ("a", "wiki"), (None, "cc")], "k string, source string"
    )
    assert SA.deterministic_sample(df, 1.0, key_col="k").count() == 3
    kept = SA.stratified_sample(
        df, {"wiki": 1.0}, strata_col="source", key_col="k"
    ).collect()
    assert sorted(((r.k or "", r.source) for r in kept)) == [("", "wiki"), ("a", "wiki")]


def test_pack_sequences_warns_on_global_window(spark, caplog):
    import logging

    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n_tokens long")
    with caplog.at_level(logging.WARNING, logger="pygridmap_spark.operators.packing"):
        PK.pack_sequences(df, 1024).collect()
    assert any("single-partition" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="pygridmap_spark.operators.packing"):
        PK.pack_sequences(
            df.withColumn("shard", F.lit(0)), 1024, shard_col="shard"
        ).collect()
    assert not caplog.records


# --- weighted sampling without replacement (Efraimidis-Spirakis) -----------


def _es_twin(rows, k, seed=""):
    """Python twin of weighted_sample's exact md5 arithmetic."""
    import hashlib
    import math

    scored = []
    for key, wgt in rows:
        if wgt is None or not (wgt > 0) or wgt != wgt:
            continue
        h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 4294967296.0
        scored.append((math.log(u) / float(wgt), key))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [key for _s, key in scored[:k]]


def test_weighted_sample_matches_python_twin(spark):
    from pygridmap_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7919) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 50, "w", key_col="doc_id", seed="s1").collect()
    )
    assert got == sorted(_es_twin(rows, 50, seed="s1"))


def test_weighted_sample_grouped_quota(spark):
    from pygridmap_spark.operators.sampling import weighted_sample

    rows = [(i, f"g{i % 3}", float(1 + i % 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample(df, 20, "w", by="grp", key_col="doc_id").collect()
    per = {}
    for r in out:
        per[r["grp"]] = per.get(r["grp"], 0) + 1
    assert per == {"g0": 20, "g1": 20, "g2": 20}
    # per-group membership equals the per-group twin
    for g in ("g0", "g1", "g2"):
        twin = _es_twin([(i, w) for i, gg, w in rows if gg == g], 20)
        got = sorted(r["doc_id"] for r in out if r["grp"] == g)
        assert got == sorted(twin), g


def test_weighted_sample_adversarial_weight_range(spark):
    # r6 bucketing change (histogram over -ln(-score)): the adversarial
    # distribution the ADVICE flagged — a stratum of heavy weights whose
    # A-ES scores all cluster just below 0, plus single light-weight rows
    # pinning the group min around -20. The selected set must still equal
    # the per-group python twin exactly (the transform only redirects the
    # histogram; ranking stays on the true score).
    from pygridmap_spark.operators.sampling import weighted_sample

    rows = []
    for i in range(400):
        g = f"g{i % 2}"
        # n_chars-like heavy weights with two outlier light rows per group
        w = 0.001 if i < 4 else float(5_000 + (i * 7919) % 100_000)
        rows.append((i, g, w))
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample(df, 25, "w", by="grp", key_col="doc_id").collect()
    for g in ("g0", "g1"):
        twin = _es_twin([(i, w) for i, gg, w in rows if gg == g], 25)
        got = sorted(r["doc_id"] for r in out if r["grp"] == g)
        assert got == sorted(twin), g


def test_weighted_sample_weight_bias(spark):
    # one row with overwhelming weight is (effectively) always included
    from pygridmap_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0) for i in range(200)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, 10, "w").collect()}
    assert 999 in got and len(got) == 10


def test_weighted_sample_contracts(spark):
    from pygridmap_spark.operators.sampling import weighted_sample

    rows = [(1, 2.0), (2, None), (3, 0.0), (4, -1.0), (5, float("nan")), (6, 3.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 6}  # bad weights dropped, k > n keeps all valid
    import pytest as _pt

    with _pt.raises(ValueError, match="k must be"):
        weighted_sample(df, -1, "w")
    # determinism across partitionings
    a = {r["doc_id"] for r in weighted_sample(df.repartition(7), 1, "w").collect()}
    b = {r["doc_id"] for r in weighted_sample(df.coalesce(1), 1, "w").collect()}
    assert a == b
