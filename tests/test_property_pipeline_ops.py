"""Bulk property tests for the training-pipeline operators: one Spark job
over a large seeded-random input, invariants asserted over every row (the
Spark-operator analog of the hypothesis geometry suite — per-example Spark
jobs would be prohibitively slow)."""

import numpy as np
from pyspark.sql import functions as F

from pygridmap_spark.operators import packing as PK
from pygridmap_spark.operators import sampling as SA


def test_pack_sequences_invariants_bulk(spark):
    """Per shard, in order: offset == cum % L, seq_id == cum // L, n_seqs
    is exactly the token span's sequence count, and offsets chain (next
    cum = prev cum + tokens)."""
    L = 777
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64("id") % 13).alias("shard"),
        # skewed sizes incl. zeros and > L
        (F.abs(F.xxhash64("id", F.lit(1))) % 2000).alias("n_tokens"),
    )
    rows = PK.pack_sequences(df, L, shard_col="shard").collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    n_checked = 0
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.seq_id == cum // L
            assert r.seq_offset == cum % L
            if r.n_tokens == 0:
                assert r.n_seqs == 0
            else:
                assert r.n_seqs == (cum + r.n_tokens - 1) // L - cum // L + 1
            cum += r.n_tokens
            n_checked += 1
    assert n_checked == 5000


def test_chunk_documents_coverage_bulk(spark):
    """Chunks tile [0, len): starts advance by stride, ends are capped at
    len, every token position is covered, and no chunk is empty."""
    W, O = 100, 30
    stride = W - O
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.abs(F.xxhash64("id")) % 500).alias("n_tokens"),
    )
    lens = {r.doc_id: r.n_tokens for r in df.collect()}
    rows = PK.chunk_documents(df, window=W, overlap=O).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, ln in lens.items():
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_idx)
        if ln == 0:
            assert not chunks
            continue
        covered = np.zeros(ln, dtype=bool)
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.chunk_start == i * stride
            assert c.chunk_start < c.chunk_end <= ln
            assert c.chunk_end - c.chunk_start <= W
            covered[c.chunk_start : c.chunk_end] = True
        assert covered.all()
        # minimality: dropping the last chunk must leave a gap (no
        # redundant trailing chunk)
        if len(chunks) > 1:
            assert chunks[-2].chunk_end < ln


def test_deterministic_sample_nesting(spark):
    """Same seed, increasing fraction => strictly nested samples (the
    bucket threshold test): growing a mixture rate only ADDS documents —
    the property that makes rate changes reproducible/incremental."""
    docs = spark.range(20000).select(F.col("id").alias("doc_id"))
    prev: set = set()
    for frac in (0.05, 0.2, 0.5, 1.0):
        cur = {r.doc_id for r in SA.deterministic_sample(docs, frac).collect()}
        assert prev <= cur
        prev = cur
    assert len(prev) == 20000  # fraction 1.0 keeps everything


def test_line_dedup_identity_when_all_lines_unique(spark):
    """A corpus whose every line is globally unique passes through
    byte-identical (the no-boilerplate fixed point)."""
    from pygridmap_spark.operators import curation as CU

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha "), F.col("id"), F.lit("\nbeta "), F.col("id")
        ).alias("text"),
    )
    before = {r.doc_id: r.text for r in docs.collect()}
    after = {r.doc_id: (r.text, r.n_lines_removed) for r in CU.line_dedup(docs, min_docs=2).collect()}
    for d, t in before.items():
        assert after[d] == (t, 0)
