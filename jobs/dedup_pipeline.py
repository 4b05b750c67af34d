#!/usr/bin/env python
"""Training-data dedup pipeline job: exact dedup -> MinHash+LSH near-dup
pairs -> connected-components dup groups -> keep-one-per-group corpus,
with per-stage lineage checkpoints and quality/language filters.

The canonical web-corpus cleaning sequence (the reason the engine ships
dedup as first-class operators):

  1. quality gate   — drop empty / too-short / low-quality docs (pure
                      Catalyst text scoring, no shuffle); opt-in
                      repetition gate (--max-dup-line-frac) and benchmark
                      decontamination (--benchmark) compose here,
  2. exact dedup    — one fingerprint shuffle, keep min-id per fingerprint,
  3. near-dup pairs — MinHash signatures (Arrow kernel) -> LSH banding
                      (ids-only shuffle) -> exact Jaccard verify,
  4. dup groups     — pointer-jumping connected components over the pair
                      graph (O(log diameter) rounds),
  5. keep-one       — anti-join the non-canonical members out,
  6. mix + pack     — opt-in deterministic stratified sample
                      (--sample-fractions) and sequence-packing
                      coordinates (--pack-max-tokens): the
                      training-ready tail, checkpointed as
                      s5_training_ready.

Every stage checkpoints to parquet with a per-partition row-count/hash
manifest (plans.lineage); a restart with the same --output skips completed
stages. Submit (cluster):

    spark-submit --py-files pygridmap_spark.zip jobs/dedup_pipeline.py \
        --input <documents parquet> --output <work dir> \
        [--jaccard 0.8] [--num-hashes 64] [--bands 16] [--min-tokens 5]

Local smoke run:
    python jobs/dedup_pipeline.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/dd
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument(
        "--max-bucket", type=int, default=100_000,
        help="drop LSH buckets wider than this (boilerplate guard); 0 disables",
    )
    ap.add_argument(
        "--max-dup-line-frac", type=float, default=0.0,
        help="if > 0, drop docs whose duplicate-line fraction exceeds this "
             "(Gopher-style repetition gate)",
    )
    ap.add_argument(
        "--max-top-bigram-frac", type=float, default=1.0,
        help="with --max-dup-line-frac: top-bigram coverage ceiling",
    )
    ap.add_argument(
        "--benchmark", default=None,
        help="benchmark parquet; if set, docs with n-gram "
             "contamination > --max-contamination are dropped",
    )
    ap.add_argument(
        "--benchmark-text-col", default="text",
        help="text column name in the benchmark parquet",
    )
    ap.add_argument("--max-contamination", type=float, default=0.05)
    ap.add_argument("--contamination-ngram", type=int, default=13)
    ap.add_argument(
        "--line-dedup-min-docs", type=int, default=0,
        help="if > 0, strip lines occurring in at least this many distinct "
             "docs (MassiveText boilerplate-line removal) before dedup",
    )
    ap.add_argument(
        "--sample-fractions", default=None,
        help="comma list stratum=fraction (e.g. 'src0=1.0,src1=0.1') for a "
             "deterministic post-dedup mixing sample; strata not listed "
             "are dropped",
    )
    ap.add_argument("--sample-strata-col", default="source")
    ap.add_argument("--sample-seed", default="mix-v1")
    ap.add_argument(
        "--pack-max-tokens", type=int, default=0,
        help="if > 0, append sequence-packing coordinates (seq_id/offset/"
             "span; shard = hash of id into 64) to the survivor output",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pygridmap_spark.functions import text as TX
    from pygridmap_spark.operators import curation as CU
    from pygridmap_spark.operators import dedup as DD
    from pygridmap_spark.plans import lineage
    from pygridmap_spark.session import get_spark

    spark = get_spark(app="dedup_pipeline")
    docs = spark.read.parquet(args.input)
    idc, txt = args.id_col, args.text_col
    # parameters are part of every stage's lineage identity: a rerun with
    # the same --output but a different threshold must RECOMPUTE, not
    # silently serve the old checkpoint
    params = (
        f"jaccard={args.jaccard},num_hashes={args.num_hashes},bands={args.bands},"
        f"min_tokens={args.min_tokens},max_bucket={args.max_bucket},"
        f"rep={args.max_dup_line_frac}/{args.max_top_bigram_frac},"
        f"decontam={args.benchmark}/{args.benchmark_text_col}:"
        f"{args.max_contamination}@{args.contamination_ngram},"
        f"linededup={args.line_dedup_min_docs},"
        f"mix={args.sample_fractions}@{args.sample_seed},"
        f"pack={args.pack_max_tokens}"
    )

    # 1. quality gate — null filter, then (opt-in) boilerplate line
    # removal, THEN the token gate: the gate must judge the CLEANED text,
    # or docs reduced to nothing by line removal would survive to the
    # final corpus
    gated = docs.filter(F.col(txt).isNotNull())
    if args.line_dedup_min_docs > 0:
        gated = CU.line_dedup(
            gated, min_docs=args.line_dedup_min_docs, id_col=idc, text_col=txt
        ).drop("n_lines_removed")
    gated = gated.filter(TX.token_count(F.col(txt)) >= args.min_tokens)
    # 1b. repetition gate (opt-in) — Gopher-style within-doc repetition
    if args.max_dup_line_frac > 0:
        gated = CU.repetition_filter(
            gated,
            max_dup_line_frac=args.max_dup_line_frac,
            max_top_bigram_frac=args.max_top_bigram_frac,
            id_col=idc, text_col=txt,
        )
    # 1c. benchmark decontamination (opt-in) — broadcast n-gram overlap
    if args.benchmark:
        gated = CU.decontaminate(
            gated, spark.read.parquet(args.benchmark),
            max_contamination=args.max_contamination,
            n=args.contamination_ngram, id_col=idc, text_col=txt,
            bench_text_col=args.benchmark_text_col,
        )
    gated = lineage.checkpoint(
        gated, os.path.join(args.output, "s1_gated"), stage="quality_gate",
        inputs=[args.input, params],
    )

    # 2. exact dedup
    exact = lineage.checkpoint(
        DD.dedup_exact(gated, idc, txt),
        os.path.join(args.output, "s2_exact"), stage="exact_dedup",
        inputs=[os.path.join(args.output, "s1_gated"), params],
    )

    # 3. near-dup pairs (MinHash + LSH + exact-Jaccard verify)
    pairs = lineage.checkpoint(
        DD.minhash_lsh_pairs(
            exact, idc, txt,
            num_hashes=args.num_hashes, bands=args.bands,
            jaccard_threshold=args.jaccard,
            max_bucket=args.max_bucket or None,
        ),
        os.path.join(args.output, "s3_pairs"), stage="near_dup_pairs",
        inputs=[os.path.join(args.output, "s2_exact"), params],
    )

    # 4. dup groups; 5. keep the canonical (min-id) member of each group
    if pairs.isEmpty():
        survivors = exact
    else:
        comps = DD.connected_components(pairs, "doc_a", "doc_b")
        drop = comps.filter(F.col("doc_id") != F.col("component_id")).select(
            F.col("doc_id").alias(idc)
        )
        survivors = exact.join(drop, idc, "left_anti")
    survivors = lineage.checkpoint(
        survivors, os.path.join(args.output, "s4_survivors"), stage="keep_one",
        inputs=[os.path.join(args.output, "s3_pairs"), params],
    )

    # 6. (opt-in) deterministic mixing sample + sequence packing: the
    # "raw crawl -> training-ready" tail of the pipeline
    if args.sample_fractions:
        from pygridmap_spark.operators import sampling as SMP

        fracs = dict(
            (k, float(v))
            for k, v in (kv.split("=") for kv in args.sample_fractions.split(","))
        )
        survivors = SMP.stratified_sample(
            survivors, fracs, strata_col=args.sample_strata_col,
            key_col=idc, seed=args.sample_seed,
        )
    if args.pack_max_tokens > 0:
        from pygridmap_spark.functions import text as TX2
        from pygridmap_spark.operators import packing as PKG

        survivors = PKG.pack_sequences(
            survivors.withColumn("n_tokens", TX2.token_count(F.col(txt)))
            .withColumn("shard", F.pmod(F.xxhash64(F.col(idc)), F.lit(64))),
            args.pack_max_tokens, order_col=idc, shard_col="shard",
        )
    if args.sample_fractions or args.pack_max_tokens > 0:
        survivors = lineage.checkpoint(
            survivors, os.path.join(args.output, "s5_training_ready"),
            stage="mix_pack",
            inputs=[os.path.join(args.output, "s4_survivors"), params],
        )

    n_in, n_gated, n_exact, n_out = (
        docs.count(), gated.count(), exact.count(), survivors.count()
    )
    print(
        f"dedup_pipeline: {n_in} in -> {n_gated} after quality gate -> "
        f"{n_exact} after exact dedup -> {n_out} survivors "
        f"({n_in - n_out} removed)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
