#!/usr/bin/env python
"""Volume rehearsal for the webtext-curation family (functions/pii,
functions/urls.canonical_url + dedup_by_canonical_url,
operators/linkgraph, operators/selection): synthesize crawl-shaped rows
IN Spark at --docs scale and measure wall, rows/sec, and delta-measured
exchange volume (REST stage metrics) per stage, with exact integer
checksums that must be bit-identical across parallelism levels.

  stage pii    — planted-PII text through with_pii_stats +
                 with_pii_redacted (zero-shuffle scan; the family's
                 north-rule scaling sample runs this stage at --cores and
                 --cores-b).
  stage canon  — canonical-URL dedup at volume: planted variant groups,
                 one xxhash64-keyed exchange carrying (id, url) rows.
  stage graph  — host_link_graph on 3-link synthetic pages; exchange is
                 bounded by distinct (src, dst, page) triples, never raw
                 exploded links.
  stage topfrac— the skew A/B: exact top-30% per language with one giant
                 group (80% of the corpus) — histogram+refine operator vs
                 the naive full window, identical kept-set checksums.

    python jobs/curation_rehearsal.py --stage pii --docs 20000000 \
        --cores 16 --cores-b 4
    python jobs/curation_rehearsal.py --stage topfrac --docs 20000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._metrics import shuffle_totals_gb  # noqa: E402


def _session(master: str, shuffle_parts: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        .getOrCreate()
    )


def synth_docs(spark, n: int):
    """Crawl-shaped docs: ~190-char word soup with planted PII on 3 of 5
    kinds (same synthesis family as the pii_redact driver oracle)."""
    from pyspark.sql import functions as F

    e = F.col("id")
    m = (e % 50).cast("string")
    cc = (e % 30 + 20).cast("string")
    kind = e % 5
    soup = F.concat(
        F.lit("the quick crawl page body with words and more words block "),
        (e % 1000).cast("string"),
        F.lit(" filler filler filler filler filler filler filler filler "),
        (e % 77).cast("string"),
        F.lit(" tail tail tail tail tail tail tail tail tail tail sentence"),
    )
    text = (
        F.when(kind == 0, F.concat(
            soup, F.lit(" contact user"), m, F.lit("@example"), m,
            F.lit(".com now")))
        .when(kind == 1, F.concat(
            soup, F.lit(" origin 10."), m, F.lit(".0."), m,
            F.lit(" call +44 "), cc, F.lit(" 7946 0958")))
        .when(kind == 3, F.concat(
            soup, F.lit(" dual a"), m, F.lit("@b"), m, F.lit(".org and 192.168."),
            m, F.lit(".9")))
        .otherwise(soup)
    )
    return spark.range(n).select(e.alias("doc_id"), text.alias("text"))


def run_pii(master: str, n: int, shuffle_parts: int) -> dict:
    from pyspark.sql import functions as F

    from pygridmap_spark.functions import pii as PII

    spark = _session(master, shuffle_parts, "curation-rehearsal-pii")
    try:
        docs = synth_docs(spark, n)

        def _job():
            out = PII.with_pii_redacted(PII.with_pii_stats(docs))
            return out.agg(
                F.sum("n_emails").alias("emails"),
                F.sum("n_ipv4").alias("ips"),
                F.sum("n_phones").alias("phones"),
                F.sum(F.length("text_redacted")).alias("len_sum"),
            ).collect()[0]

        _job()  # same-JVM warmup
        w0, r0 = shuffle_totals_gb(spark)
        t0 = time.time()
        row = _job()
        wall = time.time() - t0
        w1, r1 = shuffle_totals_gb(spark)
        from bench import ceiling_job

        n_ceiling = int(os.environ.get("SPARK_GRAFT_CEILING_ROWS", "400000000"))
        ceil_s = ceiling_job(
            spark, n_ceiling, spark.sparkContext.defaultParallelism * 4
        )
        return {
            "stage": "pii", "master": master, "docs": n,
            "emails": int(row["emails"]), "ips": int(row["ips"]),
            "phones": int(row["phones"]), "len_checksum": int(row["len_sum"]),
            "wall_s": round(wall, 2),
            "docs_per_sec": round(n / wall),
            "shuffle_write_gb": round(w1 - w0, 4),
            "shuffle_read_gb": round(r1 - r0, 4),
            "ceiling_s": round(ceil_s, 2),
        }
    finally:
        spark.stop()


def run_canon(master: str, n: int, shuffle_parts: int) -> dict:
    from pyspark.sql import functions as F

    from pygridmap_spark.functions import urls as U

    spark = _session(master, shuffle_parts, "curation-rehearsal-canon")
    try:
        e = F.col("id")
        q = max(n // 4, 1)
        # resource id m repeats across the 4 quarters of the id range and
        # the KIND comes from the quarter (id DIV q), so every resource
        # gets all 4 canonicalization variants — k = id % 4 would give
        # each m a single kind whenever 4 divides q and the "dedup" would
        # measure exact-string collapse, not canonicalization (review
        # finding)
        m = (e % q).cast("string")
        k = (e / F.lit(q)).cast("long")
        url = (
            F.when(k == 0, F.concat(
                F.lit("HTTPS://WWW.Site"), m, F.lit(".COM:443/p/"), m,
                F.lit("?utm_source=x#f")))
            .when(k == 1, F.concat(
                F.lit("https://www.site"), m, F.lit(".com/p/"), m))
            .when(k == 2, F.concat(
                F.lit("https://www.site"), m, F.lit(".com/p/"), m,
                F.lit("?gclid=z"), m))
            .otherwise(F.concat(
                F.lit("https://www.site"), m, F.lit(".com/p/"), m,
                F.lit("#frag")))
        )
        corpus = spark.range(n).select(e.alias("doc_id"), url.alias("url"))

        def _job():
            out = U.dedup_by_canonical_url(corpus)
            return out.agg(
                F.count(F.lit(1)).alias("kept"),
                F.sum("doc_id").alias("checksum"),
            ).collect()[0]

        _job()
        w0, r0 = shuffle_totals_gb(spark)
        t0 = time.time()
        row = _job()
        wall = time.time() - t0
        w1, r1 = shuffle_totals_gb(spark)
        return {
            "stage": "canon", "master": master, "docs": n,
            "kept": int(row["kept"]), "checksum": int(row["checksum"]),
            "wall_s": round(wall, 2), "docs_per_sec": round(n / wall),
            "shuffle_write_gb": round(w1 - w0, 4),
            "shuffle_read_gb": round(r1 - r0, 4),
        }
    finally:
        spark.stop()


def run_graph(master: str, n: int, shuffle_parts: int) -> dict:
    from pyspark.sql import functions as F

    from pygridmap_spark.operators import linkgraph as LG

    spark = _session(master, shuffle_parts, "curation-rehearsal-graph")
    try:
        e = F.col("id")
        url = F.concat(
            F.lit("https://s"), (e % 2000).cast("string"),
            F.lit(".example/p"), e.cast("string"),
        )
        html = F.concat(
            F.lit('pre <a href="https://t'), ((e * 3 + 1) % 5000).cast("string"),
            F.lit('.example/x">1</a> <a href="https://t'),
            ((e * 7 + 2) % 5000).cast("string"),
            F.lit('.example/y">2</a> <a href="http://t'),
            ((e * 11 + 5) % 5000).cast("string"),
            F.lit('.example/z">3</a> post'),
        )
        pages = spark.range(n).select(url.alias("url"), html.alias("html"))

        def _job():
            g = LG.host_link_graph(pages)
            return g.agg(
                F.count(F.lit(1)).alias("edges"),
                F.sum("n_links").alias("links"),
                F.sum("n_pages").alias("pages_sum"),
            ).collect()[0]

        _job()
        w0, r0 = shuffle_totals_gb(spark)
        t0 = time.time()
        row = _job()
        wall = time.time() - t0
        w1, r1 = shuffle_totals_gb(spark)
        return {
            "stage": "graph", "master": master, "pages": n,
            "edges": int(row["edges"]), "links": int(row["links"]),
            "pages_checksum": int(row["pages_sum"]),
            "wall_s": round(wall, 2), "pages_per_sec": round(n / wall),
            "shuffle_write_gb": round(w1 - w0, 4),
            "shuffle_read_gb": round(r1 - r0, 4),
        }
    finally:
        spark.stop()


def run_topfrac(master: str, n: int, shuffle_parts: int) -> dict:
    """Skew A/B: histogram+refine vs naive full window, identical output."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pygridmap_spark.operators import selection as SEL

    spark = _session(master, shuffle_parts, "curation-rehearsal-topfrac")
    try:
        e = F.col("id")
        df = spark.range(n).select(
            e.alias("doc_id"),
            F.when(e % 10 < 8, "en").when(e % 10 == 8, "de")
            .otherwise("fr").alias("lang"),
            ((e * 104729 % 999983).cast("double") / 999983.0).alias("q"),
        )
        out = {}

        def _hist():
            kept = SEL.topfrac_by_group(
                df, 0.3, by="lang", score_col="q", id_col="doc_id"
            )
            return kept.agg(
                F.count(F.lit(1)).alias("kept"),
                F.sum("doc_id").alias("checksum"),
            ).collect()[0]

        def _naive():
            w = Window.partitionBy("lang").orderBy(
                F.col("q").desc(), F.col("doc_id").asc()
            )
            nw = Window.partitionBy("lang")
            kept = (
                df.withColumn("__rn__", F.row_number().over(w))
                .withColumn(
                    "__k__",
                    F.ceil(F.count(F.lit(1)).over(nw) * F.lit(0.3)),
                )
                .filter(F.col("__rn__") <= F.col("__k__"))
            )
            return kept.agg(
                F.count(F.lit(1)).alias("kept"),
                F.sum("doc_id").alias("checksum"),
            ).collect()[0]

        # interleaved best-of-2 in ONE JVM (CLAUDE.md protocol: back-to-back
        # single reps on this shared VM differ 2-3x from steal alone)
        arms = (("histogram", _hist), ("naive_window", _naive))
        for _, fn in arms:
            fn()  # same-JVM warmup per arm
        samples: dict[str, list] = {name: [] for name, _ in arms}
        for _rep in range(2):
            for name, fn in arms:
                w0, r0 = shuffle_totals_gb(spark)
                t0 = time.time()
                row = fn()
                wall = time.time() - t0
                w1, r1 = shuffle_totals_gb(spark)
                samples[name].append((wall, row, w1 - w0, r1 - r0))
        for name, _ in arms:
            wall, row, dw, dr = min(samples[name], key=lambda x: x[0])
            out[name] = {
                "kept": int(row["kept"]), "checksum": int(row["checksum"]),
                "wall_s": round(wall, 2), "rows_per_sec": round(n / wall),
                "shuffle_write_gb": round(dw, 4),
                "shuffle_read_gb": round(dr, 4),
            }
        out["identical"] = (
            out["histogram"]["kept"] == out["naive_window"]["kept"]
            and out["histogram"]["checksum"] == out["naive_window"]["checksum"]
        )
        return {"stage": "topfrac", "master": master, "rows": n, **out}
    finally:
        spark.stop()


def run_quality(master: str, n: int, shuffle_parts: int) -> dict:
    """c4_clean + gopher_quality chained — both zero-shuffle projections,
    so the stage is scan/regex-bound like pii: the second north-rule
    scaling sample for the family. Planted trippers: id%11==0 short page
    (C4 min-sentences + Gopher word count), ==1 '#' flood (symbol
    ratio), ==2 bullet flood, ==3 a javascript line (C4 line rule only —
    page survives)."""
    from pyspark.sql import functions as F

    from pygridmap_spark.operators import curation as CU

    spark = _session(master, shuffle_parts, "curation-rehearsal-quality")
    try:
        e = F.col("id")
        sent = F.concat(
            F.lit("The quick brown fox number "), (e % 997).cast("string"),
            F.lit(" jumps over the lazy dog and then runs off to be with "
                  "all of that pack that have lived with other foxes. "),
        )
        # rtrim: C4's terminal-punct test reads the line's LAST char — a
        # trailing space would fail every body line
        body = F.rtrim(F.concat(sent, sent, sent))
        text = (
            F.when(e % 11 == 0, F.lit("tiny page."))
            .when(e % 11 == 1, F.concat(F.repeat(F.lit("# "), 120), body))
            .when(e % 11 == 2, F.concat(F.repeat(F.lit("• b\n"), 50), body))
            .when(e % 11 == 3, F.concat(
                F.lit("this line mentions javascript badly\n"), body))
            .otherwise(body)
        )
        docs = spark.range(n).select(e.alias("doc_id"), text.alias("text"))

        def _job():
            c4 = CU.c4_clean(docs).filter("keep_doc").select("doc_id", "text")
            out = CU.gopher_quality(c4)
            return out.agg(
                F.sum(F.col("keep_doc").cast("long")).alias("kept"),
                F.sum("n_words").alias("words"),
                F.sum("stop_hits").alias("stop_checksum"),
                F.sum(F.length("text")).alias("len_checksum"),
            ).collect()[0]

        _job()  # same-JVM warmup
        w0, r0 = shuffle_totals_gb(spark)
        t0 = time.time()
        row = _job()
        wall = time.time() - t0
        w1, r1 = shuffle_totals_gb(spark)
        from bench import ceiling_job

        n_ceiling = int(os.environ.get("SPARK_GRAFT_CEILING_ROWS", "400000000"))
        ceil_s = ceiling_job(
            spark, n_ceiling, spark.sparkContext.defaultParallelism * 4
        )
        return {
            "stage": "quality", "master": master, "docs": n,
            "kept": int(row["kept"]), "words": int(row["words"]),
            "stop_checksum": int(row["stop_checksum"]),
            "len_checksum": int(row["len_checksum"]),
            "wall_s": round(wall, 2),
            "docs_per_sec": round(n / wall),
            "shuffle_write_gb": round(w1 - w0, 4),
            "shuffle_read_gb": round(r1 - r0, 4),
            "ceiling_s": round(ceil_s, 2),
        }
    finally:
        spark.stop()


STAGES = {
    "pii": run_pii,
    "canon": run_canon,
    "graph": run_graph,
    "topfrac": run_topfrac,
    "quality": run_quality,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGES), default="pii")
    ap.add_argument("--docs", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--cores-b", type=int, default=0,
                    help="second parallelism level (0 = skip)")
    ap.add_argument("--shuffle-parts", type=int, default=0,
                    help="0 = cores at each level (bench.py protocol)")
    args = ap.parse_args()

    fn = STAGES[args.stage]
    levels = [args.cores] + ([args.cores_b] if args.cores_b else [])
    results = []
    for c in levels:
        parts = args.shuffle_parts or c
        results.append(fn(f"local[{c}]", args.docs, parts))
        print(json.dumps(results[-1]))
    if len(results) == 2 and "wall_s" in results[0]:
        a, b = results[0], results[1]
        ca, cb = levels
        eff = (b["wall_s"] * cb) / (a["wall_s"] * ca)
        print(json.dumps({
            "stage": args.stage, "scaling_cores": [cb, ca],
            "scaling_efficiency_raw": round(eff, 4),
            "checksums_identical": all(
                a.get(k) == b.get(k)
                for k in ("len_checksum", "checksum", "pages_checksum",
                          "stop_checksum", "kept")
                if k in a
            ),
        }))


if __name__ == "__main__":
    main()
