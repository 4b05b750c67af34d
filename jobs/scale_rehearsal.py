#!/usr/bin/env python
"""Scale rehearsal for the dedup/curation family: run jobs/dedup_pipeline.py
end-to-end on a synthesized multi-million-doc corpus and report per-stage
wall time, docs/sec, and shuffle volume — plus a kill-and-resume transcript
for the lineage layer.

The corpus is generated IN Spark (pure Catalyst, no driver loop) with the
structure the pipeline exists to clean:

- 25 % of docs form 4-member near-dup families (two token mutations off a
  shared 40-token body -> shingle Jaccard ~0.7: LSH + connected-components
  work),
- 6.25 % are byte-exact duplicates of their family's canonical body,
- ~3 % are boilerplate-only (empty after line dedup -> the quality gate
  drops them),
- every doc carries two corpus-wide boilerplate lines (line-dedup work).

Usage:
    python jobs/scale_rehearsal.py --docs 2000000            # timed run
    python jobs/scale_rehearsal.py --docs 2000000 --resume-test
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ["s1_gated", "s2_exact", "s3_pairs", "s4_survivors", "s5_training_ready"]

PIPELINE_ARGS = [
    "--line-dedup-min-docs", "1000",
    "--min-tokens", "5",
    "--jaccard", "0.6",
    "--num-hashes", "64",
    "--bands", "16",
    "--sample-fractions", "src0=1.0,src1=0.5,src2=0.25,src3=0.1",
    "--pack-max-tokens", "2048",
]


def make_corpus(spark, n_docs: int, path: str) -> None:
    """Deterministic corpus with planted dup structure, generated
    distributed (one projection over spark.range — no driver data).

    NOTE: the rehearsal harness is a LOCAL benchmark driver by design
    (manifest mtimes, os.path, SIGKILL of a subprocess) — the pipeline it
    drives goes through core/fsio and runs anywhere, but point --corpus /
    --work at a local filesystem."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        # cached corpus must match the REQUESTED size, or the report's
        # docs/sec would silently describe a different input
        if spark.read.parquet(path).count() == n_docs:
            return
        shutil.rmtree(path)
    fam = F.shiftright(F.col("id"), 4)
    member = F.col("id") % 16
    in_family = member < 4
    is_exact = member == 4
    is_empty = (member == 5) & (fam % 2 == 0)
    base = F.when(in_family | is_exact, fam * 16).otherwise(F.col("id"))

    # free subexpressions (base / mutation flag) are threaded in via
    # zip_with + array_repeat so they evaluate ONCE per row, not per
    # element (CLAUDE.md: HOFs run interpreted with no subexpression
    # elimination)
    can_mutate = in_family & (member > 0)
    ctx = F.array_repeat(
        F.struct(base.alias("b"), can_mutate.alias("m"), F.col("id").alias("d")),
        40,
    )
    body = F.concat_ws(
        " ",
        F.zip_with(
            F.sequence(F.lit(0), F.lit(39)),
            ctx,
            lambda i, c: F.concat(
                F.lit("w"),
                F.pmod(
                    F.when(
                        c.getField("m") & ((i == 7) | (i == 23)),
                        F.xxhash64(c.getField("d"), F.lit(9), i),
                    ).otherwise(F.xxhash64(c.getField("b"), i)),
                    F.lit(4000),
                ),
            ),
        ),
    )
    body = F.when(is_empty, F.lit("")).otherwise(body)
    text = F.concat(
        body,
        F.lit("\nsubscribe to our newsletter today\nall rights reserved example corp"),
    )
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), F.col("id") % 4).alias("source"),
            text.alias("text"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def _stage_times(work: str, t0: float) -> list[tuple[str, float, float, int]]:
    """(stage, end_time, wall_sec, rows) from the lineage manifests."""
    out, prev = [], t0
    for st in STAGES:
        mf = os.path.join(work, st, "_lineage.json")
        end = os.path.getmtime(mf)
        rows = json.load(open(mf))["total_rows"]
        out.append((st, end, end - prev, rows))
        prev = end
    return out


def _rest_stages(spark) -> list[dict]:
    """All completed Spark stages from the app's own REST API (per-stage
    submission time + shuffle read/write bytes)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete&details=false"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def timed_run(docs: int, corpus: str, work: str) -> dict:
    import dedup_pipeline

    from pygridmap_spark.session import get_spark

    spark = get_spark(
        app="scale_rehearsal",
        extra_conf={
            # the engine default disables the UI; the rehearsal needs its
            # REST API for per-stage shuffle volumes
            "spark.ui.enabled": "true",
            # feed all cores on a sub-GB local corpus (CLAUDE.md gotcha:
            # 128 MB splits leave most of local[32] idle)
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    make_corpus(spark, docs, corpus)
    spark.catalog.clearCache()
    if os.path.exists(work):
        shutil.rmtree(work)
    old_argv, old_stop = sys.argv, type(spark).stop
    type(spark).stop = lambda self: None  # keep the session (and its UI) alive
    sys.argv = ["dedup_pipeline.py", "--input", corpus, "--output", work] + PIPELINE_ARGS
    t0 = time.time()
    try:
        dedup_pipeline.main()
    finally:
        sys.argv = old_argv
        type(spark).stop = old_stop
    total = time.time() - t0

    stages = _stage_times(work, t0)
    # bucket Spark's physical stages into pipeline stages by submission time
    try:
        rest = _rest_stages(spark)
    except Exception:
        rest = []
    windows = []
    prev = t0 * 1000
    for st, end, _, _ in stages:
        windows.append((st, prev, end * 1000))
        prev = end * 1000
    shuffle = {st: {"write_mb": 0.0, "read_mb": 0.0} for st in STAGES}
    for s in rest:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        from datetime import datetime, timezone

        ts = datetime.strptime(sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        ms = ts.timestamp() * 1000
        for st, lo, hi in windows:
            if lo <= ms <= hi:
                shuffle[st]["write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
                shuffle[st]["read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
                break
    n_in = docs
    report = {"docs": docs, "total_sec": round(total, 1),
              "docs_per_sec": round(docs / total, 1), "stages": []}
    prev_rows = n_in
    for st, _, wall, rows in stages:
        report["stages"].append(
            {
                "stage": st,
                "sec": round(wall, 1),
                "rows_out": rows,
                "docs_per_sec_in": round(prev_rows / max(wall, 1e-9), 1),
                "shuffle_write_mb": round(shuffle[st]["write_mb"], 1),
                "shuffle_read_mb": round(shuffle[st]["read_mb"], 1),
            }
        )
        prev_rows = rows
    return report


def resume_test(docs: int, corpus: str, work: str) -> dict:
    """Kill the job (SIGKILL) once the LSH stage has checkpointed; rerun to
    completion; verify stages s1-s3 are SERVED from their checkpoints
    (manifest mtimes untouched) and only s4/s5 compute."""
    if os.path.exists(work):
        shutil.rmtree(work)
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "dedup_pipeline.py"),
           "--input", corpus, "--output", work] + PIPELINE_ARGS
    env = dict(os.environ, PYTHONPATH=os.path.dirname(here))
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    target = os.path.join(work, "s3_pairs", "_lineage.json")
    t0 = time.time()
    killed_at = None
    while time.time() - t0 < 1800:
        if proc.poll() is not None:
            raise RuntimeError("pipeline finished before the kill — corpus too small?")
        if os.path.exists(target):
            time.sleep(1.0)  # let the manifest write land
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed_at = time.time() - t0
            break
        time.sleep(0.5)
    if killed_at is None:
        proc.kill()
        raise RuntimeError("s3_pairs never appeared")
    pre = {st: os.path.getmtime(os.path.join(work, st, "_lineage.json"))
           for st in STAGES[:3]}
    t1 = time.time()
    subprocess.run(cmd, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    resume_sec = time.time() - t1
    post = {st: os.path.getmtime(os.path.join(work, st, "_lineage.json"))
            for st in STAGES[:3]}
    reused = [st for st in STAGES[:3] if pre[st] == post[st]]
    computed = [st for st in STAGES[3:]
                if os.path.exists(os.path.join(work, st, "_lineage.json"))]
    return {
        "killed_after_sec": round(killed_at, 1),
        "killed_after_stage": "s3_pairs",
        "resume_sec": round(resume_sec, 1),
        "stages_reused": reused,
        "stages_computed_on_resume": computed,
        "resume_ok": reused == STAGES[:3] and computed == STAGES[3:],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--corpus", default="/tmp/rehearsal_corpus")
    ap.add_argument("--work", default="/tmp/rehearsal_work")
    ap.add_argument("--resume-test", action="store_true")
    args = ap.parse_args()
    if args.resume_test:
        # corpus must exist (generate via a timed run first)
        print(json.dumps({"resume_test": resume_test(args.docs, args.corpus, args.work + "_rt")}))
    else:
        print(json.dumps(timed_run(args.docs, args.corpus, args.work)))


if __name__ == "__main__":
    main()
