#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink, optionally dumps .explain("formatted") to
plans/r06/<q>_<tag>.txt and per-query executed stage metrics (REST).

bench.py is FROZEN for the driver's measurement; this harness exists so
optimization work can isolate one query at a time without touching it.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (best-of-N)
  python bench_extra.py --explain before q1  # also write plans/r06/q1_before.txt
  python bench_extra.py --stages q1          # per-query stage deltas (REST UI)
  python bench_extra.py --all                # every bench.py HEADLINE query

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain_tag = None
    want_stages = False
    if "--explain" in args:
        i = args.index("--explain")
        explain_tag = args[i + 1]
        del args[i : i + 2]
    if "--stages" in args:
        want_stages = True
        args.remove("--stages")
    use_all = "--all" in args
    if use_all:
        args.remove("--all")

    import bench as benchmod
    import __spark_entry__ as entrymod
    from pygridmap_spark.session import get_spark

    names = benchmod.HEADLINE if use_all else args
    queries = entrymod.queries()
    for n in names:
        if n not in queries:
            raise SystemExit(f"unknown query: {n}")

    extra = {
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.locality.wait": "0",
    }
    if want_stages:
        extra["spark.ui.enabled"] = "true"
    spark = get_spark(
        app="bench_extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS, extra_conf=extra,
    )

    if explain_tag:
        os.makedirs("plans/r06", exist_ok=True)
        for n in names:
            df = queries[n](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r06/{n}_{explain_tag}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")

    def run(n: str) -> float:
        spark.sparkContext.setJobDescription(n)
        t0 = time.time()
        queries[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # one untimed warmup, then interleaved best-of-REPS (CLAUDE.md protocol)
    for n in names:
        run(n)
    runs: dict[str, list[float]] = {n: [] for n in names}
    stage_rows: dict[str, dict] = {}
    for rep in range(REPS):
        for n in names:
            if want_stages and rep == 0:
                from jobs._metrics import rest_stages
                before = {s["stageId"] for s in rest_stages(spark)}
                runs[n].append(run(n))
                st = [s for s in rest_stages(spark) if s["stageId"] not in before]
                stage_rows[n] = {
                    "n_stages": len(st),
                    "task_time_s": round(sum(s.get("executorRunTime", 0) for s in st) / 1e3, 2),
                    "shuf_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in st) / 1e6, 1),
                    "shuf_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in st) / 1e6, 1),
                    "in_rows": sum(s.get("inputRecords", 0) for s in st),
                    "out_rows": sum(s.get("outputRecords", 0) for s in st),
                    "stages": [
                        {
                            "id": s["stageId"],
                            "name": s.get("name", "")[:60],
                            "tasks": s.get("numCompleteTasks"),
                            "run_ms": s.get("executorRunTime"),
                            "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                            "sr_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                        }
                        for s in sorted(st, key=lambda s: -s.get("executorRunTime", 0))[:8]
                    ],
                }
            else:
                runs[n].append(run(n))

    out = {n: round(min(v), 3) for n, v in runs.items()}
    print(json.dumps({"queries": out, "total": round(sum(out.values()), 3), "sf_dir": SF_DIR}))
    if want_stages:
        print(json.dumps(stage_rows, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
