#!/usr/bin/env python
"""Volume rehearsal for the event-analytics family
(operators/temporal.bucket_bars / time_weighted_avg / funnel_steps,
operators/kde.kde_grid): synthesize event streams IN Spark at --events
scale and measure wall, events/sec, and delta-measured exchange volume
(REST stage metrics) per stage, with exact integer checksums that must
be bit-identical across parallelism levels (the fixed-point/decimal
accumulation contracts make that a hard invariant, not a hope).

  stage bars   — hourly OHLC bars per event_type: ONE partial-aggregated
                 exchange; checksum = sum of the fixed-point sums + ns.
  stage twap   — per-user time-weighted average: window lead + same-key
                 agg on one exchange; checksum = exact span/n sums plus
                 sum(floor(twap*1e6)) (doubles are pinned, so the floor
                 sum is too).
  stage funnel — view -> click -> buy over cycling per-user streams:
                 shrinking-frame joins; checksum = the step counts.
  stage kde    — quartic-kernel density surface at 5M+ points: explode
                 x9 into one partial-aggregated exchange; checksum =
                 cells + sum(floor(kde*1e6)).

    python jobs/analytics_rehearsal.py --stage bars --events 40000000 \
        --cores 16 --cores-b 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._metrics import shuffle_totals_gb  # noqa: E402

BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z


def _session(master: str, shuffle_parts: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        .getOrCreate()
    )


def synth_events(spark, n: int, users: int):
    """Event-shaped rows: ~997ms cadence, cycling types so every user's
    stream walks view -> click -> buy -> noise in time order (the funnel
    has real conversions to find), hash-scattered values."""
    from pyspark.sql import functions as F

    e = F.col("id")
    return spark.range(n).select(
        e.alias("event_id"),
        (e % users).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("buy"), F.lit("noise")
            ),
            (F.expr(f"id DIV {users}") % 4 + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_micros(F.lit(BASE_US) + e * 997_000).alias("ts"),
        ((e % 9973) / 7.0).alias("value"),
    )


def _measure(spark, job, n: int):
    from bench import ceiling_job

    job()  # same-JVM warmup
    w0, r0 = shuffle_totals_gb(spark)
    t0 = time.time()
    result = job()
    wall = time.time() - t0
    w1, r1 = shuffle_totals_gb(spark)
    n_ceiling = int(os.environ.get("SPARK_GRAFT_CEILING_ROWS", "400000000"))
    ceil_s = ceiling_job(
        spark, n_ceiling, spark.sparkContext.defaultParallelism * 4
    )
    return result, {
        "wall_s": round(wall, 2),
        "events_per_sec": round(n / wall),
        "shuffle_write_gb": round(w1 - w0, 4),
        "shuffle_read_gb": round(r1 - r0, 4),
        "ceiling_s": round(ceil_s, 2),
    }


def run_bars(master: str, n: int, shuffle_parts: int) -> dict:
    from pyspark.sql import functions as F

    from pygridmap_spark.operators import temporal as TP

    spark = _session(master, shuffle_parts, "analytics-rehearsal-bars")
    try:
        ev = synth_events(spark, n, max(n // 200, 1))

        def _job():
            bars = TP.bucket_bars(
                ev, 3600, by=["event_type"], tie_col="event_id"
            )
            return bars.agg(
                F.count(F.lit(1)).alias("buckets"),
                F.sum("n").alias("n_sum"),
                F.sum("sum_scaled").alias("fp_checksum"),
            ).collect()[0]

        row, m = _measure(spark, _job, n)
        return {
            "stage": "bars", "master": master, "events": n,
            "buckets": int(row["buckets"]), "n_sum": int(row["n_sum"]),
            "checksum": int(row["fp_checksum"]), **m,
        }
    finally:
        spark.stop()


def run_twap(master: str, n: int, shuffle_parts: int) -> dict:
    from pyspark.sql import functions as F

    from pygridmap_spark.operators.temporal import time_weighted_avg

    spark = _session(master, shuffle_parts, "analytics-rehearsal-twap")
    try:
        users = max(n // 200, 1)
        ev = synth_events(spark, n, users)

        def _job():
            out = time_weighted_avg(ev, by=["user_id"], tie_col="event_id")
            return out.agg(
                F.count(F.lit(1)).alias("users"),
                F.sum("span_us").alias("span_sum"),
                F.sum(F.floor(F.col("twap") * 1e6).cast("long")).alias(
                    "twap_fp_sum"
                ),
            ).collect()[0]

        row, m = _measure(spark, _job, n)
        return {
            "stage": "twap", "master": master, "events": n,
            "users": int(row["users"]),
            "span_checksum": int(row["span_sum"]),
            "checksum": int(row["twap_fp_sum"]), **m,
        }
    finally:
        spark.stop()


def run_funnel(master: str, n: int, shuffle_parts: int) -> dict:
    from pygridmap_spark.operators import temporal as TP

    spark = _session(master, shuffle_parts, "analytics-rehearsal-funnel")
    try:
        ev = synth_events(spark, n, max(n // 200, 1))

        def _job():
            out = TP.funnel_steps(
                ev, ["view", "click", "buy"], within_seconds=30 * 86400
            )
            return {r.step: r.n_users for r in out.collect()}

        steps, m = _measure(spark, _job, n)
        return {
            "stage": "funnel", "master": master, "events": n,
            "steps": steps, "checksum": sum(steps.values()), **m,
        }
    finally:
        spark.stop()


def run_kde(master: str, n: int, shuffle_parts: int) -> dict:
    from pyspark.sql import functions as F

    from pygridmap_spark.operators import kde as KD

    spark = _session(master, shuffle_parts, "analytics-rehearsal-kde")
    try:
        pts = spark.range(n).select(
            ((F.col("id") * 2654435761) % 10_000_019).alias("x"),
            ((F.col("id") * 1103515245) % 10_000_019).alias("y"),
        )

        def _job():
            surf = KD.kde_grid(pts, 20_000)
            return surf.agg(
                F.count(F.lit(1)).alias("cells"),
                F.sum(F.floor(F.col("kde") * 1e6).cast("long")).alias(
                    "kde_fp_sum"
                ),
            ).collect()[0]

        row, m = _measure(spark, _job, n)
        return {
            "stage": "kde", "master": master, "events": n,
            "cells": int(row["cells"]),
            "checksum": int(row["kde_fp_sum"]), **m,
        }
    finally:
        spark.stop()


STAGES = {
    "bars": run_bars,
    "twap": run_twap,
    "funnel": run_funnel,
    "kde": run_kde,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(STAGES), default="bars")
    ap.add_argument("--events", type=int, default=40_000_000)
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
        results.append(fn(f"local[{c}]", args.events, parts))
        print(json.dumps(results[-1]))
    if len(results) == 2:
        a, b = results[0], results[1]
        ca, cb = levels
        eff = (b["wall_s"] * cb) / (a["wall_s"] * ca)
        ceff = (b["ceiling_s"] * cb) / (a["ceiling_s"] * ca)
        print(json.dumps({
            "stage": args.stage, "scaling_cores": [cb, ca],
            "scaling_efficiency_raw": round(eff, 4),
            "ceiling_efficiency": round(ceff, 4),
            "normalized_efficiency": round(eff / ceff, 4),
            "checksums_identical": a["checksum"] == b["checksum"],
        }))


if __name__ == "__main__":
    main()
