#!/usr/bin/env python
"""Volume rehearsal for grid-cell hotspot clustering (operators/hotspots):
synthesize a planted-city point field IN Spark (one projection over
spark.range, no driver data), then measure the full cluster labeling —
wall time, points/sec, and the exchange volume from the REST stage
metrics (executed numbers, not plan copies — CLAUDE.md gotcha). The
checksum is a pure-integer rollup over the labeled cells (core count,
cluster count, point mass, label sum) — bit-identical across parallelism
levels or the run fails.

    python jobs/hotspot_rehearsal.py --points 20000000 --cities 2000 \
        --cores 16 --cores-b 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._metrics import shuffle_totals_gb as _rest_shuffle_totals  # noqa: E402

Z = 9  # 512x512 grid: cells 0.703 x 0.352 deg; city blobs span ~4x4 cells


def synth_points(spark, n_points: int, n_cities: int):
    """Deterministic clustered field: city = id % n_cities, center Knuth-
    hashed onto the globe (lat within +-80), jitter +-1.5 x +-0.75 deg;
    every 23rd point is uniform global noise (falls below min_points)."""
    from pyspark.sql import functions as F

    i = F.col("id")
    c = i % n_cities
    city_lon = F.lit(-175.0) + (c * F.lit(2654435761) % F.lit(350_000_000)).cast("double") / F.lit(1_000_000.0)
    city_lat = F.lit(-80.0) + (c * F.lit(2246822519) % F.lit(160_000_000)).cast("double") / F.lit(1_000_000.0)
    jlon = (i * F.lit(1103515245) % F.lit(3_000_000)).cast("double") / F.lit(1_000_000.0) - F.lit(1.5)
    jlat = (i * F.lit(40503) % F.lit(1_500_000)).cast("double") / F.lit(1_000_000.0) - F.lit(0.75)
    noise_lon = F.lit(-180.0) + (i * F.lit(2654435761) % F.lit(360_000_000)).cast("double") / F.lit(1_000_000.0)
    noise_lat = F.lit(-85.0) + (i * F.lit(2246822519) % F.lit(170_000_000)).cast("double") / F.lit(1_000_000.0)
    is_noise = (i % 23) == F.lit(0)
    return spark.range(n_points).select(
        F.when(is_noise, noise_lon).otherwise(city_lon + jlon).alias("lon"),
        F.when(is_noise, noise_lat).otherwise(city_lat + jlat).alias("lat"),
    )


def run_once(master: str, n_points: int, n_cities: int, min_points: int, shuffle_parts: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pygridmap_spark.operators import hotspots as HS

    spark = (
        SparkSession.builder.master(master)
        .appName("hotspot-rehearsal")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")  # AQE plan-change INFO logs flood stdout
    try:
        pts = synth_points(spark, n_points, n_cities)

        def _job():
            # stage-split: the facts pass (scan + partial-agg cell count)
            # scales with the corpus; the labeling tail runs on the bounded
            # <= 4^z cell frame and is a FIXED fee at any corpus size —
            # report both so the amortization claim is measured, not argued
            s0 = time.time()
            core = HS.core_cells(pts, Z, min_points=min_points).localCheckpoint(eager=True)
            facts_s = time.time() - s0
            cells = HS.label_cells(core, Z)
            # pure-integer, order-independent checksum: labels <= 2^18 at
            # z=9 and <=1M core cells keep every sum far from ANSI overflow
            row = cells.agg(
                F.count(F.lit(1)).alias("core_cells"),
                F.countDistinct("cluster_id").alias("clusters"),
                F.sum("n_points").alias("core_mass"),
                F.sum("cluster_id").alias("label_sum"),
            ).collect()[0]
            return row, facts_s

        _job()  # full-job warmup: JIT + codegen compile, same-JVM (bench.py protocol)
        w0, r0 = _rest_shuffle_totals(spark)  # delta-measure the TIMED pass only
        t0 = time.time()
        row, facts_s = _job()
        wall = time.time() - t0
        w1, r1 = _rest_shuffle_totals(spark)
        from bench import ceiling_job

        n_ceiling = int(os.environ.get("SPARK_GRAFT_CEILING_ROWS", "400000000"))
        ceil_s = ceiling_job(spark, n_ceiling, spark.sparkContext.defaultParallelism * 4)
        return {
            "master": master,
            "points": n_points,
            "core_cells": row["core_cells"],
            "clusters": row["clusters"],
            "core_mass": row["core_mass"],
            "label_sum": row["label_sum"],
            "wall_s": round(wall, 2),
            "facts_s": round(facts_s, 2),
            "label_tail_s": round(wall - facts_s, 2),
            "points_per_sec": round(n_points / wall),
            "facts_points_per_sec": round(n_points / facts_s),
            "shuffle_write_gb": round(w1 - w0, 3),
            "shuffle_read_gb": round(r1 - r0, 3),
            "ceiling_s": round(ceil_s, 2),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=20_000_000)
    ap.add_argument("--cities", type=int, default=2000)
    ap.add_argument("--min-points", type=int, default=50)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--cores-b", type=int, default=0, help="second level (0 = skip)")
    ap.add_argument("--reps", type=int, default=2, help="best-of reps per level")
    ap.add_argument("--shuffle-parts", type=int, default=0,
                    help="0 = cores at each level (bench.py protocol)")
    args = ap.parse_args()

    levels = [args.cores] + ([args.cores_b] if args.cores_b else [])
    results: dict[str, dict] = {}
    best_facts: dict[str, float] = {}
    best_ceil: dict[str, float] = {}
    for _ in range(args.reps):  # interleaved best-of (CPU-steal hygiene)
        for c in levels:
            r = run_once(f"local[{c}]", args.points, args.cities, args.min_points,
                         args.shuffle_parts or c)
            key = str(c)
            if key not in results or r["wall_s"] < results[key]["wall_s"]:
                results[key] = r
            # best-of each metric independently: a steal burst can hit one
            # stage of a rep without invalidating the others
            best_facts[key] = min(best_facts.get(key, 1e18), r["facts_s"])
            best_ceil[key] = min(best_ceil.get(key, 1e18), r["ceiling_s"])
            print(json.dumps(r), flush=True)
    if len(levels) == 2:
        hi, lo = str(levels[0]), str(levels[1])
        a, b = results[hi], results[lo]
        eff = (a["points_per_sec"] / b["points_per_sec"]) / (levels[0] / levels[1])
        # the facts pass is the only corpus-proportional stage (the label
        # tail is a fixed <=4^z fee, latency- not throughput-bound at local
        # scale) — its scaling is the number that predicts lake behavior
        feff = (best_facts[lo] / best_facts[hi]) / (levels[0] / levels[1])
        ceff = (best_ceil[lo] / best_ceil[hi]) / (levels[0] / levels[1])
        checks = {
            (r["core_cells"], r["clusters"], r["core_mass"], r["label_sum"])
            for r in results.values()
        }
        print(json.dumps({
            "scaling_eff": round(eff, 4),
            "facts_scaling_eff": round(feff, 4),
            "facts_normalized_eff": round(feff / ceff, 4),
            "ceiling_eff": round(ceff, 4),
            "normalized_eff": round(eff / ceff, 4),
            "from_cores": levels[1],
            "to_cores": levels[0],
            "checksum_match": len(checks) == 1,
        }), flush=True)


if __name__ == "__main__":
    main()
