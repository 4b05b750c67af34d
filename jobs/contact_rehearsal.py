#!/usr/bin/env python
"""Volume rehearsal for the spatio-temporal co-location join
(operators/trajectories.contact_pairs): synthesize a city-scale ping
stream IN Spark (one projection over spark.range, no driver data), run
the full contact join — 100 m radius, 10 min window — and record wall
time, pings/sec, pair counts, an exact cross-parallelism checksum, and
the candidate-exchange volume from the REST stage metrics (executed
numbers, not plan copies — CLAUDE.md gotcha). Optionally repeat at a
second parallelism level for the family's own north-rule scaling sample.

    python jobs/contact_rehearsal.py --pings 8000000 --users 200000 \
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

RADIUS_M = 100.0
WINDOW_S = 600.0


def synth_pings(spark, n_pings: int, n_users: int):
    """Deterministic city-scale ping cloud: ~43 x 40 km patch at lat 40,
    one ping per second of stream time, entity = id % n_users. Positions
    are QUADRATIC micro-degree hashes — a linear congruence would make
    the cloud a lattice whose shortest vector exceeds the radius (zero
    contacts; the driver-oracle fixture hit the same wall), while the
    quadratic pair displacement (2ki + k^2 terms) varies with i and the
    cloud behaves Poisson. Overflow bound: 31 * (2e7)^2 < 2^63."""
    from pyspark.sql import functions as F

    i = F.col("id")
    return spark.range(n_pings).select(
        i.alias("ping_id"),
        (i % n_users).alias("user_id"),
        F.timestamp_seconds(i).alias("ts"),
        (((i * i * F.lit(31) + i * F.lit(7)) % F.lit(500_000)).cast("double") / F.lit(1_000_000.0)).alias("lon"),
        (F.lit(40.0) + ((i * i * F.lit(17) + i * F.lit(3)) % F.lit(360_000)).cast("double") / F.lit(1_000_000.0)).alias("lat"),
    )


def run_once(master: str, n_pings: int, n_users: int, shuffle_parts: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pygridmap_spark.operators import trajectories as TJ

    spark = (
        SparkSession.builder.master(master)
        .appName("contact-rehearsal")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    try:
        pings = synth_pings(spark, n_pings, n_users)

        def _job():
            out = TJ.contact_pairs(pings, RADIUS_M, WINDOW_S)
            return out.agg(
                F.count(F.lit(1)).alias("pairs"),
                F.sum("n_contacts").alias("contacts"),
                # exact checksum: mm-rounded min distances as decimal —
                # bit-identical across parallelism levels, not
                # rounding-masked (floor trick, no engine rounding lib)
                (
                    F.sum(
                        F.floor(F.col("min_dist_m") * F.lit(1000.0) + F.lit(0.5))
                        .cast("decimal(38,0)")
                    ).cast("double")
                    / F.lit(1e9)
                ).alias("checksum"),
            ).collect()[0]

        _job()  # full-job warmup: JIT + codegen + Python workers, same JVM
        w0, r0 = _rest_shuffle_totals(spark)  # delta-measure the timed pass
        t0 = time.time()
        row = _job()
        wall = time.time() - t0
        w1, r1 = _rest_shuffle_totals(spark)
        from bench import ceiling_job

        n_ceiling = int(os.environ.get("SPARK_GRAFT_CEILING_ROWS", "400000000"))
        ceil_s = ceiling_job(spark, n_ceiling, spark.sparkContext.defaultParallelism * 4)
        return {
            "master": master,
            "pings": n_pings,
            "pairs": row["pairs"],
            "contacts": int(row["contacts"] or 0),
            "checksum": float(row["checksum"] or 0.0),
            "wall_s": round(wall, 2),
            "pings_per_sec": round(n_pings / wall),
            "shuffle_write_gb": round(w1 - w0, 3),
            "shuffle_read_gb": round(r1 - r0, 3),
            "ceiling_s": round(ceil_s, 2),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pings", type=int, default=8_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--cores-b", type=int, default=0, help="second level (0 = skip)")
    ap.add_argument("--reps", type=int, default=2, help="best-of reps per level")
    ap.add_argument("--shuffle-parts", type=int, default=0,
                    help="0 = cores at each level (bench.py protocol)")
    args = ap.parse_args()

    levels = [args.cores] + ([args.cores_b] if args.cores_b else [])
    results: dict[str, dict] = {}
    for _ in range(args.reps):  # interleaved best-of (CPU-steal hygiene)
        for c in levels:
            r = run_once(f"local[{c}]", args.pings, args.users, args.shuffle_parts or c)
            key = str(c)
            if key not in results or r["wall_s"] < results[key]["wall_s"]:
                results[key] = r
            print(json.dumps(r), flush=True)
    if len(levels) == 2:
        a, b = results[str(levels[0])], results[str(levels[1])]
        eff = (a["pings_per_sec"] / b["pings_per_sec"]) / (levels[0] / levels[1])
        ceff = (b["ceiling_s"] / a["ceiling_s"]) / (levels[0] / levels[1])
        checks = {a["checksum"], b["checksum"], }
        print(json.dumps({
            "scaling_eff": round(eff, 4),
            "ceiling_eff": round(ceff, 4),
            "normalized_eff": round(eff / ceff, 4),
            "from_cores": levels[1],
            "to_cores": levels[0],
            "checksum_match": len(checks) == 1 and a["pairs"] == b["pairs"],
        }), flush=True)


if __name__ == "__main__":
    main()
