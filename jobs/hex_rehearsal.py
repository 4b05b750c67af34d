#!/usr/bin/env python
"""Volume rehearsal for hex polyfill (functions/hexgrid.polyfill): one
continent-sized star polygon at 1 km hexes (~millions of cells) plus a
20k-zone layer at 5 km hexes, measuring cells/sec and — the point of the
``candidates_partitions`` knob — that the mega-polygon's ray-cast work
actually spreads across tasks instead of running in one. Stage shuffle
totals come from the REST metrics (executed numbers, not plan copies).

    python jobs/hex_rehearsal.py --mega-radius 1500000 --mega-size 1000 \
        --zones 20000 --zone-size 5000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from jobs._metrics import rest_stages as _rest_stages  # noqa: E402


def _totals(spark) -> tuple[float, int]:
    st = _rest_stages(spark)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in st) / 1e6,
        sum(s.get("numCompleteTasks", 0) for s in st),
    )


def _star(rng, cx, cy, rmin, rmax, k):
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(rmin, rmax, k)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mega-radius", type=float, default=1_500_000.0)
    ap.add_argument("--mega-size", type=float, default=1_000.0)
    ap.add_argument("--zones", type=int, default=20_000)
    ap.add_argument("--zone-size", type=float, default=5_000.0)
    ap.add_argument("--parts", type=int, default=128)
    args = ap.parse_args()

    from pygridmap_spark.core import wkb as WKB
    from pygridmap_spark.functions import hexgrid as HX
    from pygridmap_spark.session import get_spark

    spark = get_spark(app="hex_rehearsal", extra_conf={"spark.ui.enabled": "true"})
    rng = np.random.default_rng(17)
    report: dict = {"mega_size_m": args.mega_size, "zone_size_m": args.zone_size}
    try:
        # ---- mega polygon: one star, ~pi*r^2 / hex_area cells ----------
        mega = [[_star(rng, 0.0, 0.0, 0.55 * args.mega_radius, args.mega_radius, 48)]]
        mega_df = spark.createDataFrame(
            pd.DataFrame({"poly_id": [0], "wkb": [WKB.encode_multipolygon(mega)]})
        )
        for label, parts in (("one_task", None), ("repartitioned", args.parts)):
            w0, t0n = _totals(spark)
            t0 = time.time()
            n = HX.polyfill(
                mega_df, args.mega_size, candidates_partitions=parts
            ).count()
            dt = time.time() - t0
            w1, t1n = _totals(spark)
            report[f"mega_{label}"] = {
                "cells": n,
                "wall_s": round(dt, 2),
                "cells_per_sec": int(n / dt),
                "tasks": t1n - t0n,
                "shuffle_write_mb": round(w1 - w0, 1),
            }

        # ---- zone layer: many small polygons, default zero-exchange ----
        zones = []
        for i in range(args.zones):
            cx, cy = rng.uniform(-3e6, 3e6, 2)
            zones.append(
                {
                    "poly_id": i,
                    "wkb": WKB.encode_multipolygon(
                        [[_star(rng, cx, cy, 15_000.0, 60_000.0, 8)]]
                    ),
                }
            )
        zdf = spark.createDataFrame(pd.DataFrame(zones)).repartition(64).persist()
        zdf.count()
        w0, t0n = _totals(spark)
        t0 = time.time()
        n = HX.polyfill(zdf, args.zone_size).count()
        dt = time.time() - t0
        w1, t1n = _totals(spark)
        report["zones"] = {
            "n_zones": args.zones,
            "cells": n,
            "wall_s": round(dt, 2),
            "cells_per_sec": int(n / dt),
            "tasks": t1n - t0n,
            "shuffle_write_mb": round(w1 - w0, 1),
        }
        zdf.unpersist()
    finally:
        print(json.dumps(report))
        spark.stop()


if __name__ == "__main__":
    main()
