#!/usr/bin/env python
"""Volume rehearsal for the spherical index family (functions/s2.py,
operators/knn_sphere.py): synthesize a uniform-on-sphere page layer IN
Spark (one projection over spark.range, no driver data), then measure

1. level-12 S2 encode throughput (the full Catalyst trig + Hilbert unroll),
2. the level-6 rollup (the one exchange the index exists to keep
   skew-balanced),
3. geodesic kNN (points x queries) wall time and exchange volume,
4. the geodesic radius join (constant cover level, one equi-join),
5. the geodesic point-in-polygon join over a synthetic zone layer
   (classified cover split + end-to-end tagging; --zones 0 skips),
6. the scan-prune region filter on a cell-SORTED parquet table
   (covering ranges as PushedFilters: rows read pruned vs unpruned),

with per-stage shuffle totals from the REST stage metrics (the executed
numbers, not plan copies — CLAUDE.md gotcha). Usage:

    python jobs/s2_rehearsal.py --points 20000000 --knn-points 5000000 \
        --queries 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from jobs._metrics import rest_stages as _rest_stages  # noqa: E402
from jobs._metrics import shuffle_totals_mb as _shuffle_totals  # noqa: E402


def make_points(spark, n: int):
    """Deterministic uniform-on-sphere points: area-true latitude via
    asin(2u-1), integer-hash u's (exact arithmetic, reproducible)."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    u1 = (F.col("id") * F.lit(2654435761) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    u2 = (F.col("id") * F.lit(2246822519) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    return df.select(
        F.col("id").alias("point_id"),
        (u1 * 360.0 - 180.0).alias("lon"),
        F.degrees(F.asin(2.0 * u2 - 1.0)).alias("lat"),
    )


def make_zones(spark, nz: int, mega: bool = True):
    """Deterministic geodesic zone layer: 12-gon rings, radii 0.3-2.5 deg,
    centers area-uniform below |lat| 70; zone 0 is optionally a
    continent-sized 36-gon (radius 20 deg) to exercise the skew path.
    Synthesized IN Spark, WKB-encoded in one Arrow pass."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pygridmap_spark.core import wkb as WKB

    df = spark.range(nz)
    u1 = (F.col("id") * F.lit(2654435761) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    u2 = (F.col("id") * F.lit(2246822519) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    u3 = (F.col("id") * F.lit(40503) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    base = df.select(
        F.col("id").alias("poly_id"),
        (u1 * 360.0 - 180.0).alias("_clon"),
        F.degrees(F.asin(2.0 * 0.9396926 * (u2 - 0.5))).alias("_clat"),
        (0.3 + 2.2 * u3).alias("_r"),
    )

    def _enc(batches):
        ang = np.linspace(0.0, 2.0 * np.pi, 13)[:-1]
        mang = np.linspace(0.0, 2.0 * np.pi, 37)[:-1]
        for pdf in batches:
            out = []
            for pid, clon, clat, r in zip(
                pdf["poly_id"], pdf["_clon"], pdf["_clat"], pdf["_r"]
            ):
                if mega and pid == 0:
                    a, rr, cla, clo = mang, 20.0, 0.0, 11.0
                else:
                    a, rr, cla, clo = ang, r, clat, clon
                ring = np.column_stack(
                    [clo + rr * np.cos(a) / max(0.2, np.cos(np.radians(cla))),
                     cla + rr * np.sin(a)]
                )
                ring = np.vstack([ring, ring[:1]])
                out.append({"poly_id": pid, "wkb": WKB.encode_multipolygon([[ring]])})
            yield pd.DataFrame(out)

    return base.mapInPandas(_enc, "poly_id long, wkb binary")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=20_000_000)
    ap.add_argument("--knn-points", type=int, default=5_000_000)
    ap.add_argument("--queries", type=int, default=100_000)
    ap.add_argument("--level", type=int, default=12)
    ap.add_argument("--knn-level", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--radius-m", type=float, default=100_000.0)
    ap.add_argument("--zones", type=int, default=1000)
    ap.add_argument("--zone-level", type=int, default=11)
    ap.add_argument("--skip-knn", action="store_true")
    ap.add_argument("--skip-scan", action="store_true")
    ap.add_argument("--skip-dissolve", action="store_true")
    ap.add_argument("--zz-zones", type=int, default=0,
                    help="stage 8: geodesic zones x zones intersects join "
                    "at this layer size each side (0 = skip)")
    ap.add_argument("--zz-level", type=int, default=9)
    ap.add_argument("--dissolve-level", type=int, default=10)
    ap.add_argument("--dissolve-parent", type=int, default=4)
    ap.add_argument("--stats-zones", type=int, default=0,
                    help="stage 9: geodesic zonal statistics at this zone "
                    "count — fused one-pass geodesic_stats vs the chained "
                    "area+length+centroid operators (0 = skip)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pygridmap_spark.functions import s2 as S2
    from pygridmap_spark.operators import knn_sphere as KS
    from pygridmap_spark.operators import pip_sphere as PIP
    from pygridmap_spark.session import get_spark

    spark = get_spark(
        app="s2_rehearsal",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    report: dict = {
        "points": args.points,
        "knn_points": args.knn_points,
        "queries": args.queries,
        "level": args.level,
    }
    try:
        pts = make_points(spark, args.points).repartition(128).persist()
        n = pts.count()
        assert n == args.points

        # ---- stage 1: level-12 encode (zero exchanges) ---------------
        w0, r0 = _shuffle_totals(spark)
        t0 = time.time()
        enc = S2.with_s2_index(pts, args.level)
        enc.write.format("noop").mode("overwrite").save()
        t_enc = time.time() - t0
        w1, r1 = _shuffle_totals(spark)
        report["encode"] = {
            "wall_s": round(t_enc, 2),
            "rows_per_sec": int(n / t_enc),
            "shuffle_write_mb": round(w1 - w0, 1),
        }

        # ---- stage 2: rollup to level 6 (ONE exchange) ---------------
        t0 = time.time()
        roll = (
            enc.groupBy(
                S2.compact_parent(F.col("s2_compact"), args.level, 6).alias("c6")
            )
            .agg(F.count("*").alias("n"))
        )
        n_cells = roll.count()
        t_roll = time.time() - t0
        w2, r2 = _shuffle_totals(spark)
        # balance of the rollup key: cells-hit + heaviest-cell share
        top = roll.agg(
            F.max("n").alias("mx"), F.avg("n").alias("avg")
        ).collect()[0]
        report["rollup_l6"] = {
            "wall_s": round(t_roll, 2),
            "rows_per_sec": int(n / t_roll),
            "cells": n_cells,
            "max_over_avg_cell": round(top["mx"] / top["avg"], 2),
            "shuffle_write_mb": round(w2 - w1, 1),
        }

        if not args.skip_knn:
            # ---- stage 3: geodesic kNN -----------------------------------
            kpts = pts.filter(F.col("point_id") < args.knn_points)
            qs = (
                make_points(spark, args.queries * 211)
                .filter(F.col("point_id") % 211 == 7)
                .select(F.col("point_id").alias("query_id"), "lon", "lat")
            )
            t0 = time.time()
            out = KS.knn_s2(kpts, qs, k=args.k, level=args.knn_level)
            n_out = out.count()
            t_knn = time.time() - t0
            w3, r3 = _shuffle_totals(spark)
            report["knn"] = {
                "wall_s": round(t_knn, 2),
                "queries_per_sec": int(qs.count() / t_knn),
                "result_rows": n_out,
                "shuffle_write_mb": round(w3 - w2, 1),
            }

            # ---- stage 4: geodesic radius join ---------------------------
            # constant radius -> ONE cover level, ONE equi-join (no
            # iterative rounds): the whole stage is a single Spark job
            t0 = time.time()
            rr = KS.within_radius_s2(kpts, qs, args.radius_m)
            n_rr = rr.count()
            t_rad = time.time() - t0
            w4, r4 = _shuffle_totals(spark)
            report["radius_join"] = {
                "radius_m": args.radius_m,
                "cover_level": KS.radius_cover_level(args.radius_m),
                "wall_s": round(t_rad, 2),
                "queries_per_sec": int(args.queries / t_rad),
                "result_rows": n_rr,
                "shuffle_write_mb": round(w4 - w3, 1),
            }
        # ---- stage 5: geodesic PIP join (classified cover) -----------
        if args.zones:
            zs = make_zones(spark, args.zones).persist()
            zs.count()
            wz0, _ = _shuffle_totals(spark)
            # 5a: the classified cover alone (interior/boundary split —
            # the ratio that bounds refine cost by boundary length)
            t0 = time.time()
            cov = S2.polyfill(
                zs, args.zone_level, classify=True, candidates_partitions=256
            )
            split = cov.groupBy("s2_interior").count().collect()
            t_cov = time.time() - t0
            wz1, _ = _shuffle_totals(spark)
            n_int = sum(r["count"] for r in split if r["s2_interior"])
            n_bnd = sum(r["count"] for r in split if not r["s2_interior"])
            report["pip_cover"] = {
                "zones": args.zones,
                "zone_level": args.zone_level,
                "wall_s": round(t_cov, 2),
                "interior_cells": n_int,
                "boundary_cells": n_bnd,
                "cells_per_sec": int((n_int + n_bnd) / t_cov),
                "shuffle_write_mb": round(wz1 - wz0, 1),
            }
            # 5b: the end-to-end join (cover recomputed inside — the
            # operator is measured whole, not from the cached cover)
            t0 = time.time()
            tagged = PIP.point_in_polygon_s2(
                pts, zs, args.zone_level, candidates_partitions=256
            ).persist()
            n_tag = tagged.count()
            t_pip = time.time() - t0
            wz2, _ = _shuffle_totals(spark)
            report["pip_join"] = {
                "wall_s": round(t_pip, 2),
                "points_per_sec": int(n / t_pip),
                "tagged_rows": n_tag,
                "shuffle_write_mb": round(wz2 - wz1, 1),
            }
            # 5c: border-depth enrichment on the tagged stream (one
            # broadcast join + one Arrow pass; zero point-side shuffles)
            t0 = time.time()
            dep = PIP.zone_border_depth(tagged, zs, km_col="depth_km")
            agg = dep.select(
                F.count("*").alias("n"),
                F.sum("border_depth_rad").alias("s"),
                F.max("depth_km").alias("mx"),
            ).collect()[0]
            t_dep = time.time() - t0
            wz3, _ = _shuffle_totals(spark)
            report["border_depth"] = {
                "wall_s": round(t_dep, 2),
                "tagged_per_sec": int(n_tag / t_dep) if t_dep else None,
                "rows": int(agg["n"]),
                "max_depth_km": round(float(agg["mx"]), 1),
                "shuffle_write_mb": round(wz3 - wz2, 1),
            }
            assert int(agg["n"]) == n_tag and agg["s"] > 0
            tagged.unpersist()
            zs.unpersist()

        # ---- stage 6: scan-prune region filter (sorted lake table) ---
        if not args.skip_scan:
            import shutil
            import tempfile

            d = tempfile.mkdtemp(prefix="s2scan_")
            try:
                enc14 = S2.with_s2_index(pts, 14)
                enc14.select(
                    "point_id", "lon", "lat", F.col("s2_cell").alias("cell")
                ).repartitionByRange(64, "cell").sortWithinPartitions(
                    "cell"
                ).write.mode("overwrite").parquet(d)
                tbl = spark.read.parquet(d)
                tbl.count()  # warm the page cache before either timing
                few = make_zones(spark, 8, mega=False).localCheckpoint(eager=True)

                def _input_totals():
                    st = _rest_stages(spark)
                    return (
                        sum(s_.get("inputBytes", 0) for s_ in st) / 1e6,
                        sum(s_.get("inputRecords", 0) for s_ in st),
                    )

                def _run():
                    t0 = time.time()
                    b0, rec0 = _input_totals()
                    out = PIP.region_filter(
                        tbl, few, max_cells=256, max_level=12, cell_col="cell"
                    )
                    n_hit = out.count()
                    b1, rec1 = _input_totals()
                    return {
                        "wall_s": round(time.time() - t0, 2),
                        "result_rows": n_hit,
                        "records_read": rec1 - rec0,
                        "mb_read": round(b1 - b0, 1),
                    }

                # interleaved best-of-2 (shared-VM steal protocol)
                pruned = unpruned = None
                for _rep in range(2):
                    r = _run()
                    pruned = r if pruned is None or r["wall_s"] < pruned["wall_s"] else pruned
                    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
                    try:
                        r = _run()
                    finally:
                        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
                    unpruned = r if unpruned is None or r["wall_s"] < unpruned["wall_s"] else unpruned
                report["scan_prune"] = {
                    "table_rows": n,
                    "pruned": pruned,
                    "no_pushdown": unpruned,
                }
            finally:
                shutil.rmtree(d, ignore_errors=True)
        # ---- stage 7: cells -> vector dissolve at volume --------------
        # the occupied-cell footprint of the whole point table, dissolved
        # to exact geodesic outlines per level-`parent` region: millions
        # of cells, thousands of groups, ONE grouped exchange
        if not args.skip_dissolve:
            lev, plev = args.dissolve_level, args.dissolve_parent
            sh = lev - plev
            occ = (
                S2.with_s2_face_ij(pts, lev)
                .select("s2_face", "s2_i", "s2_j")
                .distinct()
                .withColumn(
                    "poly_id",
                    F.col("s2_face").cast("long") * F.lit(1 << (2 * plev))
                    + F.shiftright(F.col("s2_i"), sh) * F.lit(1 << plev)
                    + F.shiftright(F.col("s2_j"), sh),
                )
                .persist()
            )
            n_occ = occ.count()
            wd0, _ = _shuffle_totals(spark)
            t0 = time.time()
            outl = S2.cells_to_wkb(occ, lev, group_cols=("poly_id",))
            stats = outl.agg(
                F.count("*").alias("rows"),
                F.sum("n_polys").alias("polys"),
                F.sum("n_vertices").alias("verts"),
            ).collect()[0]
            t_dis = time.time() - t0
            wd1, _ = _shuffle_totals(spark)
            # exactness probe: 3 groups recomputed with the local kernel
            # must match the distributed WKB byte-for-byte
            probe_ids = [r["poly_id"] for r in occ.select("poly_id").distinct().limit(3).collect()]
            got = {
                r["poly_id"]: bytes(r["wkb"])
                for r in outl.filter(F.col("poly_id").isin(probe_ids)).collect()
            }
            from pygridmap_spark.core import wkb as WKBmod

            ok = 0
            for pid in probe_ids:
                sub = occ.filter(F.col("poly_id") == pid).toPandas()
                mp = S2.py_cells_to_multipolygon(
                    int(sub.s2_face.iloc[0]),
                    sub.s2_i.to_numpy(),
                    sub.s2_j.to_numpy(),
                    lev,
                )
                ok += got[pid] == WKBmod.encode_multipolygon(mp)
            report["cells_to_vector"] = {
                "cell_level": lev,
                "parent_level": plev,
                "occupied_cells": n_occ,
                "wall_s": round(t_dis, 2),
                "cells_per_sec": int(n_occ / t_dis),
                "outline_rows": stats["rows"],
                "polys": int(stats["polys"]),
                "vertices": int(stats["verts"]),
                "shuffle_write_mb": round(wd1 - wd0, 1),
                "probe_groups_bit_identical": f"{ok}/{len(probe_ids)}",
            }
            occ.unpersist()
        pts.unpersist()

        # ---- stage 8: zones x zones intersects join at volume ----------
        # two independent zone layers (offset ids decorrelate the hash
        # sequences); candidates ride the ids-only cover join, geometry
        # only on candidate pairs
        if args.zz_zones:
            za = make_zones(spark, args.zz_zones, mega=False)
            zb = (
                make_zones(spark, 2 * args.zz_zones, mega=False)
                .filter(F.col("poly_id") >= args.zz_zones)
            )
            # 8a: the layer INDEXES (classified covers) — built once per
            # layer in a real pipeline and shared by PIP joins, region
            # filters, and zone x zone joins
            # candidates_partitions is the MEGA-polygon knob; on a layer
            # of many small zones it costs 8x (measured) — leave default
            t0 = time.time()
            covs = []
            for zl in (za, zb):
                c = S2.polyfill(
                    zl, args.zz_level, classify=True
                ).localCheckpoint(eager=True)
                covs.append(c)
            n_cov = sum(c.count() for c in covs)
            t_idx = time.time() - t0
            # 8b: the join itself, covers given
            wz0, _ = _shuffle_totals(spark)
            t0 = time.time()
            zz = PIP.zones_intersect_s2(
                za, zb, args.zz_level,
                left_cover=covs[0], right_cover=covs[1],
            )
            n_pairs = zz.count()
            t_zz = time.time() - t0
            wz1, _ = _shuffle_totals(spark)
            report["zones_join"] = {
                "zones_each_side": args.zz_zones,
                "level": args.zz_level,
                "index_wall_s": round(t_idx, 2),
                "index_cells": n_cov,
                "join_wall_s": round(t_zz, 2),
                "zones_per_sec_join": int(2 * args.zz_zones / t_zz),
                "intersecting_pairs": n_pairs,
                "join_shuffle_write_mb": round(wz1 - wz0, 1),
            }

        # ---- stage 9: fused vs chained geodesic zonal statistics ------
        # the A/B this stage exists for: chaining area+length+centroid
        # decodes the WKB and lifts every ring to unit vectors 3x; the
        # fused kernel pays the transform once. Interleaved best-of-2
        # per arm (CLAUDE.md: same-JVM A/B under CPU steal).
        if args.stats_zones:
            zs = (
                make_zones(spark, args.stats_zones, mega=False)
                .repartition(128)
                .persist()
            )
            zs.count()

            def _chained():
                d = PIP.geodesic_area(zs, km2_col="area_km2")
                d = PIP.geodesic_length(d, km_col="length_km")
                d = PIP.geodesic_centroid(d)
                return d.select(
                    F.sum("area_sr"), F.sum("length_rad"),
                    F.sum("centroid_lat"),
                ).collect()

            def _fused():
                d = PIP.geodesic_stats(zs)
                return d.select(
                    F.sum("area_sr"), F.sum("length_rad"),
                    F.sum("centroid_lat"),
                ).collect()

            best = {"chained": float("inf"), "fused": float("inf")}
            sums = {}
            for _ in range(2):
                for name, fn in (("chained", _chained), ("fused", _fused)):
                    t0 = time.time()
                    rows = fn()
                    best[name] = min(best[name], time.time() - t0)
                    sums[name] = [round(float(x), 6) for x in rows[0]]
            assert sums["chained"] == sums["fused"], sums
            zs.unpersist()
            report["geodesic_stats"] = {
                "zones": args.stats_zones,
                "chained_best_s": round(best["chained"], 2),
                "fused_best_s": round(best["fused"], 2),
                "fused_zones_per_sec": int(args.stats_zones / best["fused"]),
                "speedup": round(best["chained"] / best["fused"], 2),
            }
    finally:
        print(json.dumps(report))
        spark.stop()


if __name__ == "__main__":
    main()
