#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Flagship metric (BASELINE.json): tile-assignment + spatial-join throughput
in pages/sec — synthetic pages (deterministic, JVM-generated) through
geolocate -> cell-index -> tile-assign -> indexed PIP join against a
broadcast region layer -> per-region aggregation. Everything JVM-side:
the number measures the engine, not Python.

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  SPARK_GRAFT_PAGES    (override flagship page count)
  SPARK_GRAFT_SCALING  (=1: also run the flagship at local[N/4] and report
                        scaling efficiency — used for BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "tile_histogram",
    "weighted_sum",
    "revenue_by_nation",
    "grid_overlay_offset",
    "knn_cellring",
    "pip_rect_join",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_near_dup",
    "ann_cosine_topk",
    "ann_cosine_topk_np",
    "lang_id_counts",
    "quality_scores",
    "events_windowed",
    # round-3 late additions (new keys — r1/r2 comparisons use the
    # common-query subset)
    "events_sessionized",
    "contamination_stats",
    "repetition_stats",
    "domain_rollup",
    "stratified_sample",
    "pack_sequences",
    "line_dedup",
    "chunk_documents",
    "term_frequencies",
    # round-4 additions
    "reproject_laea",
    "overlay_dissolve_wkb",
    # round-5 additions
    "reproject_webmercator",
    "union_exact_wkb",
    "union_exact_distributed",
    "s2_cell_index",
    "hex_rollup",
    "knn_s2_geodesic",
    "within_radius_s2",
    "hex_polyfill",
    "s2_polyfill",
    "pip_s2_zones",
    "region_filter_quads",
    "s2_cell_corners",
    "s2_cells_to_poly",
    "raster_to_s2_rollup",
    "zones_intersect_s2",
    "geodesic_zone_area",
    "s2_cell_area_rollup",
    "geodesic_zone_perimeter",
    "geodesic_zone_centroid",
    "geodesic_zone_stats",
    "zone_border_depth",
    "domain_geo_dispersion",
    # round-5 tail additions
    "geohash_encode",
    "geodesic_point_buffer",
    "user_travel_distance",
    "grid_hotspots",
    # round-5 continuation: grid analytics + retrieval family
    "grid_gi_star",
    "emerging_hotspots",
    "stay_points",
    "s2_compact_cells",
    "idw_interpolation",
    "bm25_topk",
    "asof_enrich",
    "interval_overlap",
    "simplify_trajectory",
    "cm_heavy_hitters",
    "convex_hull",
    "grid_morans_i",
    "grid_local_morans",
    "od_flows",
    "hdr_quantile_sketch",
    # round-5 continuation: webtext curation family
    "pii_redact",
    "canonical_url_dedup",
    "host_link_graph",
    "quality_topfrac",
    "host_pagerank_int",
    "html_extract",
    "paragraph_dedup",
    "c4_clean",
    "gopher_quality",
    # round-5 final session: sketch/link/point-pattern/intake/analytics
    "bloom_membership",
    "host_hits_int",
    "ripley_pair_counts",
    "robots_allow",
    "warc_parse",
    "event_bars",
    "event_funnel",
    "snapshot_diff_docs",
    # round-5 final session, continued
    "kde_heatmap",
    "user_twap",
    "host_triangles",
    "anchor_text_index",
    "template_fingerprint",
    "shingle_containment",
    "dup_span_removal",
    # round-5 closing session
    "contact_pairs",
    "lm_xent_score",
    "route_corridor",
    "weighted_sample",
    "html_meta",
    "host_reciprocity",
    "crawl_schedule",
    "sitemap_entries",
    "bpe_merges",
    "value_anomaly",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def materialize_pages(spark, n_pages: int) -> str:
    """One-time (untimed) synthesis of the pages table to parquet — the
    benchmark measures the engine over a pre-existing lake table, per the
    BASELINE metric, not the synthetic generator."""
    import tempfile

    from pygridmap_spark.sources import pages as P

    path = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_pages}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        P.pages(spark, n_pages, partitions=CPUS * 4).write.mode("overwrite").parquet(path)
    return path


def flagship_pages_pipeline(spark, n_pages: int) -> tuple[float, int]:
    """pages table -> geolocate -> cellindex -> tile-assign -> PIP region
    join -> per-region counts. Returns (elapsed_sec, n_regions_hit)."""
    from pyspark.sql import functions as F

    from pygridmap_spark.functions import cellindex as CI
    from pygridmap_spark.functions import geolocate as GEO
    from pygridmap_spark.functions import tiling as TF
    from pygridmap_spark.operators import spatialjoin as SJ

    # 64 deterministic rect regions covering scattered spots of the globe
    regions = spark.range(64).select(
        F.col("id").alias("poly_id"),
        (F.lit(-180.0) + (F.col("id") * 37 % 320).cast("double")).alias("rxmin"),
        (F.lit(-60.0) + (F.col("id") * 17 % 110).cast("double")).alias("rymin"),
    ).withColumns(
        {"rxmax": F.col("rxmin") + 24.0, "rymax": F.col("rymin") + 18.0}
    )

    df = spark.read.parquet(materialize_pages(spark, n_pages))
    df = GEO.with_geolocation(df)
    df = CI.with_cell_index(df, 7)
    df = TF.with_tile_assignment(df, resolution=0.01, tile_size_cell=128, x="lon", y="lat")
    joined = SJ.rect_pip_join(df, regions, z=7)
    agg = joined.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length("text")).alias("text_bytes"),
        F.countDistinct("xt", "yt").alias("n_tiles"),
    )
    t0 = time.time()
    n_regions = agg.count()
    return time.time() - t0, n_regions


def ceiling_job(spark, n_rows: int, parts: int) -> float:
    """Embarrassingly-parallel pure-JVM compute (chained xxhash64 over a
    range — no Python, no shuffle beyond the final 1-row agg, no input
    skew): the SCALING CEILING of this host. A shared VM with hypervisor
    steal cannot scale even this perfectly, so the flagship's efficiency is
    reported both raw and normalized by the ceiling measured in the SAME
    bench run (interleaved reps, same steal weather)."""
    from pyspark.sql import functions as F

    h = F.col("id")
    for i in range(8):
        h = F.xxhash64(h, F.lit(i))
    t0 = time.time()
    # >>33 keeps the ANSI long sum clear of overflow (n_rows * 2^31 < 2^63)
    spark.range(n_rows, numPartitions=parts).select(
        F.sum(F.shiftrightunsigned(h, 33))
    ).collect()
    return time.time() - t0


def main() -> None:
    from pygridmap_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf = _sf_from_dir(SF_DIR)
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", str(max(100_000, int(20_000_000 * sf)))))

    spark = get_spark(
        app="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            # local-bench scan parallelism: split the synthetic pages table
            # finer than the 128 MB cloud default so the scan can feed all
            # cores (files here are ~10-20 MB; on a real cluster the table
            # has thousands of >=128 MB files and the default is right)
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.locality.wait": "0",
        },
    )

    queries = entrymod.queries()
    timings: dict[str, float] = {}

    # flagship throughput: one warmup (cold file cache + JIT) then best-of-2
    # — the steady-state regime a long-running cluster job sits in; best-of
    # because this shared VM shows multi-second steal bursts
    flagship_pages_pipeline(spark, n_pages)
    elapsed = min(flagship_pages_pipeline(spark, n_pages)[0] for _ in range(2))
    pages_per_sec = n_pages / elapsed
    timings["flagship_pages_pipeline"] = round(elapsed, 3)

    # one untimed warmup pass (cold file cache / Python workers / JIT),
    # then interleaved best-of-3: this shared VM shows multi-second steal
    # bursts, and interleaving means a burst hits ONE rep of many queries
    # instead of every rep of one query (CLAUDE.md bench protocol)
    for name in HEADLINE:
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[name].append(time.time() - t0)
    for name in HEADLINE:
        timings[name] = round(min(runs[name]), 3)

    spark.stop()

    # scaling-efficiency evidence (north rule: >=0.8 between N and 4N).
    # Measured at 4 vs 16 cores with a CPU-bound-sized input: this host is
    # a shared VM with measurable steal (outlier runs 2-5x slower), so each
    # config takes best-of-2 with a JIT warmup, configs interleaved.
    extras = {}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "1":
        small, large = (4, 16) if CPUS >= 16 else (max(CPUS // 4, 1), CPUS)
        # sized so the small config runs ~40 s: fixed job overhead (session
        # startup, scan planning) is what drags measured efficiency below
        # the true scaling — at 16M pages the same protocol measured 0.79,
        # at 32M it measures 0.92 (BENCH/BASELINE.md round-2 study)
        n_scaling = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", str(int(320_000_000 * sf))))
        conf = {
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.locality.wait": "0",
        }
        # pure-JVM ceiling rows sized so the small config runs ~15-20 s
        n_ceiling = int(os.environ.get("SPARK_GRAFT_CEILING_ROWS", str(800_000_000)))
        best: dict[int, float] = {}
        best_ceil: dict[int, float] = {}
        reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
        for rep in range(reps):
            for cores in (small, large):
                s = get_spark(
                    app=f"bench_scale_{rep}_{cores}",
                    master=f"local[{cores}]",
                    shuffle_partitions=cores,
                    extra_conf=conf,
                )
                if rep == 0:
                    flagship_pages_pipeline(s, n_scaling)  # JIT/cache warmup
                el, _ = flagship_pages_pipeline(s, n_scaling)
                best[cores] = min(best.get(cores, el), el)
                ce = ceiling_job(s, n_ceiling, cores * 4)
                best_ceil[cores] = min(best_ceil.get(cores, ce), ce)
                s.stop()
        thr_s, thr_l = n_scaling / best[small], n_scaling / best[large]
        eff = (thr_l / thr_s) / (large / small)
        ceff = (best_ceil[small] / best_ceil[large]) / (large / small)
        extras = {
            "scaling": {
                "pages": n_scaling,
                "cores_small": small,
                "cores_large": large,
                "pages_per_sec_small": round(thr_s, 1),
                "pages_per_sec_large": round(thr_l, 1),
                "efficiency": round(eff, 4),
                # the host's own ceiling, same run, interleaved reps: an
                # embarrassingly-parallel pure-JVM job with zero Python and
                # zero shuffle — nothing in the engine can scale better
                # than this on this box (shared-VM steal + turbo effects)
                "ceiling_efficiency": round(ceff, 4),
                "normalized_efficiency": round(eff / ceff, 4),
            }
        }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "pages_per_sec": round(pages_per_sec, 1),
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
