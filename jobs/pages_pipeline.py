#!/usr/bin/env python
"""Production pipeline job: geolocate -> cell-index -> tile-assign ->
PIP region join -> tiled sink, with per-stage lineage checkpoints; opt-in
GEODESIC zone tagging (--geo-zones: WKB polygons joined exactly on the
sphere via the classified S2 cover) with a per-zone rollup stage; opt-in
intake scrub (--scrub: PII stats + redacted-text column ahead of stage 1
— zero-shuffle, rides the stage_encoded checkpoint; the redaction goes to
a NEW column so the byte-identical `text` invariant holds regardless);
opt-in quality tagging (--quality: Gopher document-quality features +
C4 line/page cleaning ahead of stage 1 — both zero-shuffle; the C4
rewrite goes to a NEW `text_c4` column and the page verdicts land in
`keep_doc_c4` / `keep_doc_gopher`, so `text` stays byte-identical and
downstream consumers choose their own filter policy).

Submit (cluster):
    spark-submit --py-files pygridmap_spark.zip jobs/pages_pipeline.py \
        --input  <pages parquet/iceberg path> \
        --output <work dir> \
        [--regions <rect-region parquet>] [--psl <public_suffix_list.dat>] \
        [--geo-zones <wkb-zone parquet> --geo-level 11] \
        [--zoom 7] [--resolution 0.01]

Every stage checkpoints to parquet with a per-partition row-count/hash
manifest (plans.lineage); a restart with the same --output skips completed
stages (the north-star resumable-restart requirement). Package the library
with ``python -m zipfile -c pygridmap_spark.zip pygridmap_spark`` for
--py-files.

Local smoke run:
    python jobs/pages_pipeline.py --synthetic 100000 --output /tmp/pp
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", type=int, help="generate N synthetic pages instead")
    ap.add_argument("--regions", help="rect-region parquet (poly_id, rxmin, rymin, rxmax, rymax)")
    ap.add_argument(
        "--psl",
        help="publicsuffix.org rules file for URL/domain features "
        "(functions.urls.load_psl — the production path; omit for the "
        "14-rule stand-in)",
    )
    ap.add_argument(
        "--geo-zones",
        help="geodesic zone parquet (poly_id, wkb): exact sphere-side "
        "point-in-polygon tagging via operators.pip_sphere (great-circle "
        "edges; correct at poles/antimeridian where rect regions are not)",
    )
    ap.add_argument("--geo-level", type=int, default=11, help="S2 cover level for --geo-zones")
    ap.add_argument(
        "--quality", action="store_true",
        help="append Gopher quality features + C4 cleaning columns "
        "(text_c4, keep_doc_c4, keep_doc_gopher) ahead of stage 1",
    )
    ap.add_argument(
        "--scrub", action="store_true",
        help="add PII stats + text_redacted ahead of stage 1 (zero-shuffle)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--zoom", type=int, default=7)
    ap.add_argument("--resolution", type=float, default=0.01)
    ap.add_argument("--tile-size-cell", type=int, default=128)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pygridmap_spark.functions import cellindex as CI
    from pygridmap_spark.functions import geolocate as GEO
    from pygridmap_spark.functions import tiling as TF
    from pygridmap_spark.functions import urls as U
    from pygridmap_spark.operators import spatialjoin as SJ
    from pygridmap_spark.plans import lineage
    from pygridmap_spark.session import get_spark
    from pygridmap_spark.sources import pages as P
    from pygridmap_spark.sources import sinks

    spark = get_spark(app="pages_pipeline")

    if args.synthetic:
        pages = P.pages(spark, args.synthetic)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    # stage 0 (opt-in): PII scrub — pure-codegen columns appended before
    # the first checkpoint so the stats and redacted text persist with
    # stage_encoded and resumed runs never recompute the regex passes
    if args.scrub:
        from pygridmap_spark.functions import pii as PII

        pages = PII.with_pii_redacted(PII.with_pii_stats(pages))

    # stage 0b (opt-in): quality tagging — both zero-shuffle projections;
    # the C4 rewrite targets a COPY column (text_c4) and gopher passes
    # text through untouched, so the byte-identical `text` invariant
    # holds; verdicts are appended, never filtered here (policy belongs
    # to the consumer, and a dropped page can't be audited)
    if args.quality:
        from pygridmap_spark.operators import curation as CU

        pages = CU.c4_clean(
            pages.withColumn("text_c4", F.col("text")), text_col="text_c4"
        ).withColumnRenamed("keep_doc", "keep_doc_c4")
        pages = CU.gopher_quality(pages).withColumnRenamed(
            "keep_doc", "keep_doc_gopher"
        )

    # stage 1: URL/domain features + geolocate + encode (checkpointed,
    # resumable). Domain features ride the PSL as ONE broadcast dimension
    # (--psl loads the real ~9k-rule list; same plan shape either way).
    rules = U.load_psl(spark, args.psl) if args.psl else None
    # default_rule=True is the PSL spec's prevailing "*" rule: a host
    # under an unknown TLD is still registrable at depth 2. Without it a
    # corpus of unlisted TLDs (the synthetic fixture's .example) maps
    # every registered_domain to NULL and the per-zone/per-domain
    # rollups count zero domains.
    feats = U.with_url_features(pages, rules=rules, default_rule=True)
    enc = TF.with_tile_assignment(
        CI.with_cell_index(GEO.with_geolocation(feats), args.zoom),
        resolution=args.resolution,
        tile_size_cell=args.tile_size_cell,
        x="lon",
        y="lat",
    )
    enc = lineage.checkpoint(
        enc,
        os.path.join(args.output, "stage_encoded"),
        stage="encoded",
        partition_cols=["xt"],
        # the features tag invalidates stale checkpoints: a resumed run
        # must not serve a stage_encoded parquet that lacks the URL/domain
        # feature columns or predates the default-rule semantics (lineage
        # matches stage/inputs, not schema)
        inputs=[
            args.input or f"synthetic:{args.synthetic}",
            f"features:urls-v2-default-rule:psl={args.psl or 'standin'}",
            f"scrub:{'on' if args.scrub else 'off'}",
            f"quality:{'on' if args.quality else 'off'}",
        ],
    )

    # stage 2: PIP region assignment
    if args.regions:
        regions = spark.read.parquet(args.regions)
    else:
        regions = spark.range(64).select(
            F.col("id").alias("poly_id"),
            (F.lit(-180.0) + (F.col("id") * 37 % 320).cast("double")).alias("rxmin"),
            (F.lit(-60.0) + (F.col("id") * 17 % 110).cast("double")).alias("rymin"),
        ).withColumns({"rxmax": F.col("rxmin") + 24.0, "rymax": F.col("rymin") + 18.0})
    joined = SJ.rect_pip_join(enc, regions, z=args.zoom)
    joined = lineage.checkpoint(
        joined,
        os.path.join(args.output, "stage_joined"),
        stage="joined",
        partition_cols=["poly_id"],
        inputs=[os.path.join(args.output, "stage_encoded")],
    )

    # stage 2b (opt-in): geodesic zone tagging + per-zone rollup — the
    # spherical member of the PIP family (interior cover cells tag by the
    # equi-join alone; only boundary cells pay the winding refine)
    if args.geo_zones:
        from pygridmap_spark.operators import pip_sphere as PIP

        zones = spark.read.parquet(args.geo_zones)
        tagged = PIP.point_in_polygon_s2(
            enc.withColumnRenamed("poly_id", "__rect_poly_id__")
            if "poly_id" in enc.columns
            else enc,
            zones,
            args.geo_level,
        )
        tagged = lineage.checkpoint(
            tagged,
            os.path.join(args.output, "stage_geo_tagged"),
            stage="geo_tagged",
            partition_cols=["poly_id"],
            inputs=[
                os.path.join(args.output, "stage_encoded"),
                f"geo:{args.geo_zones}@{args.geo_level}",
            ],
        )
        # per-zone rollup enriched with the fused geodesic statistics:
        # area-TRUE page density (pages per million km^2 — the statistic
        # a planar area misstates at high latitude) and the exact
        # centroid as the zone's label point. geodesic_stats runs on the
        # DIMENSION layer (one Arrow pass over the zones, not the pages)
        # and rides the same broadcast the rollup join uses.
        zone_dim = PIP.geodesic_stats(zones).select(
            "poly_id", "area_km2", "centroid_lon", "centroid_lat"
        )
        zone_stats = (
            tagged.groupBy("poly_id")
            .agg(
                F.count("*").alias("n_pages"),
                F.approx_count_distinct("registered_domain").alias(
                    "n_domains"
                ),
            )
            .join(F.broadcast(zone_dim), "poly_id")
            .withColumn(
                "pages_per_mkm2",
                F.col("n_pages") / F.col("area_km2") * F.lit(1e6),
            )
        )
        zone_stats = lineage.checkpoint(
            zone_stats,
            os.path.join(args.output, "stage_zone_stats"),
            stage="zone_stats",
            inputs=[os.path.join(args.output, "stage_geo_tagged")],
        )
        print({"geo_zones": zone_stats.count()})

    # stage 3: tiled sink + info.json
    info = sinks.write_tiles(
        joined,
        os.path.join(args.output, "tiles"),
        resolution=args.resolution,
        tile_size_cell=args.tile_size_cell,
        crs="EPSG:4326",
    )
    print({"tiles": info["tilingBounds"], "rows": joined.count()})
    spark.stop()


if __name__ == "__main__":
    main()
