"""Domain-level corpus analytics: per-registered-domain rollups — the
crawl-budget / domain-quality aggregation stage of a web pipeline.

Scale shape: one projection (URL feature extraction, whole-stage codegen)
followed by one hash aggregation with map-side partial aggregation. Domain
keys are Zipf-skewed in real crawls; counts/sums partial-aggregate away
the skew, and the distinct-host count uses Spark's two-phase
partial-distinct expansion — no single reducer sees a whole mega-domain's
rows. For pathological cases `plans.skew.salted_agg` composes on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import urls as U


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    extra_aggs: list | None = None,
    rules: DataFrame | None = None,
) -> DataFrame:
    """Per-registered-domain rollup: document count, distinct-host count,
    mean path depth (+ caller ``extra_aggs``). Rows whose URL yields no
    registered domain (bare suffix, IP, unparsable) group under NULL —
    kept, not dropped, so totals reconcile. ``rules`` is the PSL dimension
    table (``urls.load_psl``); defaults to the suffix stand-in."""
    feats = U.with_url_features(df, url=url_col, rules=rules)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.avg("path_depth").alias("avg_path_depth"),
    ]
    if extra_aggs:
        aggs += list(extra_aggs)
    return feats.groupBy("registered_domain").agg(*aggs)
