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


def geo_dispersion(
    df: DataFrame,
    key: str,
    lon: str = "lon",
    lat: str = "lat",
    quantize: int | None = None,
) -> DataFrame:
    """Per-group geographic dispersion on the sphere — the footprint
    statistic of a domain's (or language's, or crawl-source's) pages:

    - ``n`` rows,
    - ``centroid_lon``/``centroid_lat``: the spherical MEAN DIRECTION
      (normalized vector sum of the unit positions — the standard
      directional-statistics estimator, exact for the point mass),
    - ``resultant_len``: R = |sum of unit vectors| / n in [0, 1],
    - ``sph_variance``: 1 - R (0 = all pages at one point, -> 1 as the
      footprint spreads toward uniform-on-sphere / antipodal balance).

    Pure Catalyst: one trig projection inside whole-stage codegen and one
    hash aggregation with map-side partials — the Zipf skew of real
    domain keys partial-aggregates away, no UDF, no second shuffle. A
    direction-degenerate group (R ~ 0, e.g. perfectly antipodal pages)
    gets NULL centroid columns, never a garbage direction or an ANSI
    divide-by-zero.

    ``quantize`` rounds the unit-vector components to that many decimals
    and accumulates them as exact decimals (the repo's oracle-determinism
    idiom: float sums are order-dependent across engines, decimal sums of
    pre-rounded values are not). Leave ``None`` in production — the
    plain double sum is one pass faster and the 1e-16 accumulation
    noise is far below any geographic meaning.
    """
    rl = F.radians(F.col(lon))
    rp = F.radians(F.col(lat))
    comps = {
        "__gx__": F.cos(rp) * F.cos(rl),
        "__gy__": F.cos(rp) * F.sin(rl),
        "__gz__": F.sin(rp),
    }
    proj = df.withColumns(
        {
            c: (
                F.round(e, quantize).cast(f"decimal(20,{quantize})")
                if quantize is not None
                else e
            )
            for c, e in comps.items()
        }
    )
    agg = proj.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__gx__").cast("double").alias("__sx__"),
        F.sum("__gy__").cast("double").alias("__sy__"),
        F.sum("__gz__").cast("double").alias("__sz__"),
    )
    norm = F.sqrt(
        F.col("__sx__") * F.col("__sx__")
        + F.col("__sy__") * F.col("__sy__")
        + F.col("__sz__") * F.col("__sz__")
    )
    ok = norm > F.lit(1e-12)
    return agg.select(
        key,
        "n",
        F.when(
            ok, F.degrees(F.atan2(F.col("__sy__"), F.col("__sx__")))
        ).alias("centroid_lon"),
        F.when(ok, F.degrees(F.asin(F.col("__sz__") / norm))).alias(
            "centroid_lat"
        ),
        (norm / F.col("n")).alias("resultant_len"),
        (F.lit(1.0) - norm / F.col("n")).alias("sph_variance"),
    )
