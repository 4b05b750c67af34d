"""Exact per-group top-fraction selection — "keep the best frac of each
language by quality score" — without sorting any group on one partition.

The naive exact implementation is a row_number window per group: every
row of a group must land in ONE task, so the biggest language (en, ~half
a web corpus) serializes onto a single core and the operator dies at
scale. This operator gets the same EXACT answer with a histogram +
refine selection:

1. per-group stats (n, min, max) — one partial-aggregated shuffle with
   one row per group;
2. per-(group, bucket) histogram over the score range — one
   partial-aggregated shuffle bounded by groups x buckets keys, however
   big the corpus is;
3. driver-side threshold pick on the tiny histogram (groups x buckets
   rows): the bucket where the from-the-top cumulative count crosses
   k = ceil(frac * n), and how many rows are still needed inside it;
4. rows in buckets strictly above the threshold bucket pass with NO
   further work; ONLY threshold-bucket rows (expected n/buckets per
   group) go through an exact (score desc, id asc) row_number window.

Total ordering: ties on the score are broken by the unique ``id_col``,
so the kept set is deterministic and oracle-checkable (the driver query
gates it against a plain window row_number in DuckDB).

Contracts / bounds:
- ``by`` must be dimension-sized (a histogram row per (group, bucket) is
  collected driver-side) — languages, sources, shards; NOT urls.
- NULL and NaN scores are dropped (a NaN would poison the bucket math;
  Spark NaN-sorts above every double, DuckDB differs — excluding them is
  the only cross-engine-sane contract). A NULL GROUP KEY is kept — it is
  its own group, exactly as a window's partitionBy treats it (all joins
  are null-safe).
- The corpus is scanned twice (histogram pass, then the filter/refine
  pass when the caller acts) — the price of exactness without a sort;
  persist the input upstream if the scan is expensive.
- Degenerate distributions (all scores equal -> one bucket) fall back to
  the full-group window for THAT group only — correct, with the skew the
  histogram can't help; raise ``buckets`` for heavy-tailed scores.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topfrac_by_group(
    df: DataFrame,
    frac: float,
    by: str = "lang",
    score_col: str = "quality",
    id_col: str = "doc_id",
    buckets: int = 512,
) -> DataFrame:
    """Keep, per ``by`` group, the top ``ceil(frac * n)`` rows ordered by
    (``score_col`` desc, ``id_col`` asc). Exact; two bounded-key shuffles
    over the corpus plus a window over threshold-bucket rows only."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    if frac == 0.0:
        return df.limit(0)
    clean = _drop_null_nan_scores(df, score_col)
    if frac == 1.0:
        return clean
    return _select_top_by_group(
        clean, lambda n: math.ceil(frac * n), by, score_col, id_col, buckets
    )


def topk_by_group(
    df: DataFrame,
    k: int,
    by: str = "lang",
    score_col: str = "quality",
    id_col: str = "doc_id",
    buckets: int = 512,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Keep, per ``by`` group, the top ``min(k, n)`` rows ordered by
    (``score_col`` desc, ``id_col`` asc) — the fixed-COUNT twin of
    :func:`topfrac_by_group`, same histogram + threshold-bucket-refine
    machinery (no group ever sorts on one partition). The building block
    for per-stratum quotas and weighted sampling without replacement.

    ``bucket_expr``: optional weakly MONOTONE NON-DECREASING transform of
    the score used only for the histogram/threshold bucketing (the final
    in-bucket rank always uses the true score, so the selected set is
    unchanged by any such transform). Callers whose score distribution is
    extremely skewed pass a variance-stabilizing transform here so the
    equal-width histogram actually splits the mass — without it, a
    distribution clustered near its max puts nearly every row in the top
    bucket and the refine degenerates toward a full-group one-partition
    window."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if k == 0:
        return df.limit(0)
    clean = _drop_null_nan_scores(df, score_col)
    return _select_top_by_group(
        clean, lambda n: min(k, n), by, score_col, id_col, buckets,
        bucket_expr=bucket_expr,
    )


def _drop_null_nan_scores(df: DataFrame, score_col: str) -> DataFrame:
    s = F.col(score_col)
    is_float = df.schema[score_col].dataType.typeName() in ("double", "float")
    return df.filter(
        s.isNotNull() & ~F.isnan(s) if is_float else s.isNotNull()
    )


def _select_top_by_group(clean, kfun, by, score_col, id_col, buckets, bucket_expr=None):
    """Shared histogram/threshold/refine selection: keep the per-group top
    ``kfun(n)`` rows (callers guarantee 1 <= kfun(n) <= n). ``bucket_expr``
    (weakly monotone non-decreasing in the score) redirects only the
    histogram; ranking stays on the true score.

    NOTE: runs the histogram job eagerly at call time (the threshold
    computation is driver-side by design); the scored input is persisted
    for that job and the bucketed frame is checkpointed so the score
    expression — often a heavy regexp/udf chain (quality_score measured
    ~4x recomputed through the old lazy shape: stats + bucketed + the
    above/picked branches) — evaluates ONCE however many consumers the
    returned union has."""
    s = F.col(score_col)
    drop_bs = []
    if bucket_expr is not None:
        clean = clean.withColumn("__bs__", bucket_expr)
        bs = F.col("__bs__")
        bs_col = "__bs__"
        drop_bs = ["__bs__"]
    else:
        bs, bs_col = s, score_col
    # the scored frame feeds the stats aggregate AND the bucketed
    # projection inside one job — cache it so the score chain runs once
    clean = clean.persist()

    # NULL is a legitimate group key (lang=NULL docs are a real web-corpus
    # population): every join below is null-safe (<=>) so the NULL group
    # flows through exactly like the naive window's NULL partition would
    stats = (
        clean.groupBy(by)
        .agg(
            F.min(bs_col).alias("__mn__"),
            F.max(bs_col).alias("__mx__"),
        )
        .withColumnRenamed(by, "__g__")
    )
    # bucket id: equal-width over [mn, mx]; the mx row clamps into the top
    # bucket; a zero-width range (all equal) puts everything in bucket 0
    b = F.lit(buckets)
    width = F.col("__mx__") - F.col("__mn__")
    bucket = F.when(width > 0,
                    F.least(F.floor((bs - F.col("__mn__")) / width * b),
                            b - 1)
                    ).otherwise(F.lit(0)).cast("int")
    bucketed = (
        clean.join(F.broadcast(stats), F.col(by).eqNullSafe(F.col("__g__")))
        .drop("__g__")
        .withColumn("__b__", bucket)
    )
    try:
        # materialize once: the hist collect needs it anyway, and the
        # above/picked branches below re-read the checkpoint instead of
        # re-evaluating the score chain per branch
        bucketed = bucketed.localCheckpoint(eager=True)
    finally:
        clean.unpersist()

    hist = {
        (r[by], r["__b__"]): r["cnt"]
        for r in bucketed.groupBy(by, "__b__")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # group sizes fall out of the histogram — no second corpus action
    groups: dict[object, int] = {}
    for (g, _bi), c in hist.items():
        groups[g] = groups.get(g, 0) + c

    # per group: threshold bucket t and the residual rank r needed in it
    thresholds: dict[object, tuple[int, int]] = {}
    for g, n in groups.items():
        remaining = kfun(n)
        t = 0
        for bi in range(buckets - 1, -1, -1):
            c = hist.get((g, bi), 0)
            if c >= remaining:
                t = bi
                break
            remaining -= c
        thresholds[g] = (t, remaining)

    spark = clean.sparkSession
    thr = F.broadcast(
        spark.createDataFrame(
            [(g, t, r) for g, (t, r) in thresholds.items()],
            # __r__ is a residual ROW COUNT (can exceed int32 at lake
            # scale even though the bucket index never does)
            schema=clean.select(F.col(by).alias("__g__")).schema
            .add("__t__", "integer").add("__r__", "long"),
        )
    )
    joined = bucketed.join(
        thr, F.col(by).eqNullSafe(F.col("__g__"))
    ).drop("__g__")
    above = joined.filter(F.col("__b__") > F.col("__t__"))
    # ONLY threshold-bucket rows ride the window exchange
    in_bucket = joined.filter(F.col("__b__") == F.col("__t__"))
    w = Window.partitionBy(by).orderBy(s.desc(), F.col(id_col).asc())
    picked = (
        in_bucket.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= F.col("__r__"))
        .drop("__rn__")
    )
    helper = ["__mn__", "__mx__", "__b__", "__t__", "__r__"] + drop_bs
    return above.unionByName(picked).drop(*helper)
