"""Mergeable HDR-histogram quantile sketches — the quantile member of the
engine's sketch triad (HLL = distinct counts, `operators/sketches`;
count-min = frequencies, `sketches.cm_sketch`; this = quantiles).

The bucketing is the HdrHistogram idea (Tene, public domain spec): a
non-negative integer value ``v`` keeps its top ``p+1`` significant bits
and drops the rest —

    s      = max(0, floor(log2 v) - p)          (sub-bucket shift)
    bucket = (s << (p+1)) | (v >> s)            (single int64 key)

so bucket ids are ORDER-ISOMORPHIC to values (larger v, never-smaller
bucket), values below ``2^(p+1)`` get an IDENTITY bucket (the exact
regime — like the HLL sparse regime, small data rounds to nothing), and
above it the bucket's value range ``[m << s, ((m+1) << s) - 1]`` is at
most a ``2^-p`` relative slice. Everything is integer/bit arithmetic
(``floor(log2 v)`` via ``length(bin(v)) - 1`` — string length of the
minimal binary form, exact in both Spark and DuckDB; no libm anywhere),
so the DuckDB oracle restates it verbatim and hash-gates it.

Why a sketch and not ``percentile_approx``: the sketch is a FIRST-CLASS
mergeable table — build per shard/day, store, merge years later, query
any quantile — and its merge algebra is exact (bucket-count sums), which
the tests pin cell-for-cell like ``cm_merge``. At 100 TB the build is
one partially-aggregated shuffle whose key space is capped at
``(64 - p) * 2^p`` buckets per group regardless of row count: the
map-side combine collapses any corpus to a constant-size exchange.

No reference counterpart (pygridmap has no sketches); the quantile rank
rule is the classic discrete lower quantile: rank ``ceil(q * n)``
(1-based), reported as the containing bucket's upper bound — a value
``>=`` the true ranked element and within ``2^-p`` relative of it,
EQUAL to it in the exact regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hdr_bucket(value, p: int = 7):
    """Bucket-id Column for a non-negative integer Column ``value``.

    NULL and negative values map to NULL (filter or clamp upstream —
    a latency/length that is negative is corrupt, not small).
    """
    v = value.cast("long")
    e = F.length(F.bin(v)) - F.lit(1)  # floor(log2 v); bin(0)='0' -> e=0
    s = F.greatest(F.lit(0), e - F.lit(int(p)))
    # shiftright's Python wrapper only takes a literal shift; the SQL
    # function itself takes a column
    vshift = F.call_function("shiftright", v, s)
    bucket = s.cast("long") * F.lit(1 << (p + 1)) + vshift
    return F.when(v.isNotNull() & (v >= 0), bucket)


def hdr_bucket_upper(bucket, p: int = 7):
    """Inclusive upper bound of a bucket id (the quantile estimate)."""
    b = bucket.cast("long")
    s = F.shiftright(b, p + 1)
    m = b - s * F.lit(1 << (p + 1))
    return F.call_function("shiftleft", m + F.lit(1), s) - F.lit(1)


def hdr_sketch(
    df: DataFrame,
    value: str,
    by: list[str] | None = None,
    p: int = 7,
) -> DataFrame:
    """Build the sketch: ``(by..., bucket, cnt)`` — one partial-aggregated
    shuffle, key space <= (64-p) * 2^p buckets per group at ANY corpus
    size. NULL/negative values drop (their bucket is NULL)."""
    keys = list(by or [])
    b = hdr_bucket(F.col(value), p)
    return (
        df.select(*keys, b.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge sketches built per shard/epoch: exact bucket-count sums —
    ``hdr_merge(union of per-shard sketches) == hdr_sketch(whole)``
    cell-for-cell (pinned in tests, the cm_merge contract)."""
    keys = list(by or [])
    return sketches.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame,
    qs: list[float],
    by: list[str] | None = None,
    p: int = 7,
) -> DataFrame:
    """Quantile estimates from a sketch: ``(by..., q, est, n)`` — est is
    the upper bound of the bucket holding rank ceil(q*n), exact when the
    group's values all sit in the identity regime (< 2^(p+1)).

    Scale shape: the sketch IS dimension-sized (constant buckets per
    group), so the rank cumsum window and the per-(group, q) min-pick
    ride one tiny exchange; the original corpus is never touched.
    """
    keys = list(by or [])
    qvals = F.array(*[F.lit(float(q)) for q in qs])
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bucket")
    wg = Window.partitionBy(*[F.col(k) for k in keys])
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wg))
        .withColumn("q", F.explode(qvals))
        # rank = ceil(q*n) as one IEEE multiply + ceil: bit-identical
        # across engines (no rounding library involved)
        .withColumn("rank", F.ceil(F.col("q") * F.col("n").cast("double")))
        .filter(F.col("cum") >= F.col("rank"))
    )
    best = cum.groupBy(*keys, "q", "n").agg(F.min("bucket").alias("bucket"))
    return best.select(
        *keys,
        "q",
        hdr_bucket_upper(F.col("bucket"), p).alias("est"),
        "n",
    )
