"""Deterministic sampling for training-data mixing: hash-bucket sampling
and per-stratum (source/language/domain) rates.

Sampling for corpus construction must be REPRODUCIBLE (the same doc set
on every run, on any cluster, at any parallelism) and JOINABLE (a doc's
inclusion decidable from its key alone — no global state, no RNG stream).
Both are properties `df.sample` lacks (seeded per-partition RNG: the
sample changes with the partitioning). So: a doc is kept iff

    bucket(key) = int(md5(seed || ':' || key)[:8 hex]) / 2^32 < fraction

— a pure projection + filter, no shuffle, pushdown-friendly, identical
in any engine with md5 (DuckDB oracle twin included in the driver).

The md5 prefix is uniform enough for rate control (this is sampling, not
cryptography); collisions across seeds are avoided by the seed prefix.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Deterministic uniform [0, 1) bucket from a key column: the first 8
    hex digits of md5(seed || ':' || key) scaled by 2^-32.

    NULL keys hash via a NUL-framed sentinel (concat would otherwise yield
    NULL, and NULL < fraction is never true — a fraction=1.0 'keep all'
    stratum would silently drop NULL-keyed rows). All NULL keys share one
    bucket: included or excluded together, as a group.

    Reserved value: the sentinel string ``'\\x00null\\x00'`` (NUL-framed,
    unrepresentable in URLs/hostnames/doc ids) is reserved — a genuine
    string key of exactly that value would share the NULL group's bucket."""
    h = F.md5(
        F.concat(
            F.lit(seed),
            F.lit(":"),
            F.coalesce(key.cast("string"), F.lit("\x00null\x00")),
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep each row iff its hash bucket < ``fraction`` — reproducible
    across runs, partitionings, and engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col), seed) < fraction)


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (the data-mixing primitive: 'keep 100 %
    of wiki, 10 % of common-crawl'). Strata absent from ``fractions`` get
    ``default_fraction``. Pure projection + filter — the fraction lookup
    is a when-chain for small maps (no join, no shuffle)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    frac = F.lit(float(default_fraction))
    for k, v in fractions.items():
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.filter(hash_bucket(F.col(key_col), seed) < frac)


def _open_unit(key: Column, seed: str = "") -> Column:
    """Deterministic uniform in the OPEN interval (0, 1): the
    :func:`hash_bucket` value plus a half-step ``2^-33`` so ln(u) is
    always finite (an all-zero md5 prefix would otherwise yield u = 0 and
    -inf). ``x/2^32 + 2^-33 == (x + 0.5)/2^32`` EXACTLY in IEEE (both
    dyadic, the sum fits 34 significant bits), so this reuses
    hash_bucket's md5/NULL-sentinel derivation verbatim — one definition
    of the key scheme — while matching the oracle's ``(x + 0.5)/2^32``
    bit-for-bit."""
    return hash_bucket(key, seed) + F.lit(2.0 ** -33)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    by: str | None = None,
    key_col: str = "doc_id",
    seed: str = "",
    buckets: int = 512,
    score_out: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-ES scheme (2006, public): each row gets the key
    ``u^(1/w)`` for a uniform u and weight w, and the k largest keys are
    exactly a weighted sample without replacement. Ranked here by the
    monotone-equivalent ``score = ln(u) / w`` (one ln instead of a pow).
    u comes from the md5 hash path (:func:`_open_unit`), so the sample is
    REPRODUCIBLE across runs / partitionings / engines and every
    inclusion is decidable from (key, weight) alone — `df.sample`'s
    per-partition RNG guarantees neither.

    ``by=None`` draws one global sample: orderBy(score desc, key).limit(k)
    — a distributed TakeOrderedAndProject, never a single-partition sort.
    With ``by``, draws k per stratum via the histogram + threshold-bucket
    selection (operators/selection.topk_by_group): no stratum ever sorts
    on one partition, the data-mixing quota primitive ("40 docs per
    language, proportional to quality weight").

    Rows with NULL/NaN/non-positive weights are DROPPED (they have no
    place in the weighted distribution; ln(u)/w would flip sign). Ties
    (identical score — only possible for duplicate keys with equal
    weights) break on ``key_col``. ``score_out`` keeps the score column
    for inspection; default drops it.
    """
    from pygridmap_spark.operators.selection import topk_by_group

    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    w = F.col(weight_col)
    clean = df.filter(w.isNotNull() & ~F.isnan(w.cast("double")) & (w > 0))
    score_col = score_out or "__es_score__"
    scored = clean.withColumn(
        score_col, F.log(_open_unit(F.col(key_col), seed)) / w.cast("double")
    )
    if by is None:
        out = scored.orderBy(
            F.col(score_col).desc(), F.col(key_col).asc()
        ).limit(k)
    else:
        # A-ES scores ln(u)/w pile up just below 0 for heavy weights while
        # one light-weight row can set the group min near -20: equal-width
        # buckets over the raw score put nearly every row in the top
        # bucket and the threshold refine degenerates toward a full-group
        # one-partition window. Bucket on the variance-stabilized
        # -ln(-score) instead (log-spaced over |score|, weakly monotone
        # non-decreasing in score, so the selected set is unchanged — the
        # in-bucket rank still uses the true score). greatest(., 1e-300)
        # keeps the transform finite for the score = -0.0 edge (w = +inf).
        out = topk_by_group(
            scored, k, by=by, score_col=score_col, id_col=key_col,
            buckets=buckets,
            bucket_expr=-F.log(
                F.greatest(-F.col(score_col), F.lit(1e-300))
            ),
        )
    return out if score_out else out.drop(score_col)
