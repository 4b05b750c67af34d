"""Document text-analysis operator: one projection computing language-ID,
quality score, token counts and fingerprint (functions.text exprs — all
JVM-side, oracle-checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygridmap_spark.functions import text as TX


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the standard text-quality feature set. Single narrow
    projection — no shuffle, whole-stage codegen."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "lang_pred": TX.lang_id(t),
            "n_tokens": TX.token_count(t),
            "n_tokens_bpe": TX.bpe_ish_token_count(t),
            "alpha_ratio": TX.alpha_ratio(t),
            "punct_ratio": TX.punct_ratio(t),
            "stopword_ratio": TX.stopword_ratio(t),
            "quality": TX.quality_score(t),
            "fingerprint": TX.fingerprint(t),
        }
    )


def quality_filter(df: DataFrame, min_quality: float = 0.3, min_tokens: int = 5, text_col: str = "text") -> DataFrame:
    """C4-style quality gate."""
    out = document_stats(df, text_col)
    return out.filter((F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens))


def term_frequencies(
    df: DataFrame,
    top_k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus term frequencies over the normalized token stream (vocabulary
    building / tokenizer-training prep): ``(term, tf, df)`` — total
    occurrences and document frequency. ``top_k`` truncates to the most
    frequent terms (ties broken by term, deterministic).

    Plan: explode -> one hash agg keyed by term (tf partial-combines;
    df goes through countDistinct's two-phase expand). top_k is a
    TakeOrderedAndProject, not a full sort.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(TX.tokens(TX.normalized(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    agg = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )
    if top_k is not None:
        agg = agg.orderBy(F.col("tf").desc(), F.col("term")).limit(top_k)
    return agg
