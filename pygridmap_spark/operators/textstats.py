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


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones, public; the Lucene
    non-negative idf form): score every document against the bag of
    ``terms`` and return the top ``k`` as ``(doc_id, n_terms, score,
    rank)``, ties broken by doc_id.

        idf(t)     = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
        score(d)   = sum_t idf(t) * tf / (tf + k1*(1 - b + b*dl/avgdl))

    over the same normalized token stream as `term_frequencies`. N / dl
    count TOKENIZABLE documents (a doc whose text normalizes to nothing
    has no length and can never match — it is outside the collection).

    Plan shape: one tokenize/explode pass -> per-(doc, term) counts; the
    query-term filter lands ON that agg (the per-doc score only ever
    touches |terms| rows/doc); df and the (N, sum dl) moments are tiny
    broadcast aggregates; the final top-k is orderBy().limit() — a
    distributed TakeOrderedAndProject, never a single-partition sort.
    avgdl is derived as exact-long sum(dl) / N at use time (engines
    disagree on avg() internals; a division of exact integers does not).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(TX.tokens(TX.normalized(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    dt = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf_dt"))
    dl = dt.groupBy(id_col).agg(F.sum("tf_dt").alias("dl"))
    glob = dl.agg(
        F.count(F.lit(1)).alias("__n__"), F.sum("dl").alias("__sdl__")
    )
    qt = dt.filter(F.col("term").isin([str(t) for t in terms]))
    dfreq = qt.groupBy("term").agg(F.count(F.lit(1)).alias("__df__"))
    scored = (
        qt.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(glob))
    )
    nd = F.col("__n__").cast("double")
    avgdl = F.col("__sdl__").cast("double") / nd
    idf = F.log(
        (nd - F.col("__df__").cast("double") + F.lit(0.5))
        / (F.col("__df__").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf = F.col("tf_dt").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * tf / denom
    scores = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(contrib).alias("score"),
    )
    top = scores.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))
