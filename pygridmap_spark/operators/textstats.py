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


def lm_xent_score(
    docs: DataFrame,
    ref: DataFrame | None = None,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy under an add-``alpha``-smoothed unigram
    LM — the CCNet-style language-model quality filter (Wenzek et al.
    2020, public): documents whose token distribution diverges from the
    reference corpus (gibberish, boilerplate soup, wrong-language) score
    HIGH; fluent in-domain text scores LOW. ``ref`` is the corpus the
    model is trained on (default: ``docs`` itself — the self-perplexity
    regime); unseen tokens get the smoothed floor ``alpha / (N + alpha*V)``.

        lp(t)   = ln((c(t) + alpha) / (N + alpha*V))
        xent(d) = -(1/|d|) * sum_t tf_{d,t} * lp(t)       [nats/token]

    Cross-engine exactness: ln is evaluated ONCE PER DISTINCT TERM on the
    model dimension and pinned to a fixed-point integer
    ``lp_fp = floor(lp * 1e9 + 0.5)`` (the repo-wide floor-rounding
    invariant — no engine rounding library); per-doc accumulation is then
    EXACT integer arithmetic sum(tf * lp_fp) in decimal(38) (order-free),
    and xent is ONE pinned IEEE division chain at the end. Overflow bound:
    |lp| <= ln(N) + ~1, so |lp_fp| < 4e10; a 10^6-token document sums to
    < 4e16 — decimal(38) holds any corpus.

    Plan shape at 100 TB: one tokenize/explode pass -> per-(doc, term)
    counts partial-aggregate BEFORE any exchange; the model is a
    TERM-DIMENSION frame (vocabulary-bounded, broadcast at fixture scale,
    a plain shuffled equi-join at lake scale); (N, V) are a 1-row
    broadcast moment; the final rollup rides the doc key. Tokenless
    documents are outside the collection (no distribution) and are
    excluded, like bm25_topk.

    Returns ``(doc_id, n_tokens, xent)`` with ``xent`` the raw double
    (round with the floor trick for oracle-paired output).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")

    def _dt(frame):
        toks = frame.select(
            F.col(id_col),
            F.explode(TX.tokens(TX.normalized(F.col(text_col)))).alias("term"),
        ).filter(F.col("term") != "")
        return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf_dt"))

    dt = _dt(docs)
    ref_dt = dt if ref is None else _dt(ref)
    model = ref_dt.groupBy("term").agg(F.sum("tf_dt").alias("__c__"))
    moments = model.agg(
        F.sum("__c__").alias("__N__"), F.count(F.lit(1)).alias("__V__")
    )
    a = F.lit(float(alpha))
    denom = F.col("__N__").cast("double") + a * F.col("__V__").cast("double")
    lp_fp = F.floor(
        F.log((F.col("__c__").cast("double") + a) / denom) * F.lit(1e9) + F.lit(0.5)
    )
    model_fp = model.crossJoin(F.broadcast(moments)).select(
        "term", lp_fp.alias("__lp_fp__")
    )
    unseen_fp = F.floor(F.log(a / denom) * F.lit(1e9) + F.lit(0.5))
    scored = (
        dt.join(model_fp, "term", "left")
        .crossJoin(F.broadcast(moments))
        .select(
            F.col(id_col),
            F.col("tf_dt"),
            F.coalesce(F.col("__lp_fp__"), unseen_fp).alias("__lp__"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf_dt").alias("n_tokens"),
            F.sum(
                (F.col("tf_dt") * F.col("__lp__")).cast("decimal(38,0)")
            ).alias("__s__"),
        )
    )
    xent = (
        (F.lit(0.0) - F.col("__s__").cast("double") / F.lit(1e9))
        / F.col("n_tokens").cast("double")
    )
    return scored.select(id_col, "n_tokens", xent.alias("xent"))
