"""Text-analysis column expressions for the training-data pipeline.

Language-ID (stopword-hit heuristic), quality scoring, token counting and
document fingerprinting — all as JVM-side Catalyst expressions designed so
the driver's DuckDB oracle can reproduce them with portable ANSI-ish SQL
(see __spark_entry__.oracle_sql). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Distinctive high-frequency function words per language. Matched with
# surrounding spaces so 'the' doesn't fire inside 'other'. Small on purpose:
# the oracle re-implements the same counts in SQL.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " les ", " est ", " une "],
    "it": [" il ", " che ", " della ", " sono ", " una "],
    "es": [" el ", " que ", " los ", " es ", " una "],
}


def occurrences(col: Column, needle: str) -> Column:
    """# of occurrences of a literal substring:
    (len(s) - len(replace(s, needle))) / len(needle)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / F.lit(
        len(needle)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per language over ' '||text||' '."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum((occurrences(padded, w) for w in words), F.lit(0.0)).cast("double")
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all 0
    and for NULL text.

    Ties break by the fixed language order of LANG_STOPWORDS (en first):
    ``array_position`` returns the FIRST index holding the max — the same
    semantics the SQL oracle mirrors with an en-first CASE chain.

    Formulated as array_max/array_position over one score array rather
    than a greatest + CASE chain: every WHEN branch of a CASE re-references
    its score expression conditionally, which Catalyst's subexpression
    elimination skips (conditional branches are only pulled out when the
    expression also occurs unconditionally), so the chain form recomputes
    the 5-replace-scan score per language up to twice. Here each score is
    evaluated exactly once into the array; the argmax is over 5 elements.
    """
    scores = lang_scores(text)
    arr = F.array(*scores.values())
    langs = F.array(*[F.lit(lang) for lang in scores])
    best = F.array_max(arr)
    pick = F.element_at(langs, F.array_position(arr, best).cast("int"))
    return F.when(best > F.lit(0.0), pick).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """Whitespace token count: size(split(trim(text), '\\s+')); 0 for empty."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavoured token estimate: word-piece regex splits on
    letter/digit/punct boundaries (GPT-2-style coarse classes)."""
    pieces = F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
    return F.size(F.filter(pieces, lambda p: F.length(F.trim(p)) > 0)).cast("int")


def alpha_ratio(text: Column) -> Column:
    """Fraction of [A-Za-z] characters."""
    return (
        F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
        / F.greatest(F.length(text), F.lit(1))
    ).cast("double")


def punct_ratio(text: Column) -> Column:
    return (
        F.length(F.regexp_replace(text, r"[^.,;:!?'\"()]", ""))
        / F.greatest(F.length(text), F.lit(1))
    ).cast("double")


def stopword_ratio(text: Column) -> Column:
    """English-stopword hits per token — the classic web-quality feature."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    hits = sum((occurrences(padded, w) for w in LANG_STOPWORDS["en"]), F.lit(0.0))
    return (hits / F.greatest(token_count(text), F.lit(1))).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score (length, alpha ratio, punctuation,
    stopword density) — C4/Gopher-style heuristics, SQL-reproducible:

        0.25*min(len/500,1) + 0.35*alpha + 0.2*min(4*punct, 1)
          + 0.2*min(4*stopword_ratio, 1)
    """
    len_term = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    return (
        F.lit(0.25) * len_term
        + F.lit(0.35) * alpha_ratio(text)
        + F.lit(0.20) * F.least(F.lit(4.0) * punct_ratio(text), F.lit(1.0))
        + F.lit(0.20) * F.least(F.lit(4.0) * stopword_ratio(text), F.lit(1.0))
    ).cast("double")


def normalized(text: Column) -> Column:
    """Dedup normalization: lowercase, non-alnum -> space, squeeze, trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), " +", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 exists in both
    Spark and DuckDB, making this oracle-checkable; xxhash64 is the
    JVM-internal fast path used for shuffle keys)."""
    return F.md5(normalized(text))


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-gram (word) shingles of the normalized text as array<string>;
    empty array when fewer than n tokens.

    The token array is threaded through an outer ``transform`` as a lambda
    VARIABLE, never referenced free inside the per-element lambda: higher-
    order functions evaluate interpreted (no subexpression elimination),
    so a free ``tokens(normalized(text))`` in the element lambda would
    re-run the regexp+split chain once per shingle — measured ~10x slower
    on short web documents."""
    toks = tokens(normalized(text))

    def _shingles_of(tk: Column) -> Column:
        count = F.size(tk) - F.lit(n - 1)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        )

    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.flatten(F.transform(F.array(toks), _shingles_of))
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (crawl intake)
# ---------------------------------------------------------------------------

# Backreference-free (RE2 has no backrefs — the oracle runs these verbatim
# in DuckDB) and non-greedy; (?is) = dotall + case-insensitive so
# <SCRIPT> bodies strip like <script>.
HTML_SCRIPT_PATTERN = r"(?is)<script\b[^>]*>.*?</script>"
HTML_STYLE_PATTERN = r"(?is)<style\b[^>]*>.*?</style>"
HTML_COMMENT_PATTERN = r"(?s)<!--.*?-->"
HTML_TAG_PATTERN = r"(?s)<[^>]+>"
# the handful of entities that dominate crawl text; anything rarer is
# left verbatim (an entity decoder is a tokenizer concern, not a scan
# concern). '&amp;' MUST decode LAST: decoding it first would turn the
# escaped display text '&amp;lt;' into '&lt;' and then into '<' —
# double-decoding that corrupts pages showing code samples.
HTML_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document: script/style/comment blocks out,
    tags out, common entities decoded, whitespace squeezed + trimmed.
    Pure Catalyst regexp/replace chain — zero Python, zero shuffle; a
    contract, not a browser (unclosed <script> eats to end of document;
    CDATA and exotic entities pass through verbatim). Every pattern is
    in the Java-regex/RE2 agreement subset, so the driver oracle re-runs
    the identical chain in DuckDB."""
    out = F.regexp_replace(html, HTML_SCRIPT_PATTERN, " ")
    out = F.regexp_replace(out, HTML_STYLE_PATTERN, " ")
    out = F.regexp_replace(out, HTML_COMMENT_PATTERN, " ")
    out = F.regexp_replace(out, HTML_TAG_PATTERN, " ")
    for ent, rep in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


HTML_TITLE_PATTERN = r"(?is)<title[^>]*>(.*?)</title>"


def _entity_decode(c: Column) -> Column:
    # HTML_ENTITIES order matters: &amp; decodes LAST (the one order that
    # never double-decodes a page displaying escaped code)
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _squeeze_null(c: Column) -> Column:
    return F.nullif(F.trim(F.regexp_replace(c, r"\s+", " ")), F.lit(""))


def html_title(html: Column) -> Column:
    """The document <title>, entity-decoded and whitespace-squeezed; NULL
    when absent or empty. First title wins (regexp_extract takes the
    leftmost match); an unclosed <title> yields NULL (lazy ``.*?`` needs
    the closing tag) — a contract, not a browser, like html_to_text.
    Java-regex/RE2 agreement subset; the driver oracle re-runs the chain
    in DuckDB."""
    return _squeeze_null(_entity_decode(F.regexp_extract(html, HTML_TITLE_PATTERN, 1)))


def _attr_after(tag: str, a1: str, v1: str, a2: str) -> str:
    # <tag ... a1="v1" ... a2="CAPTURE": both quote styles, case-
    # insensitive. Each attribute name requires a preceding [\s"']
    # boundary so data-name="description" cannot satisfy name=... (a
    # bare [^>]* would let any attribute that merely ENDS in the target
    # name match).
    return (
        rf"(?is)<{tag}\b[^>]*[\s\"']{a1}\s*=\s*[\"']{v1}[\"'][^>]*"
        rf"[\s\"']{a2}\s*=\s*[\"']([^\"'>]*)"
    )


def html_meta_content(html: Column, name: str = "description") -> Column:
    """content="..." of the first <meta name="{name}"> (either attribute
    order), entity-decoded and squeezed; NULL when absent. ``name`` must
    be a plain token (letters/digits/_/-/:) — it is interpolated into the
    pattern. Unquoted attribute values are out of contract (rare in real
    meta tags; a browser-grade parser belongs in an Arrow kernel)."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z0-9_:-]+", name):
        raise ValueError(f"meta name must be a plain token, got {name!r}")
    a = F.regexp_extract(html, _attr_after("meta", "name", name, "content"), 1)
    b = F.regexp_extract(html, _attr_after_rev("meta", "content", "name", name), 1)
    return _squeeze_null(_entity_decode(F.when(a != F.lit(""), a).otherwise(b)))


def _attr_after_rev(tag: str, a1: str, a2: str, v2: str) -> str:
    # <tag ... a1="CAPTURE" ... a2="v2": the flipped attribute order;
    # same [\s"'] attribute-name boundary as _attr_after
    return (
        rf"(?is)<{tag}\b[^>]*[\s\"']{a1}\s*=\s*[\"']([^\"'>]*)[\"'][^>]*"
        rf"[\s\"']{a2}\s*=\s*[\"']{v2}[\"']"
    )


def html_canonical(html: Column) -> Column:
    """href of the first <link rel="canonical"> (either attribute order),
    raw (URLs carry no entity decode by contract — escape-decoding a URL
    changes its identity); NULL when absent."""
    a = F.regexp_extract(html, _attr_after("link", "rel", "canonical", "href"), 1)
    b = F.regexp_extract(html, _attr_after_rev("link", "href", "rel", "canonical"), 1)
    return F.nullif(F.trim(F.when(a != F.lit(""), a).otherwise(b)), F.lit(""))
