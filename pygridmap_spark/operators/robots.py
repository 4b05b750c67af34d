"""robots.txt parsing + URL allow/deny matching — crawl politeness for
the webtext intake family (REP, RFC 9309, public).

Not a reference feature (eurostat/pygridmap is geospatial-only); part of
the crawl-pipeline family next to canonical_url / host_link_graph. The
whole parse is declarative Catalyst (split + regexp + two window
passes), and matching is a broadcast dimension join — robots.txt files
are per-HOST dimension data (a few KB each, one per host), so even a
100 TB page corpus carries a rules table bounded by distinct hosts.

Contract (the subset both Java regex and RE2 state identically, so the
driver oracle re-runs the parse in DuckDB):

- ``#`` comments strip anywhere on a line; blank lines ignored.
- A GROUP is a contiguous run of ``User-agent:`` lines followed by its
  ``Allow:``/``Disallow:`` rules; every UA line in the run owns every
  rule of the group (the RFC 9309 multi-UA-group rule).
- Agent match is case-insensitive and exact-token (no substring
  product matching); a group for the specific agent beats ``*`` — if
  ANY specific group exists for a host, the ``*`` groups are ignored
  for that agent (RFC 9309 group-selection).
- Rule paths are LITERAL prefixes: ``*`` and ``$`` wildcards are NOT
  interpreted (treated as ordinary characters) — the conservative
  subset every crawler agrees on; empty-path rules have no effect and
  drop.
- Longest-match precedence; at equal length ``allow`` wins (Google/
  RFC 9309 tie rule). No matching rule, no robots.txt, or an
  unparseable URL -> allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygridmap_spark.operators.linkgraph import link_host

# comment stripping + line-shape extraction (Java-regex/RE2 agreement
# subset: classes, \s/\S, (?i), non-capturing groups only)
_UA_RE = r"(?i)^user-agent:\s*(\S+)"
_DIR_RE = r"(?i)^(allow|disallow):"
_PATH_RE = r"(?i)^(?:allow|disallow):\s*(\S*)"
# path+query of an absolute URL; no match -> '/'
_PATH_OF_URL_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)"


def parse_robots(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Parse per-host robots.txt bodies into the applicable rules table
    for ``agent``: ``(host, rule_type, path, rule_len)`` with
    ``rule_type`` in {'allow', 'disallow'}. Group structure via two
    window passes over line position (a new block starts at each
    UA-run head); group selection keeps the specific agent's groups,
    else the ``*`` groups. The output is dimension-sized (rules per
    host), meant to be broadcast by :func:`check_urls`."""
    agent = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("raw"), "#.*", "")).alias("line"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    shaped = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _UA_RE, 1)).alias("ua"),
        F.lower(F.regexp_extract("line", _DIR_RE, 1)).alias("rule_type"),
        F.regexp_extract("line", _PATH_RE, 1).alias("path"),
    ).withColumn(
        "is_ua", F.col("ua") != ""
    )
    blocks = shaped.withColumn(
        "blk",
        F.sum(
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("long")
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    uas = blocks.filter(F.col("is_ua")).select("host", "blk", "ua")
    rules = blocks.filter(
        (F.col("rule_type") != "") & (F.col("path") != "")
    ).select("host", "blk", "rule_type", "path")
    grp = uas.join(rules, ["host", "blk"]).filter(
        F.col("ua").isin(agent, "*")
    )
    spec = grp.groupBy("host").agg(
        F.max((F.col("ua") == agent).cast("int")).alias("__has_spec__")
    )
    return (
        grp.join(spec, "host")
        .filter(
            (F.col("ua") == agent)
            | ((F.col("__has_spec__") == 0) & (F.col("ua") == "*"))
        )
        .select(
            "host",
            "rule_type",
            "path",
            F.length("path").cast("int").alias("rule_len"),
        )
        .distinct()
    )


def check_urls(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Verdict each DISTINCT url against a parsed rules table (the
    output of :func:`parse_robots`): ``(url, host, allowed,
    rule_path)`` where ``rule_path`` is the winning rule's prefix (NULL
    when no rule matched). Longest literal-prefix match; allow wins
    length ties; no match / no robots / unparseable URL -> allowed.

    Scale shape: the rules side is host-bounded dimension data —
    broadcast join, zero shuffle on the url side beyond the final
    per-url agg (which partial-aggregates); duplicate input urls
    collapse (compose with a join back to enrich a page frame)."""
    u = urls.select(F.col(url_col).alias("url")).distinct()
    u = u.select(
        "url",
        link_host(F.col("url")).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract("url", _PATH_OF_URL_RE, 1), F.lit("")),
            F.lit("/"),
        ).alias("__p__"),
    )
    j = u.join(
        F.broadcast(rules),
        on=[
            u["host"] == rules["host"],
            u["__p__"].startswith(rules["path"]),
        ],
        how="left",
    )
    win = F.when(
        F.col("rule_len").isNotNull(),
        F.struct(
            F.col("rule_len").alias("l"),
            (F.col("rule_type") == "allow").cast("int").alias("a"),
            F.col("path").alias("p"),
        ),
    )
    agg = j.groupBy(u["url"], u["host"]).agg(F.max(win).alias("__w__"))
    return agg.select(
        "url",
        "host",
        F.coalesce(F.col("__w__.a") == 1, F.lit(True)).alias("allowed"),
        F.col("__w__.p").alias("rule_path"),
    )


# Per-tag alternation ON PURPOSE: a single '<(url|sitemap)...</(url|sitemap)>'
# pattern lets a <url> block missing its close tag be "closed" by a later
# </sitemap>, silently merging entries; per-tag alternatives cannot
# cross-close (alternatives start at distinct literals, so Java-regex and
# RE2 leftmost-first semantics agree). The driver oracle interpolates THIS
# constant — one definition, no drift.
SITEMAP_BLOCK_PATTERN = (
    r"(?is)<url\b[^>]*>.*?</url>|<sitemap\b[^>]*>.*?</sitemap>"
)


def parse_sitemaps(
    df: DataFrame,
    xml_col: str = "xml",
    url_col: str = "sitemap_url",
) -> DataFrame:
    """XML sitemap intake (sitemaps.org protocol, public): explode each
    sitemap document into its ``<url>`` entries — ``(sitemap_url, loc,
    lastmod, changefreq, priority)`` — and each sitemap INDEX into its
    child sitemaps (``is_index = true``, loc = the child sitemap URL).
    The crawl-seeding companion of :func:`parse_robots` (robots says MAY
    we fetch, the frontier says WHEN, sitemaps say WHAT EXISTS).

    Declarative contract, not an XML parser: ``<url>``/``<sitemap>``
    blocks lift via one ``regexp_extract_all`` + explode, fields via
    anchored case-insensitive extracts (Java-regex/RE2 agreement subset:
    no backrefs, no lookaround — the html_to_text discipline); CDATA and
    XML entities pass through verbatim; ``lastmod`` stays a STRING (W3C
    datetime parsing is engine-dialect territory — callers cast with
    their own format contract); ``priority`` casts to double (NULL when
    absent or malformed — both engines' silent-NULL cast via try_cast
    semantics is avoided by extracting a numeric-shaped token only).
    Blocks missing ``<loc>`` are dropped (an entry without a URL seeds
    nothing).

    Zero shuffle: one projection + one explode, scan-bound at crawl
    scale; entries never exceed the 50k-per-sitemap protocol cap so the
    explode fan-out is bounded per row.
    """
    blocks = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(SITEMAP_BLOCK_PATTERN), 0)
    )
    b = F.col("__blk__")
    loc = F.nullif(
        F.regexp_extract(b, r"(?is)<loc[^>]*>\s*(.*?)\s*</loc>", 1), F.lit("")
    )
    lastmod = F.nullif(
        F.regexp_extract(b, r"(?is)<lastmod[^>]*>\s*(.*?)\s*</lastmod>", 1), F.lit("")
    )
    changefreq = F.nullif(
        F.regexp_extract(b, r"(?is)<changefreq[^>]*>\s*(.*?)\s*</changefreq>", 1),
        F.lit(""),
    )
    # numeric-shaped token only: a malformed priority extracts '' -> NULL
    # identically in both engines (no engine-specific cast fallback)
    priority = F.nullif(
        F.regexp_extract(
            b, r"(?is)<priority[^>]*>\s*([0-9]+(?:\.[0-9]+)?)\s*</priority>", 1
        ),
        F.lit(""),
    ).cast("double")
    is_index = F.lower(F.substring(b, 2, 7)) == F.lit("sitemap")
    return (
        df.select(F.col(url_col), blocks.alias("__blk__"))
        .select(
            url_col,
            loc.alias("loc"),
            lastmod.alias("lastmod"),
            changefreq.alias("changefreq"),
            priority.alias("priority"),
            is_index.alias("is_index"),
        )
        .filter(F.col("loc").isNotNull())
    )
