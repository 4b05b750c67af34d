"""URL/domain analysis functions — the host/domain feature extraction a
web-crawl pipeline needs (per-domain crawl budgets, domain-level quality
rollups, host dedup keys).

Not a reference feature (eurostat/pygridmap is geospatial-only); built as
pure Catalyst expressions (`parse_url` is a JVM built-in — no Python in
the hot path), each with a deterministic regexp twin expressible in DuckDB
for oracle checks.

``registered_domain`` implements a public-suffix-style reduction over a
FIXED, documented suffix list (the real PSL is ~9k rules; carrying it is a
data-file decision, not an engine one — the column expression is the same
either way: longest matching suffix + one label).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# longest-match-first; each entry is a suffix whose "registered domain" is
# one label more. Extend with the full PSL for production use.
DEFAULT_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "com.au", "co.jp",
    "com", "org", "net", "edu", "gov", "de", "fr", "uk", "io",
)


def host(url: Column) -> Column:
    """Hostname of a URL, lowercased (JVM ``parse_url``; no port)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments: ``/a/b/c`` -> 3, ``/`` -> 0."""
    return F.size(F.filter(F.split(path(url), "/"), lambda x: x != F.lit("")))


def registered_domain(
    host_col: Column, suffixes: tuple[str, ...] = DEFAULT_SUFFIXES
) -> Column:
    """Public-suffix-style registered domain: the longest matching suffix
    from ``suffixes`` plus one label (``a.b.site.co.uk`` -> ``site.co.uk``);
    NULL when the host matches no suffix or IS a bare suffix."""
    ordered = sorted(suffixes, key=len, reverse=True)
    expr = F.lit(None).cast("string")
    for s in reversed(ordered):
        pat = "([^.]+\\." + s.replace(".", "\\.") + ")$"
        m = F.regexp_extract(host_col, pat, 1)
        expr = F.when(F.endswith(host_col, F.lit("." + s)) & (m != ""), m).otherwise(expr)
    # a host that IS a listed suffix has no registrable label (PSL rule):
    # without this guard 'co.uk' would fall through to the 'uk' rule
    return F.when(host_col.isin(*suffixes), F.lit(None).cast("string")).otherwise(expr)


def with_url_features(df, url: str = "url"):
    """Append ``host``, ``registered_domain``, ``path_depth`` — one narrow
    projection, whole-stage codegen."""
    h = host(F.col(url))
    return df.withColumns(
        {
            "host": h,
            "registered_domain": registered_domain(h),
            "path_depth": path_depth(F.col(url)),
        }
    )
