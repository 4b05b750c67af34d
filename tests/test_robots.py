"""robots.txt parse + match (operators/robots) pins.

The driver oracle (`robots_allow`) hash-gates the whole parse+match
against the identical restatement in DuckDB; these pin the REP
semantics themselves: group structure (multi-UA runs), specific-agent
precedence over '*', longest-match + allow-wins-ties, comment/blank
handling, the literal-prefix contract, and the allowed-by-default
edges (no rules, no robots, unparseable URL).
"""

from __future__ import annotations

from pygridmap_spark.operators import robots as RB

ROBOTS = "\n".join(
    [
        "# global group",
        "User-agent: *",
        "Disallow: /private",
        "Allow: /private/ok",
        "",
        "User-agent: GoodBot",
        "User-Agent: OtherBot   # multi-UA run",
        "Disallow: /beta",
        "Allow: /beta/docs",
        "Disallow:    # empty path: no effect",
    ]
)


def _robots_df(spark, host="a.com", content=ROBOTS):
    return spark.createDataFrame(
        [(host, content)], "host string, robots_txt string"
    )


def _check(spark, agent, paths, host="a.com"):
    rules = RB.parse_robots(_robots_df(spark), agent)
    urls = spark.createDataFrame(
        [(f"https://{host}{p}",) for p in paths], "url string"
    )
    return {
        r.url.split(host)[1]: (r.allowed, r.rule_path)
        for r in RB.check_urls(urls, rules).collect()
    }


def test_star_group_longest_match_allow_wins(spark):
    got = _check(
        spark, "randombot",
        ["/private/x", "/private/ok/y", "/public", "/privateer"],
    )
    assert got["/private/x"] == (False, "/private")
    assert got["/private/ok/y"] == (True, "/private/ok")  # longer allow
    assert got["/public"] == (True, None)                 # no match
    # literal-prefix contract: /privateer IS prefixed by /private
    assert got["/privateer"] == (False, "/private")


def test_specific_agent_group_overrides_star(spark):
    got = _check(
        spark, "goodbot", ["/private/x", "/beta/x", "/beta/docs/y"]
    )
    # the '*' group is IGNORED once a specific group exists
    assert got["/private/x"] == (True, None)
    assert got["/beta/x"] == (False, "/beta")
    assert got["/beta/docs/y"] == (True, "/beta/docs")


def test_multi_ua_run_shares_rules(spark):
    got = _check(spark, "otherbot", ["/beta/x", "/private/x"])
    assert got["/beta/x"] == (False, "/beta")
    assert got["/private/x"] == (True, None)


def test_agent_match_case_insensitive_exact(spark):
    got = _check(spark, "GOODBOT", ["/beta/x"])
    assert got["/beta/x"] == (False, "/beta")
    # exact-token: a different bot name does not inherit GoodBot's group
    got = _check(spark, "goodbot2", ["/beta/x", "/private/x"])
    assert got == {"/beta/x": (True, None), "/private/x": (False, "/private")}


def test_no_robots_and_unparseable_default_allow(spark):
    rules = RB.parse_robots(_robots_df(spark, host="b.com"), "anybot")
    urls = spark.createDataFrame(
        [("https://a.com/private/x",), ("not a url",)], "url string"
    )
    got = {r.url: (r.allowed, r.host) for r in
           RB.check_urls(urls, rules).collect()}
    assert got["https://a.com/private/x"][0] is True  # no robots for a.com
    assert got["not a url"] == (True, None)           # unparseable -> allowed


def test_root_path_and_query(spark):
    content = "User-agent: *\nDisallow: /\nAllow: /s?safe=1"
    rules = RB.parse_robots(_robots_df(spark, content=content), "x")
    urls = spark.createDataFrame(
        [("https://a.com",), ("https://a.com/s?safe=1&q=2",)], "url string"
    )
    got = {r.url: r.allowed for r in RB.check_urls(urls, rules).collect()}
    assert got["https://a.com"] is False              # bare host -> path '/'
    assert got["https://a.com/s?safe=1&q=2"] is True  # query in the match


def test_empty_and_comment_lines_ignored(spark):
    content = "\n\n# only comments\nUser-agent: *\n# note\nDisallow: /x\n\n"
    rules = RB.parse_robots(_robots_df(spark, content=content), "z")
    rows = rules.collect()
    assert [(r.rule_type, r.path) for r in rows] == [("disallow", "/x")]


# --- sitemap intake --------------------------------------------------------


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://ex.com/a </loc><lastmod>2024-01-05</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://ex.com/b</loc></url>
  <url><lastmod>2024-02-01</lastmod></url>
  <URL><LOC>https://ex.com/upper</LOC><PRIORITY>bogus</PRIORITY></URL>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.com/s1.xml</loc><lastmod>2024-03-01</lastmod></sitemap>
  <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def _smframe(spark):
    return spark.createDataFrame(
        [("https://ex.com/sitemap.xml", SITEMAP),
         ("https://ex.com/index.xml", SITEMAP_INDEX)],
        "sitemap_url string, xml string",
    )


def test_sitemap_entries(spark):
    from pygridmap_spark.operators.robots import parse_sitemaps

    out = {
        (r["sitemap_url"], r["loc"]): r for r in parse_sitemaps(_smframe(spark)).collect()
    }
    a = out[("https://ex.com/sitemap.xml", "https://ex.com/a")]
    assert a["lastmod"] == "2024-01-05"
    assert a["changefreq"] == "daily"
    assert a["priority"] == 0.8
    assert a["is_index"] is False
    b = out[("https://ex.com/sitemap.xml", "https://ex.com/b")]
    assert b["lastmod"] is None and b["priority"] is None
    up = out[("https://ex.com/sitemap.xml", "https://ex.com/upper")]
    assert up["priority"] is None  # malformed priority -> NULL, no cast error
    # the loc-less <url> block is dropped
    assert len([k for k in out if k[0].endswith("sitemap.xml")]) == 3


def test_sitemap_index(spark):
    from pygridmap_spark.operators.robots import parse_sitemaps

    out = [r for r in parse_sitemaps(_smframe(spark)).collect() if r["is_index"]]
    assert {r["loc"] for r in out} == {"https://ex.com/s1.xml", "https://ex.com/s2.xml"}
    assert all(r["sitemap_url"] == "https://ex.com/index.xml" for r in out)


def test_sitemap_missing_close_tag_does_not_cross_close(spark):
    # a <url> missing </url> must NOT swallow the following <sitemap>
    # entry via its </sitemap> close (per-tag alternation)
    from pygridmap_spark.operators.robots import parse_sitemaps

    xml = ("<urlset><url><loc>https://ex.com/a</loc>"
           "<sitemap><loc>https://ex.com/child.xml</loc></sitemap></urlset>")
    df = spark.createDataFrame([("s", xml)], "sitemap_url string, xml string")
    out = parse_sitemaps(df).collect()
    # the malformed <url> block is unrecoverable (no close tag) and drops;
    # the well-formed child sitemap entry SURVIVES
    assert {(r["loc"], r["is_index"]) for r in out} == {
        ("https://ex.com/child.xml", True)
    }
