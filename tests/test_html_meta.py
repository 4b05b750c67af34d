"""HTML metadata extraction (functions/text.html_title /
html_meta_content / html_canonical): title entity-decode + squeeze,
meta description in either attribute order, canonical link href (raw by
contract), NULL-when-absent, first-match-wins, and the documented
out-of-contract edges (unclosed title, unquoted attributes). Each case
also runs through the DuckDB twin of the chain — the cross-engine
parity the driver oracle relies on.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pygridmap_spark.functions import text as TX

CASES = [
    # (html, title, meta_description, canonical)
    ("<html><head><title>Hello  World</title></head></html>",
     "Hello World", None, None),
    ("<TITLE LANG=en>A &amp; B &lt;tag&gt;</TITLE>",
     "A & B <tag>", None, None),
    ("<title>first</title><title>second</title>", "first", None, None),
    ("<title></title>", None, None, None),
    ("<title>unclosed", None, None, None),
    ('<meta name="description" content="Fine &quot;page&quot; here">',
     None, 'Fine "page" here', None),
    ("<meta content='flipped order' name='description'>",
     None, "flipped order", None),
    ('<meta name="keywords" content="not this">', None, None, None),
    # attribute-name boundary: data-name must NOT satisfy name=
    ('<meta data-name="description" content="junk">', None, None, None),
    ('<link data-rel="canonical" href="/fake">', None, None, None),
    ('<link rel="canonical" href="https://ex.com/a?x=1&amp;y=2">',
     None, None, "https://ex.com/a?x=1&amp;y=2"),  # raw: no entity decode
    ("<link href='https://ex.com/b' rel='canonical'>",
     None, None, "https://ex.com/b"),
    ('<link rel="stylesheet" href="/s.css">', None, None, None),
    ("<p>no metadata at all</p>", None, None, None),
    ('<head><title> Mixed </title>'
     '<meta name="description" content="d1"><meta name="description" content="d2">'
     '<link rel="canonical" href="/c1"><link rel="canonical" href="/c2"></head>',
     "Mixed", "d1", "/c1"),
]


def _spark_rows(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, *_e) in enumerate(CASES)], "i long, html string"
    )
    return {
        r["i"]: (r["t"], r["d"], r["c"])
        for r in df.select(
            "i",
            TX.html_title(F.col("html")).alias("t"),
            TX.html_meta_content(F.col("html")).alias("d"),
            TX.html_canonical(F.col("html")).alias("c"),
        ).collect()
    }


def test_cases(spark):
    got = _spark_rows(spark)
    for i, (_h, t, d, c) in enumerate(CASES):
        assert got[i] == (t, d, c), f"case {i}"


def test_duckdb_parity(spark):
    got = _spark_rows(spark)
    ent = ("replace(replace(replace(replace(replace(replace({x}, "
           "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), "
           "'&quot;', '\"'), '&#39;', ''''), '&amp;', '&')")
    sq = "nullif(trim(regexp_replace({x}, '\\s+', ' ', 'g')), '')"
    title = sq.format(x=ent.format(
        x=f"regexp_extract(html, '{TX.HTML_TITLE_PATTERN}', 1)"))
    ma = "regexp_extract(html, '" + TX._attr_after("meta", "name", "description", "content").replace("'", "''") + "', 1)"
    mb = "regexp_extract(html, '" + TX._attr_after_rev("meta", "content", "name", "description").replace("'", "''") + "', 1)"
    meta = sq.format(x=ent.format(
        x=f"CASE WHEN {ma} != '' THEN {ma} ELSE {mb} END"))
    ca = "regexp_extract(html, '" + TX._attr_after("link", "rel", "canonical", "href").replace("'", "''") + "', 1)"
    cb = "regexp_extract(html, '" + TX._attr_after_rev("link", "href", "rel", "canonical").replace("'", "''") + "', 1)"
    canon = f"nullif(trim(CASE WHEN {ca} != '' THEN {ca} ELSE {cb} END), '')"
    con = duckdb.connect()
    con.execute("CREATE TABLE cases (i BIGINT, html VARCHAR)")
    con.executemany(
        "INSERT INTO cases VALUES (?, ?)",
        [(i, h) for i, (h, *_e) in enumerate(CASES)],
    )
    exp = {
        int(r[0]): (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT i, {title} AS t, {meta} AS d, {canon} AS c FROM cases"
        ).fetchall()
    }
    assert got == exp


def test_meta_name_token_contract(spark):
    with pytest.raises(ValueError, match="plain token"):
        TX.html_meta_content(F.lit("<p/>"), name="a b")
    # og:description-style names are tokens
    TX.html_meta_content(F.lit("<p/>"), name="og:description")
