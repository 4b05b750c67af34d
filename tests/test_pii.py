"""PII detection/redaction: cross-engine regex parity (Java regex in Spark
vs RE2 in DuckDB), counting, redaction order, and the byte-identity
contract (redaction never touches the input column)."""

import duckdb
from pyspark.sql import functions as F

from pygridmap_spark.functions import pii

ROWS = [
    (0, "mail me at Bob.smith+x@Foo-bar.co.uk now"),
    (1, "server 10.0.255.3 and 192.168.1.1, call +44 20 7946 0958"),
    (2, "no pii here, just words and 1.2 numbers"),
    (3, "a@b.io pre1.2.3.4post +1-800-555-0199"),
    (4, "edge: x@y.z a@b.c 999.999.999.999"),
    (5, ""),
    (6, None),
    (7, "double a@b.com c@d.org and +33 6 1234 5678 plus 8.8.8.8"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_counts_and_redaction_match_duckdb(spark):
    out = (
        pii.with_pii_redacted(pii.with_pii_stats(_df(spark)))
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", ROWS)
    em, ip, ph = pii.EMAIL_PATTERN, pii.IPV4_PATTERN, pii.PHONE_PATTERN
    oracle = con.execute(
        f"""
        select len(regexp_extract_all(text, '{em}')),
               len(regexp_extract_all(text, '{ip}')),
               len(regexp_extract_all(text, '{ph}')),
               regexp_replace(regexp_replace(regexp_replace(
                   text, '{em}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'),
                   '{ph}', '<PHONE>', 'g')
        from t order by doc_id
        """
    ).fetchall()
    for row, (n_em, n_ip, n_ph, red) in zip(out, oracle):
        assert (row.n_emails, row.n_ipv4, row.n_phones) == (n_em, n_ip, n_ph)
        assert row.text_redacted == red


def test_redaction_is_new_column_and_input_untouched(spark):
    df = _df(spark)
    out = pii.with_pii_redacted(df)
    assert "text_redacted" in out.columns and "text" in out.columns
    orig = {r.doc_id: r.text for r in df.collect()}
    for r in out.collect():
        assert r.text == orig[r.doc_id]


def test_expected_counts(spark):
    got = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones, r.has_pii)
        for r in pii.with_pii_stats(_df(spark)).collect()
    }
    assert got[0] == (1, 0, 0, True)
    assert got[1] == (0, 2, 1, True)
    assert got[2] == (0, 0, 0, False)
    assert got[3] == (1, 0, 1, True)
    # x@y.z / a@b.c: TLD shorter than 2 chars is not an email;
    # 999.999.999.999 is counted (syntactic IPv4, no range check)
    assert got[4] == (0, 1, 0, True)
    assert got[5] == (0, 0, 0, False)
    assert got[6] == (None, None, None, None)
    # +33 6 ...: the 1-digit second group misses the conservative phone
    # pattern (2-4 digits required) — deliberate, not a defect
    assert got[7] == (2, 1, 0, True)


def test_redaction_order(spark):
    # bob@1.2.3.4 has no alphabetic TLD so the email pass skips it; the
    # IPv4 pass then consumes the address part
    df = spark.createDataFrame([("x bob@1.2.3.4 y",)], "text string")
    r = df.select(pii.redact_pii(F.col("text")).alias("red")).first()
    assert r.red == "x bob@<IP> y"
    # an email with an alphabetic TLD IS consumed whole by the first pass
    df2 = spark.createDataFrame([("x bob@mail4.example.com y",)], "text string")
    r2 = df2.select(pii.redact_pii(F.col("text")).alias("red")).first()
    assert r2.red == "x <EMAIL> y"


def test_custom_tokens(spark):
    df = spark.createDataFrame([("a@b.com at 1.2.3.4",)], "text string")
    r = df.select(
        pii.redact_pii(F.col("text"), email_token="[E]", ip_token="[I]").alias("red")
    ).first()
    assert r.red == "[E] at [I]"


def test_zero_shuffle_plan(spark):
    plan = pii.with_pii_redacted(
        pii.with_pii_stats(_df(spark))
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_scrub_matches_batch(spark, tmp_path):
    # the scrub is a stateless projection, so it must be usable unchanged
    # on a stream and emit EXACTLY the batch result (no watermark, no state)
    from pygridmap_spark.functions import pii

    src = str(tmp_path / "pii_src")
    docs = spark.createDataFrame(
        [(i, f"doc {i} mail u{i}@ex{i % 5}.com at 10.0.{i % 256}.7")
         for i in range(200)],
        "doc_id long, text string",
    )
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    scrubbed = pii.with_pii_redacted(pii.with_pii_stats(stream))
    q = (
        scrubbed.writeStream.format("memory")
        .queryName("pii_scrub")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, n_emails, n_ipv4, n_phones, text_redacted "
            "FROM pii_scrub"
        ).collect()
    }
    batch = {
        (r.doc_id, r.n_emails, r.n_ipv4, r.n_phones, r.text_redacted)
        for r in pii.with_pii_redacted(
            pii.with_pii_stats(spark.read.parquet(src))
        ).collect()
    }
    assert got == batch and len(got) == 200


# ---------------------------------------------------------------------------
# html_to_text (lives in functions/text; tested here with the other
# crawl-intake scrubbers)
# ---------------------------------------------------------------------------

HTML_CASES = [
    ("<html><head><title>T</title><style>p{c:red}</style></head>"
     "<body><p>Hello <b>world</b></p><script>var x='<p>no</p>';</script>"
     "<div>bye &amp; hi &lt;3 a&nbsp;b</div><!-- c --></body></html>",
     'T Hello world bye & hi <3 a b'),
    ("plain text no tags", "plain text no tags"),
    ("<p>multi\nline <script>\nvar y=1;\n</script>tail</p>", "multi line tail"),
    ("<SCRIPT>UPPER body strips too</SCRIPT> kept", "kept"),
    ("<a href='x'>link</a> <br/> tailing", "link tailing"),
    # escaped entity text must decode ONCE: a page DISPLAYING '&lt;'
    # (writes '&amp;lt;') extracts to '&lt;', never '<'
    ("<p>code sample: &amp;lt; and &amp;amp;</p>",
     "code sample: &lt; and &amp;"),
]


def test_html_to_text_cases(spark):
    from pygridmap_spark.functions import text as TX

    df = spark.createDataFrame([(h,) for h, _ in HTML_CASES], "html string")
    got = [r.t for r in df.select(TX.html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [want for _, want in HTML_CASES]


def test_html_to_text_matches_duckdb(spark):
    import duckdb
    from pygridmap_spark.functions import text as TX

    htmls = [h for h, _ in HTML_CASES] + [None, "<script>unclosed eats rest"]
    df = spark.createDataFrame([(h,) for h in htmls], "html string")
    got = [r.t for r in df.select(TX.html_to_text(F.col("html")).alias("t")).collect()]
    con = duckdb.connect()
    con.execute("create table t(i int, html varchar)")
    con.executemany("insert into t values (?,?)", list(enumerate(htmls)))
    sc, st = TX.HTML_SCRIPT_PATTERN, TX.HTML_STYLE_PATTERN
    cm, tg = TX.HTML_COMMENT_PATTERN, TX.HTML_TAG_PATTERN
    ora = [r[0] for r in con.execute(f"""
        select trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
               '{sc}', ' ', 'g'), '{st}', ' ', 'g'),
               '{cm}', ' ', 'g'), '{tg}', ' ', 'g'),
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
          '\\s+', ' ', 'g')) from t order by i""").fetchall()]
    assert got == ora


def test_html_to_text_zero_shuffle(spark):
    from pygridmap_spark.functions import text as TX

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = df.select(TX.html_to_text(F.col("html")).alias("t")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
