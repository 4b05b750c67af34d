"""WARC text-mode record parsing (sources/warc) pins.

The driver oracle (`warc_parse`) hash-gates the parse against the
identical string arithmetic in DuckDB; these pin the format semantics:
multi-record explode, the Content-Length body cut (terminator CRLF
excluded, trailing content beyond the length excluded), header
case-insensitivity, missing-length NULL body, write/parse round-trip,
and passthrough columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygridmap_spark.sources import warc as WC


def _blob(records):
    out = []
    for typ, uri, date, body, clen in records:
        hdr = (
            f"WARC/1.0\r\nWARC-Type: {typ}\r\nWARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
        )
        if clen is not None:
            hdr += f"Content-Length: {clen}\r\n"
        out.append(hdr + "\r\n" + body + "\r\n\r\n")
    return "".join(out)


def test_multi_record_parse_and_length_cut(spark):
    blob = _blob(
        [
            ("response", "https://a.com/x", "2026-01-01T00:00:00Z",
             "hello world", 11),
            # declared length SHORTER than the payload: cut, not guessed
            ("metadata", "https://a.com/y", "2026-01-02T00:00:00Z",
             "0123456789abcdef", 10),
        ]
    )
    df = spark.createDataFrame([(7, blob)], "file_id long, warc string")
    rows = WC.parse_warc(df).orderBy("record_idx").collect()
    assert len(rows) == 2
    r0, r1 = rows
    assert (r0.file_id, r0.record_idx, r0.warc_type) == (7, 0, "response")
    assert r0.target_uri == "https://a.com/x"
    assert r0.body == "hello world" and r0.content_length == 11
    assert r1.body == "0123456789" and r1.warc_type == "metadata"


def test_missing_content_length_null_body(spark):
    blob = _blob([("response", "u", "d", "body here", None)])
    df = spark.createDataFrame([(blob,)], "warc string")
    [r] = WC.parse_warc(df).collect()
    assert r.content_length is None and r.body is None
    assert r.warc_type == "response"  # headers still parse


def test_header_names_case_insensitive(spark):
    blob = (
        "WARC/1.0\r\nwarc-type: request\r\nWARC-TARGET-URI: u\r\n"
        "warc-date: d\r\ncontent-length: 2\r\n\r\nab\r\n\r\n"
    )
    df = spark.createDataFrame([(blob,)], "warc string")
    [r] = WC.parse_warc(df).collect()
    assert (r.warc_type, r.target_uri, r.content_length, r.body) == (
        "request", "u", 2, "ab",
    )


def test_body_may_contain_crlf_crlf(spark):
    body = "para one\r\n\r\npara two"
    blob = _blob([("response", "u", "d", body, len(body))])
    df = spark.createDataFrame([(blob,)], "warc string")
    [r] = WC.parse_warc(df).collect()
    assert r.body == body  # length cut, not terminator search


def test_roundtrip_with_warc_record_writer(spark):
    docs = spark.range(20).select(
        F.col("id"),
        F.concat(F.lit("https://h"), F.col("id"), F.lit(".com/p")).alias("u"),
        F.concat(F.lit("text body "), F.col("id")).alias("t"),
    )
    blobs = docs.select(
        "id",
        WC.warc_record(
            F.lit("response"), F.col("u"), F.lit("2026-01-01T00:00:00Z"),
            F.col("t"),
        ).alias("warc"),
    )
    got = WC.parse_warc(blobs).collect()
    assert len(got) == 20
    for r in got:
        assert r.body == f"text body {r.id}"
        assert r.target_uri == f"https://h{r.id}.com/p"
        assert r.content_length == len(r.body)


def test_null_and_empty_blob_yield_no_rows(spark):
    df = spark.createDataFrame([(None,), ("",)], "warc string")
    assert WC.parse_warc(df).count() == 0
