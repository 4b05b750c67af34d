"""WARC record parsing — the Common-Crawl intake format (ISO 28500,
public), text mode.

A WARC file is a concatenation of records, each ``WARC/1.0`` + CRLF
header block + CRLF CRLF + body (exactly ``Content-Length`` units) +
CRLF CRLF. Crawl pipelines land these as blobs; this module explodes
them into one row per record with the named headers lifted to columns
and the body cut at its declared length — all pure Catalyst (split +
posexplode + locate/substr + anchored regexp), zero shuffle, zero
Python, so a 100-TB crawl parse is scan-bound and the driver oracle
restates the identical arithmetic in DuckDB.

Contract (stated, not hidden):

- TEXT-mode WARC: the input column is a decoded string. Real WARC
  ``Content-Length`` counts BYTES; this parser cuts CHARACTERS, which
  agree only when the payload is ASCII-safe (the synthetic-fixture and
  WET-text case). Gzip-per-record `.warc.gz` transport belongs to the
  reader layer (`spark.read` binary + a decompress kernel), not here.
- Header extraction is case-insensitive on names, first occurrence
  wins; a record missing ``Content-Length`` yields a NULL body (the
  parser refuses to guess where it ends).
- Records are delimited by ``WARC/1.0\\r\\n`` at version-line position;
  the body-terminating CRLF CRLF is excluded from the body by the
  length cut.
- Because the record boundary is a SPLIT (parallel, vectorized) rather
  than a sequential Content-Length walk, a body that itself embeds the
  exact version line + CRLF would be mis-split. Real response payloads
  that may embed it (rare: pages quoting WARC) belong to the
  sequential reader; crawl text/WET payloads never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DELIM = "WARC/1.0\r\n"
# split() takes a Java regex: escape the '.'; CR/LF ride as literals
_DELIM_RE = "WARC/1\\.0\r\n"
# (?i) case-insensitive names, (?m) ^ anchors at CRLF line starts;
# values stop at \r (whitespace) — Java-regex/RE2 agreement subset
_TYPE_RE = r"(?im)^warc-type:\s*(\S+)"
_URI_RE = r"(?im)^warc-target-uri:\s*(\S+)"
_DATE_RE = r"(?im)^warc-date:\s*(\S+)"
_CLEN_RE = r"(?im)^content-length:\s*([0-9]+)"


def parse_warc(
    df: DataFrame,
    content_col: str = "warc",
    out_prefix: str = "",
) -> DataFrame:
    """Explode a text-mode WARC blob column into one row per record:
    all input columns pass through (minus the blob), plus
    ``record_idx`` (0-based position in the blob), ``warc_type``,
    ``target_uri``, ``warc_date``, ``content_length`` and ``body``
    (NULL when Content-Length is absent). Empty blobs and NULLs yield
    no rows (explode semantics)."""
    p = out_prefix
    keep = [c for c in df.columns if c != content_col]
    recs = df.select(
        *keep,
        F.posexplode(
            F.split(F.col(content_col), _DELIM_RE, -1)
        ).alias("__pos__", "__rec__"),
    ).filter((F.col("__pos__") > 0) & (F.col("__rec__") != ""))
    hpos = F.locate("\r\n\r\n", F.col("__rec__"))
    clen = F.regexp_extract("__rec__", _CLEN_RE, 1)
    shaped = recs.select(
        *keep,
        (F.col("__pos__") - 1).cast("long").alias(f"{p}record_idx"),
        F.nullif(
            F.regexp_extract("__rec__", _TYPE_RE, 1), F.lit("")
        ).alias(f"{p}warc_type"),
        F.nullif(
            F.regexp_extract("__rec__", _URI_RE, 1), F.lit("")
        ).alias(f"{p}target_uri"),
        F.nullif(
            F.regexp_extract("__rec__", _DATE_RE, 1), F.lit("")
        ).alias(f"{p}warc_date"),
        F.when(clen != "", clen.cast("long")).alias("__cl__"),
        F.col("__rec__").alias("__rec__"),
        hpos.alias("__h__"),
    )
    body = F.when(
        (F.col("__h__") > 0) & F.col("__cl__").isNotNull(),
        F.expr("substring(__rec__, __h__ + 4, __cl__)"),
    )
    return (
        shaped.withColumn(f"{p}body", body)
        .withColumnRenamed("__cl__", f"{p}content_length")
        .drop("__rec__", "__h__")
    )


def warc_record(
    warc_type,
    target_uri,
    warc_date,
    body,
):
    """Column expression building one serialized WARC/1.0 record from
    column inputs (the writer twin of :func:`parse_warc` — also the
    fixture generator for tests/oracles). Content-Length = length(body)
    in characters, per the text-mode contract above."""
    crlf = F.lit("\r\n")
    return F.concat(
        F.lit(_DELIM),
        F.lit("WARC-Type: "), warc_type, crlf,
        F.lit("WARC-Target-URI: "), target_uri, crlf,
        F.lit("WARC-Date: "), warc_date, crlf,
        F.lit("Content-Length: "), F.length(body).cast("string"), crlf,
        crlf,
        body,
        crlf, crlf,
    )
