"""PII detection and redaction for web-crawl text — pure Catalyst regexp
expressions (zero Python, zero shuffle, whole-stage codegen), the standard
pre-training scrub pass (emails, IPv4 addresses, international-format phone
numbers).

Not a reference feature (eurostat/pygridmap is geospatial-only); this is
part of the LLM-training-data family the engine adds on top. Patterns are
deliberately restricted to the regex subset where Java regex (Spark) and
RE2 (DuckDB) agree — character classes, bounded quantifiers, non-capturing
groups, ``\\b`` — so every output is oracle-checkable cross-engine
(verified in tests/test_pii.py and the ``pii_redact`` driver oracle).

Redaction NEVER mutates the input column in place: the pages pipeline pins
byte-identical ``text`` per url through every stage, so redacted text goes
to a NEW column (``with_pii_redacted(out_col=...)``) and the caller opts in
to replacing ``text`` explicitly.

Scale shape (100 TB): three ``regexp_replace`` passes per row inside one
codegen span — no exchange, no Python, linear scan bandwidth. At
~1 GB/s/core regex throughput the scrub is scan-bound, exactly what a
full-corpus pass should be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Kept alternation-free (RE2 leftmost-first vs Java leftmost-first agree
# trivially) and backtracking-free (linear-time in RE2; no catastrophic
# cases in Java either).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b"
# international format only: +CC then 3 separator-delimited groups.
# Deliberately conservative — bare 10-digit runs are more often ids/ISBNs
# than phone numbers in crawl text.
PHONE_PATTERN = r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_PATTERN))


def ipv4_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_PATTERN))


def phone_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_PATTERN))


def redact_pii(
    text: Column,
    email_token: str = EMAIL_TOKEN,
    ip_token: str = IP_TOKEN,
    phone_token: str = PHONE_TOKEN,
) -> Column:
    """Redacted copy of ``text``: emails, then IPv4s, then phones, each
    class replaced by its token. Order matters and is part of the contract
    (an email whose domain looks like an IP is consumed by the email pass
    first); the DuckDB oracle applies the same three passes in the same
    order."""
    out = F.regexp_replace(text, EMAIL_PATTERN, email_token)
    out = F.regexp_replace(out, IPV4_PATTERN, ip_token)
    return F.regexp_replace(out, PHONE_PATTERN, phone_token)


def with_pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_emails``, ``n_ipv4``, ``n_phones``, ``has_pii`` — the
    per-document audit columns a scrub pass reports before/after."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", email_count(t))
        .withColumn("n_ipv4", ipv4_count(t))
        .withColumn("n_phones", phone_count(t))
        .withColumn(
            "has_pii",
            (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0,
        )
    )


def with_pii_redacted(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    email_token: str = EMAIL_TOKEN,
    ip_token: str = IP_TOKEN,
    phone_token: str = PHONE_TOKEN,
) -> DataFrame:
    """Adds a redacted copy of ``text_col`` as ``out_col`` (NEW column by
    default — the pipeline's byte-identical ``text`` invariant stays
    intact unless the caller explicitly sets ``out_col=text_col``)."""
    return df.withColumn(
        out_col,
        redact_pii(F.col(text_col), email_token, ip_token, phone_token),
    )
