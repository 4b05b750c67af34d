"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation rules pinned in FIXTURES.md §1 and fully JVM-side (spark.range +
sha2/conv/element_at) — there is NO Python in the generator, so the flagship
throughput bench measures the engine, not the data source. Determinism: the
whole table is a pure function of the row id, reproducible from any worker,
any partitioning, any executor count (the distributed analog of a fixed
seed).

The text column is a pseudo-sentence selected word-by-word from the sha256
hex digest of the url; `py_text(url)` is the Python twin the byte-identity
tests pin Spark against.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 64-word vocabulary; index = value of one hex-digit pair of sha256(url) % 64
WORDS = [
    "grid", "tile", "cell", "map", "page", "crawl", "spark", "join",
    "index", "query", "shard", "batch", "vector", "raster", "layer", "zone",
    "north", "south", "east", "west", "region", "point", "area", "line",
    "the", "and", "of", "to", "is", "data", "web", "text",
    "der", "und", "die", "le", "la", "les", "il", "el",
    "que", "los", "est", "une", "che", "ist", "sono", "nicht",
    "open", "scale", "byte", "hash", "node", "edge", "graph", "tree",
    "stream", "table", "row", "column", "value", "key", "range", "block",
]
N_WORDS_PER_TEXT = 12
BASE_EPOCH = 1_600_000_000  # 2020-09-13 UTC


def pages(spark: SparkSession, n: int, n_hosts: int = 1000, partitions: int | None = None) -> DataFrame:
    """n synthetic pages, deterministic in the row id (seed-free rerunnable)."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    url = F.concat(
        F.lit("https://host"),
        (F.col("id") % n_hosts).cast("string"),
        F.lit(".example/"),
        F.col("id").cast("string"),
    )
    df = rng.select(url.alias("url"), F.col("id"))
    hexd = F.sha2(F.col("url"), 256)
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    word_at = lambda i: F.element_at(  # noqa: E731
        words_arr,
        (F.conv(F.substring(hexd, 2 * i + 1, 2), 16, 10).cast("int") % 64) + 1,
    )
    text = F.concat_ws(" ", *[word_at(i) for i in range(N_WORDS_PER_TEXT)])
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("it"), F.lit("es")),
        (F.conv(F.substring(hexd, 31, 2), 16, 10).cast("int") % 5) + 1,
    )
    return df.select(
        "url",
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id")).alias("warc_ts"),
        F.to_binary(
            F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), F.lit("utf-8")
        ).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


# --- Python twins (determinism pins) -----------------------------------------


def py_text(url: str) -> str:
    hexd = hashlib.sha256(url.encode("utf-8")).hexdigest()
    out = []
    for i in range(N_WORDS_PER_TEXT):
        pair = hexd[2 * i : 2 * i + 2]
        out.append(WORDS[int(pair, 16) % 64])
    return " ".join(out)


def py_url(i: int, n_hosts: int = 1000) -> str:
    return f"https://host{i % n_hosts}.example/{i}"
