"""Deterministic page geolocation (BASELINE north-star stage 1).

The reference has no geolocation; the north star requires URL/text-derived
lat-lon. We pin the deterministic derivation from FIXTURES.md §1:

    lat = -60 + (sha256(url) % 1_300_000) / 10_000
    lon = -180 + (sha256(reverse(url)) % 3_600_000) / 10_000

where ``sha256(s)`` is defined as the integer value of the first 15 hex
digits (60 bits) of the digest — computable identically JVM-side
(``sha2``/``conv``) and in Python (`hashlib`) for the byte-identity tests.
Everything is a Catalyst expression: no Python in the hot path.

An integer-hash variant (`lat_lon_from_id`, Knuth multiplicative) exists so
the driver's DuckDB oracle can reproduce coordinates with plain int64 SQL
arithmetic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

LAT_MOD = 1_300_000  # -60 .. +70 degrees in 1e-4 steps
LON_MOD = 3_600_000  # -180 .. +180 degrees in 1e-4 steps

# Multiplicative hash constants for the id-hash variant (public-domain
# Knuth / xxhash-prime values; pure int64 arithmetic, no overflow for
# ids < ~4e9 so Spark SQL and DuckDB SQL agree bit-for-bit)
KNUTH = 2654435761
KNUTH2 = 2246822519


def _hash60(col: Column) -> Column:
    """First 60 bits of sha256 as a bigint (JVM-side)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def lat_from_url(url: Column) -> Column:
    return F.lit(-60.0) + (_hash60(url) % LAT_MOD).cast("double") / F.lit(10_000.0)


def lon_from_url(url: Column) -> Column:
    return F.lit(-180.0) + (_hash60(F.reverse(url)) % LON_MOD).cast("double") / F.lit(10_000.0)


def with_geolocation(df, url: str = "url"):
    """Append (lat, lon) derived from the url — single projection."""
    return df.withColumns({"lat": lat_from_url(F.col(url)), "lon": lon_from_url(F.col(url))})


def lat_lon_from_id(id_col: Column) -> tuple[Column, Column]:
    """Oracle-friendly integer-hash geolocation: identical arithmetic in
    Spark SQL and DuckDB SQL (int64, no overflow for ids < ~7e9):

        lat = -60 + ((id * 2654435761) % 1_300_000) / 10_000
        lon = -180 + ((id * 2246822519) % 3_600_000) / 10_000
    """
    lat = F.lit(-60.0) + (id_col.cast("long") * F.lit(KNUTH) % LAT_MOD).cast("double") / F.lit(10_000.0)
    lon = F.lit(-180.0) + (id_col.cast("long") * F.lit(KNUTH2) % LON_MOD).cast("double") / F.lit(10_000.0)
    return lat, lon


# --- Python twins (tests pin Spark == Python determinism) -------------------


def py_hash60(s: str) -> int:
    return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:15], 16)


def py_lat_lon(url: str) -> tuple[float, float]:
    lat = -60.0 + (py_hash60(url) % LAT_MOD) / 10_000.0
    lon = -180.0 + (py_hash60(url[::-1]) % LON_MOD) / 10_000.0
    return lat, lon


def py_lat_lon_from_id(i: int) -> tuple[float, float]:
    return (
        -60.0 + (i * KNUTH % LAT_MOD) / 10_000.0,
        -180.0 + (i * KNUTH2 % LON_MOD) / 10_000.0,
    )
