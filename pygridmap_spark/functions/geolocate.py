"""Deterministic page geolocation (BASELINE north-star stage 1).

The reference has no geolocation; the north star requires URL/text-derived
lat-lon. Pinned deterministic derivation (FIXTURES.md §1): ONE sha256 of
the url supplies both coordinates —

    lat = -60  + (int(hex[ 0:15], 16) % 1_300_000) / 10_000
    lon = -180 + (int(hex[15:30], 16) % 3_600_000) / 10_000

(60 independent digest bits per axis; one hash per row instead of two —
sha2 is the dominant cost of the geolocate stage at cluster scale).
Computable identically JVM-side (``sha2``/``conv``) and in Python
(`hashlib`) for the byte-identity tests. Everything is a Catalyst
expression: no Python in the hot path.

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
# Knuth / xxhash-prime values). Pure int64 arithmetic overflows (ANSI
# error) at id >= 2^63/2654435761 ≈ 3.47e9 — this helper exists for
# ORACLE-checkable queries over the bounded-id test tables; lake-scale
# geolocation uses the sha2 url path, which has no id bound.
KNUTH = 2654435761
KNUTH2 = 2246822519


def _hash60(hexd: Column, start: int) -> Column:
    """60 digest bits (15 hex chars from ``start``, 1-based) as a bigint."""
    return F.conv(F.substring(hexd, start, 15), 16, 10).cast("long")


def lat_from_url(url: Column) -> Column:
    return lat_lon_from_url(url)[0]


def lon_from_url(url: Column) -> Column:
    return lat_lon_from_url(url)[1]


def lat_lon_from_url(url: Column) -> tuple[Column, Column]:
    hexd = F.sha2(url, 256)
    lat = F.lit(-60.0) + (_hash60(hexd, 1) % LAT_MOD).cast("double") / F.lit(10_000.0)
    lon = F.lit(-180.0) + (_hash60(hexd, 16) % LON_MOD).cast("double") / F.lit(10_000.0)
    return lat, lon


def with_geolocation(df, url: str = "url"):
    """Append (lat, lon) derived from one sha256 of the url — single
    projection; Catalyst CSEs the shared digest so the hash runs once."""
    lat, lon = lat_lon_from_url(F.col(url))
    return df.withColumns({"lat": lat, "lon": lon})


def lat_lon_from_id(id_col: Column) -> tuple[Column, Column]:
    """Oracle-friendly integer-hash geolocation: identical arithmetic in
    Spark SQL and DuckDB SQL (int64; ids must stay < ~3.47e9 or the
    multiply overflows — use the sha2 url path at lake scale):

        lat = -60 + ((id * 2654435761) % 1_300_000) / 10_000
        lon = -180 + ((id * 2246822519) % 3_600_000) / 10_000
    """
    lat = F.lit(-60.0) + (id_col.cast("long") * F.lit(KNUTH) % LAT_MOD).cast("double") / F.lit(10_000.0)
    lon = F.lit(-180.0) + (id_col.cast("long") * F.lit(KNUTH2) % LON_MOD).cast("double") / F.lit(10_000.0)
    return lat, lon


# --- Python twins (tests pin Spark == Python determinism) -------------------


def py_lat_lon(url: str) -> tuple[float, float]:
    hexd = hashlib.sha256(url.encode("utf-8")).hexdigest()
    lat = -60.0 + (int(hexd[0:15], 16) % LAT_MOD) / 10_000.0
    lon = -180.0 + (int(hexd[15:30], 16) % LON_MOD) / 10_000.0
    return lat, lon


def py_lat_lon_from_id(i: int) -> tuple[float, float]:
    return (
        -60.0 + (i * KNUTH % LAT_MOD) / 10_000.0,
        -180.0 + (i * KNUTH2 % LON_MOD) / 10_000.0,
    )
