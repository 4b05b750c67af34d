"""Snapshot diff — change detection between two versions of a keyed
table (the SCD/merge-upsert primitive every lakehouse pipeline needs:
which rows appeared, vanished, or changed between yesterday's dimension
snapshot and today's).

One full-outer join on the keys (null-safe — a NULL key is a legal SCD
key value, not a non-match) plus per-side row fingerprints; no window,
no sort, no Python. The fingerprint is md5 over unit-separator-joined
string casts — md5 and concat_ws exist in both Spark and DuckDB, the
engine-wide oracle-checkable-hash idiom.

Contracts:

- Compared columns are fingerprinted via CAST(... AS STRING). Integer/
  string/date casts render identically across engines; FLOAT columns do
  NOT reliably (engine-specific shortest-round-trip formatting) — pre-
  format floats to fixed-point strings upstream if they participate.
- NULL column values hash via the reserved RS-framed sentinel
  ``'\\x1enull\\x1e'`` (unrepresentable in normal data by convention,
  same discipline as operators/sampling); the field separator is the
  unit separator ``'\\x1f'``.
- Duplicate keys within a snapshot are a caller bug (the join would
  fan out); `snapshot_diff` does not dedup for you.

Scale shape at 100 TB: the single exchange is the outer join on the
key — both sides shuffle once, AQE handles skewed keys; with both
snapshots bucketed/clustered by the key the join co-locates and the op
is scan-bound. ``keep_unchanged=False`` (default) filters the
overwhelmingly-common no-change rows BEFORE anything downstream sees
them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x1enull\x1e"
FIELD_SEP = "\x1f"


def row_fingerprint(cols: list[str]):
    """md5 fingerprint column over ``cols`` (string casts, RS-framed
    NULL sentinel, US separator) — restateable verbatim in DuckDB."""
    return F.md5(
        F.concat_ws(
            FIELD_SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
                for c in cols
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots of a keyed table: one row per key present in
    either side, ``(*keys, change_type, old_fp, new_fp)`` with
    ``change_type`` in {'insert', 'delete', 'update'} (+ 'unchanged'
    when ``keep_unchanged``). ``compare_cols`` defaults to every shared
    non-key column. Fingerprints are NULL on the missing side."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}__") for k in keys],
        row_fingerprint(compare_cols).alias("old_fp"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}__") for k in keys],
        row_fingerprint(compare_cols).alias("new_fp"),
    )
    cond = [
        o[f"__ko_{k}__"].eqNullSafe(n[f"__kn_{k}__"]) for k in keys
    ]
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("insert"))
        .when(F.col("new_fp").isNull(), F.lit("delete"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__ko_{k}__"), F.col(f"__kn_{k}__")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
        "old_fp",
        "new_fp",
    )
    if not keep_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
