"""Temporal joins Spark lacks natively: the as-of join (pandas
merge_asof / kdb aj semantics).

For each left row, attach the most recent right row at-or-before its
timestamp within the same key (backward; inclusive), or the earliest
at-or-after (forward), optionally bounded by a tolerance. The webtext
use case is enrichment against slowly-changing sidecar feeds: page fetch
-> latest robots.txt snapshot for the host, ping -> latest profile
update, event -> prevailing config version.

Implementation is the union trick, NOT a range join:

1. tag both sides and union on the shared (key, ts) spine — right rows
   sort BEFORE left rows at equal timestamps, so an exact-timestamp
   right row is visible to the left row (inclusive semantics, matching
   merge_asof and DuckDB ASOF JOIN);
2. one window over (key, ts, side): ``last_value(right-payload struct,
   ignoreNulls)`` carries the prevailing right row forward;
3. keep left rows; a ``tolerance_s`` simply nulls the carried struct
   when it is too stale.

Cost: ONE exchange (the window sort on the key) over left+right —
against a range join's candidate blow-up or a per-key collect. The same
window partitioning is reusable by downstream per-key ops. Skewed keys
are window-partition skew: pre-split hot keys upstream (plans/skew) if a
single key's row count breaks task sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    tolerance_s: int | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` (default:
    everything but the keys) from the matched right row — renamed with
    ``suffix`` — and ``<on><suffix>`` (the matched right timestamp, NULL
    when nothing qualifies). ``direction='backward'`` matches the latest
    right row with ``r.on <= l.on`` (ties on the right's ``on`` broken by
    taking the last in (on, original column order) — give rows a unique
    ``on`` per key for fully deterministic payloads, as merge_asof also
    requires); ``'forward'`` the earliest with ``r.on >= l.on``.
    ``tolerance_s`` (seconds, inclusive) nulls matches further away."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    clash = set(right_cols) & set(left.columns)
    renames = {c: (c + suffix if c in clash else c) for c in right_cols}

    payload = F.struct(
        F.col(on).alias("__rts__"),
        *[F.col(c).alias(renames[c]) for c in right_cols],
    )
    r = right.select(
        F.col(by),
        F.col(on).alias("__t__"),
        F.lit(0).alias("__side__"),
        payload.alias("__p__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by,)],
    )
    l = left.select(
        F.col(by),
        F.col(on).alias("__t__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(r.schema["__p__"].dataType).alias("__p__"),
        *[F.col(c) for c in left.columns if c not in (by,)],
    )
    u = r.unionByName(l)
    if direction == "backward":
        order = [F.col("__t__").asc(), F.col("__side__").asc()]
    else:
        order = [F.col("__t__").desc(), F.col("__side__").asc()]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__p__", ignorenulls=True).over(w)
    out = (
        u.withColumn("__m__", carried)
        .filter(F.col("__side__") == 1)
    )
    if tolerance_s is not None:
        age = F.unix_timestamp(F.col("__t__")) - F.unix_timestamp(
            F.col("__m__.__rts__")
        )
        ok = (
            (age >= 0) & (age <= int(tolerance_s))
            if direction == "backward"
            else (age <= 0) & (-age <= int(tolerance_s))
        )
        out = out.withColumn("__m__", F.when(ok, F.col("__m__")))
    return out.select(
        F.col(by),
        *[F.col(c) for c in left.columns if c not in (by,)],
        F.col(f"__m__.__rts__").alias(on + suffix),
        *[F.col(f"__m__.{renames[c]}").alias(renames[c]) for c in right_cols],
    )
