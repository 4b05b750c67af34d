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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bin_width: int,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    by: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval-overlap join (closed intervals, numeric bounds): all
    (left, right) pairs with ``l_start <= r_end AND r_start <= l_end``,
    optionally equi-keyed by ``by``. This is the classic BINNED range
    join (the technique behind Databricks' range-join hints and genomics
    overlap joins, public): Spark's own planner would run the inequality
    predicate as a broadcast-nested-loop — quadratic; here both sides
    explode to the ``bin_width``-wide bins their interval covers and meet
    in an ordinary shuffled equi-join on (by, bin).

    De-duplication without a distinct: a qualifying pair co-occurs in
    every shared bin, so the join keeps only the FIRST overlap bin
    (``bin == floor(max(l_start, r_start) / bin_width)``) — each pair
    emitted exactly once, no post-shuffle dedup pass.

    ``bin_width`` is the scale knob: per-row explode cost is
    ``interval_length / bin_width + 1`` and per-bin join fan-in is the
    number of intervals alive in that bin — pick it near the typical
    interval length. Rows with NULL bounds or ``end < start`` vanish
    (an empty sequence explodes to nothing), matching the predicate.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    keys = [by] if by else []
    w = F.lit(int(bin_width))

    def binned(df, start, end, side):
        b0 = F.floor(F.col(start) / w).cast("long")
        b1 = F.floor(F.col(end) / w).cast("long")
        return df.withColumn(f"__bin{side}__", F.explode(F.sequence(b0, b1)))

    clash = [c for c in right.columns if c in left.columns and c not in keys]
    r = right
    for c in clash:
        r = r.withColumnRenamed(c, c + suffix)
    rs, re = (
        (r_start + suffix if r_start in clash else r_start),
        (r_end + suffix if r_end in clash else r_end),
    )
    lb = binned(left, l_start, l_end, "L")
    rb = binned(r, rs, re, "R")
    cond = [lb[k] == rb[k] for k in keys] + [
        lb["__binL__"] == rb["__binR__"],
        lb[l_start] <= rb[re],
        rb[rs] <= lb[l_end],
        lb["__binL__"]
        == F.floor(F.greatest(lb[l_start], rb[rs]) / w).cast("long"),
    ]
    out = lb.join(rb, cond, "inner")
    keep = (
        [lb[k] for k in keys]
        + [lb[c] for c in left.columns if c not in keys]
        + [rb[c] for c in r.columns if c not in keys]
    )
    return out.select(*keep)
