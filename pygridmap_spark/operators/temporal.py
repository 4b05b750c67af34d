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


def bucket_bars(
    df: DataFrame,
    bucket_seconds: int,
    ts_col: str = "ts",
    value_col: str = "value",
    by: list[str] | tuple[str, ...] = (),
    tie_col: str | None = None,
    sum_scale: int = 10**6,
) -> DataFrame:
    """Time-bucket bars — the generic telemetry/series rollup (OHLC in
    market terms): per (``by``, bucket) the FIRST and LAST value by
    event time plus min/max/count and a fixed-point sum. Output:
    ``(*by, bucket_start, n, open, high, low, close, sum_scaled)`` with
    ``bucket_start`` in epoch seconds.

    Determinism contract: first/last pick by (unix_micros, ``tie_col``)
    — pass a unique id when timestamps can collide, or the pick is
    engine/partitioning-dependent. ``sum_scaled`` is
    sum(floor(value * sum_scale)) as int64 — the float sum of a
    distributed engine is reduction-order-dependent, the fixed-point
    sum is exact and hash-gateable (the repo-wide exact-accumulation
    discipline); min/max/count are order-free already.

    Scale shape: ONE partial-aggregated shuffle keyed on (*by, bucket)
    — min_by/max_by/min/max/sum all map-side combine, so the exchange
    carries one row per live bucket per task regardless of corpus size.
    """
    # events land as TIMESTAMP_NTZ from parquet; the cast is
    # instant-preserving under the repo-wide UTC session (session.py)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = (
        F.struct(us.alias("u"), F.col(tie_col).alias("t"))
        if tie_col
        else us
    )
    bucket = F.expr(
        f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
        f" DIV {int(bucket_seconds) * 1_000_000}"
    )
    v = F.col(value_col)
    return (
        df.select(
            *by,
            (bucket * F.lit(int(bucket_seconds))).alias("bucket_start"),
            order.alias("__o__"),
            v.alias("__v__"),
        )
        .groupBy(*by, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("__v__", "__o__").alias("open"),
            F.max("__v__").alias("high"),
            F.min("__v__").alias("low"),
            F.max_by("__v__", "__o__").alias("close"),
            F.sum(
                F.floor(F.col("__v__") * F.lit(int(sum_scale))).cast("long")
            ).alias("sum_scaled"),
        )
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each user, did events of type
    ``steps[0]`` then ``steps[1]`` then ... occur in strictly
    increasing event time (optionally all within ``within_seconds`` of
    the step-0 time)? Returns one row per step:
    ``(step_idx, step, n_users)`` — the classic conversion readout.

    Semantics: the step-k time is the EARLIEST event of that type
    strictly after the user's step-(k-1) time (the greedy matching,
    which maximizes conversions for strict-order funnels); duplicate
    event types re-use is impossible because time strictly increases.

    Scale shape: step k is one filtered partial-aggregated min per user
    joined to the step-(k-1) user frame — both sides SHRINK
    monotonically (conversions only lose users), and the join key is
    the user id, so AQE broadcasts the later stages as the funnel
    narrows. No window over the raw event stream, no per-user
    collect_list. The k one-row count branches share the chain prefix
    lazily (recompute factor bounded by k, over frames that shrink at
    every step — persist the event frame upstream if the scan
    dominates)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us__")
    ev = df.select(
        F.col(user_col).alias("__u__"),
        F.col(type_col).alias("__t__"),
        us,
    )
    cur = (
        ev.filter(F.col("__t__") == steps[0])
        .groupBy("__u__")
        .agg(F.min("__us__").alias("t0"))
    )
    frames = [cur]
    prev_t = "t0"
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("__t__") == s)
            .join(cur, "__u__")
            .filter(F.col("__us__") > F.col(prev_t))
        )
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("__us__") - F.col("t0")
                <= F.lit(int(within_seconds) * 1_000_000)
            )
        cur = nxt.groupBy("__u__", "t0").agg(
            F.min("__us__").alias(f"t{i}")
        )
        frames.append(cur)
        prev_t = f"t{i}"
    rows = [
        fr.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col("n_users"),
        )
        for i, (s, fr) in enumerate(zip(steps, frames))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: list[str] | tuple[str, ...] = ("user_id",),
    value_scale: int = 10**6,
    tie_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per entity — the irregular-series mean
    (kdb/TimescaleDB `time_weight` semantics, last-observation-carried-
    forward): each observation's value holds until the next one, so

        twap = sum_i v_i * (t_{i+1} - t_i) / (t_last - t_first)

    over the entity's own observation span (the final observation
    carries no weight; entities with one event yield NULL — no span).
    Output: ``(*by, n, span_us, twap)``.

    Determinism contract: the weighted sum accumulates
    floor(v * value_scale) * dt_us in decimal(38,0) — exact integers,
    order-free, engine-identical (the fixed-point discipline from
    bucket_bars); twap is ONE pinned division of two exact casts.
    Duplicate timestamps within an entity contribute zero-width
    intervals (dt = 0), matching the step-function semantics — but the
    LAST row of a tie group carries the following gap, so pass a unique
    ``tie_col`` when timestamps can collide or that carrier (and the
    twap) is order-dependent.

    Scale shape: one window exchange on the entity key (lead over
    (entity, ts)) + one partial-aggregated sum on the same
    partitioning — Catalyst reuses the exchange, so the operator costs
    a single shuffle end-to-end."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [us, F.col(tie_col)] if tie_col else [us]
    w = Window.partitionBy(*by).orderBy(*order)
    nxt = F.lead(us).over(w)
    vfp = F.floor(F.col(value_col) * F.lit(int(value_scale))).cast("long")
    seg = df.select(
        *by,
        us.alias("__t__"),
        (nxt - us).alias("__dt__"),
        vfp.alias("__v__"),
    )
    num = F.sum(
        F.when(
            F.col("__dt__").isNotNull(),
            F.col("__v__").cast("decimal(19,0)")
            * F.col("__dt__").cast("decimal(19,0)"),
        )
    )
    out = seg.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("__t__") - F.min("__t__")).alias("span_us"),
        num.alias("__num__"),
    )
    # int128-split double cast: C++ engines (DuckDB HUGEINT among them)
    # convert a 128-bit accumulator to double as
    #     double(num >> 64) * 2^64 + double(num & (2^64 - 1))
    # which is NOT correctly rounded once |num| > 2^53 — while Spark's
    # decimal->double cast IS. Past ~9e15 the two casts differ by 1 ulp on
    # a fraction of groups (measured: 13/15 users at sf0.001), so the
    # pinned-division contract must restate the split form. Both halves
    # and both IEEE ops below are engine-identical: upper fits int64
    # (|num| < 10^38 => |upper| < 5.5e18), lower is an exact 20-digit
    # decimal, and *2^64 is a power-of-two scale (exact).
    two64 = F.expr("CAST('18446744073709551616' AS DECIMAL(20,0))")  # 2^64
    lower = F.pmod(F.col("__num__"), two64)
    upper = (F.col("__num__") - lower) / two64
    num_d = (
        upper.cast("long").cast("double") * F.lit(float(2**64))
        + lower.cast("double")
    )
    twap = num_d / (F.col("span_us").cast("double") * F.lit(float(value_scale)))
    return out.select(
        *by,
        "n",
        "span_us",
        F.when(F.col("span_us") > 0, twap).alias("twap"),
    )


def rolling_zscore(
    df: DataFrame,
    n: int,
    value_col: str = "value",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str | None = None,
    min_periods: int | None = None,
    scale: int = 1_000_000,
    z_col: str = "z",
) -> DataFrame:
    """Per-entity rolling anomaly score: for each event, the z-score of
    its value against the trailing ``n``-event window (itself included)
    in (``ts_col``, ``tie_col``) order — the streaming-metrics outlier
    primitive (spike/drop detection on request rates, purchase values,
    sensor feeds).

    Exact-arithmetic discipline (the twap/kde form): values pin to
    fixed-point ``floor(v*scale + 0.5)`` int64 FIRST, window sum and
    sum-of-squares accumulate as decimal(38,0) of those integers (exact,
    order-free — a float window sum differs between engines), and mean /
    variance / z are ONE pinned IEEE expression chain over the exact
    operands: ``var = (ssq - s*s/c)/c``, ``z = (v - mean)/sqrt(var)``
    (fixed-point units throughout — z is scale-invariant so the result
    is in value units regardless). The textbook cancellation caveat on
    that variance form affects accuracy, never cross-engine determinism
    — both engines round the identical operations identically.

    NULL/NaN-valued rows are DROPPED from the output entirely (the
    filter happens before the window, so they are absent, not emitted
    with NULL z — callers joining back on an event id must expect the
    loss; left-join this output to the input to restore them).
    Windows with fewer than ``min_periods`` events (default: ``n``) or
    zero variance (constant window) yield NULL z. Overflow bound:
    |v|*scale must fit int64 (|v| < 9.2e12 at the default scale).

    One window exchange on the entity key — the same partitioning every
    other per-entity temporal operator here reuses.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    mp = n if min_periods is None else int(min_periods)
    if not 1 <= mp <= n:
        raise ValueError(f"min_periods must be in [1, n], got {mp}")
    v = F.col(value_col)
    is_float = df.schema[value_col].dataType.typeName() in ("double", "float")
    clean = df.filter(v.isNotNull() & ~F.isnan(v) if is_float else v.isNotNull())
    vfp = F.floor(v.cast("double") * F.lit(float(scale)) + F.lit(0.5))
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order)
        .rowsBetween(-(n - 1), 0)
    )
    d38 = "decimal(38,0)"
    base = clean.withColumn("__vfp__", vfp)
    s = F.sum(F.col("__vfp__").cast(d38)).over(w)
    ssq = F.sum(
        (F.col("__vfp__").cast(d38) * F.col("__vfp__").cast(d38))
    ).over(w)
    c = F.count(F.lit(1)).over(w)
    stats = base.withColumns(
        {"__s__": s, "__q__": ssq, "__c__": c}
    )
    sd_ = F.col("__s__").cast("double")
    qd = F.col("__q__").cast("double")
    cd = F.col("__c__").cast("double")
    mean = sd_ / cd
    var = (qd - sd_ * sd_ / cd) / cd
    z = (F.col("__vfp__").cast("double") - mean) / F.sqrt(var)
    out = stats.withColumn(
        z_col,
        F.when((F.col("__c__") >= F.lit(mp)) & (var > F.lit(0.0)), z),
    )
    return out.drop("__vfp__", "__s__", "__q__", "__c__")
