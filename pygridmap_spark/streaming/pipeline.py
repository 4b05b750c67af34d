"""Streaming ingestion: pages stream -> geolocate -> tile-assign -> windowed
per-tile counts. The reference is batch-only (SURVEY §1.2 'no streaming');
this is the engine's Structured-Streaming face for continuous crawl
ingestion — the same Catalyst expressions as the batch path (geolocate /
cellindex / tiling are plain column functions, so batch and streaming share
one code path), plus event-time watermarking on warc_ts for late pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pygridmap_spark.functions import cellindex, geolocate, tiling


def tile_stream(
    pages_stream: DataFrame,
    resolution: float,
    tile_size_cell: int = 128,
    zoom: int = 8,
) -> DataFrame:
    """Transform a streaming pages DataFrame: geolocate, cell-index,
    tile-assign. Stateless — identical to the batch projection."""
    df = geolocate.with_geolocation(pages_stream)
    df = cellindex.with_cell_index(df, zoom)
    return tiling.with_tile_assignment(
        df, resolution, tile_size_cell, x="lon", y="lat"
    )


def windowed_tile_counts(
    tiled_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed per-tile page counts with a watermark for late
    data — the streaming twin of the flagship per-tile histogram."""
    return (
        tiled_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("xt"), F.col("yt"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("text_bytes"),
        )
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
    extra_aggs: list | None = None,
) -> DataFrame:
    """Gap-based sessionization via ``F.session_window`` — the crawl/user
    sessionization stage of a web-scale event pipeline (burst detection,
    per-host crawl sessions, user activity spans). Two consecutive events of
    the same ``key`` belong to one session iff their gap is at most ``gap``
    (touching windows merge: diff == gap still merges; only diff > gap
    starts a new session).

    Batch AND streaming: ``session_window`` is a native Catalyst operator
    (Spark >= 3.2), so the same expression serves both; pass ``watermark``
    for streaming append-mode output. At 100-TB scale this is one shuffle
    keyed on (key, merged-window) with partial aggregation — no window
    function over the full event history, no per-key sort on the driver.

    Output: ``key, session_start, session_end, n_events`` (+ any
    ``extra_aggs``). ``session_end`` is the LAST EVENT time (max ts), not
    the gap-padded window end — replayable from plain SQL (lag/cumsum) for
    the oracle twin.

    Late events (streaming, measured on Spark 4 and pinned by test): an
    event behind the watermark still MERGES into its key's session while
    that session's state is in the store (eviction lags the watermark by
    one micro-batch), and is DROPPED once the session was evicted — it
    neither re-opens nor re-emits a closed session. So append-mode output
    is final, and the emitted set equals the batch twin over the
    surviving (non-dropped) events minus still-open sessions.

    Skew: a bot key whose events never pause longer than ``gap`` forms ONE
    session — a single reducer group. Counts/sums partial-aggregate, so
    the group's row volume is bounded by its pre-agg partials, but a
    pathological key set is better rate-limited or pre-filtered upstream
    (``plans.skew`` composes for the aggregation exchange itself).
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.max(ts_col).alias("session_end"),
    ]
    if extra_aggs:
        aggs += list(extra_aggs)
    out = df.groupBy(F.col(key), F.session_window(ts_col, gap)).agg(*aggs)
    extra_names = [c for c in out.columns if c not in (key, "session_window", "n_events", "session_end")]
    return out.select(
        key,
        F.col("session_window.start").alias("session_start"),
        "session_end",
        "n_events",
        *extra_names,
    )


def read_pages_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a pages directory (parquet)."""
    return spark.readStream.schema(schema).parquet(path)


def stateful_url_dedup(
    pages_stream: DataFrame,
    key: str = "url",
    ttl_minutes: int | None = None,
    ttl_clock: str = "processing",
    event_time_col: str = "warc_ts",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exactly-once URL dedup — a custom stateful operator via
    ``applyInPandasWithState`` (the recrawl-suppression stage of a
    continuous ingest): the first occurrence of each key is emitted, every
    later occurrence (same or later micro-batch) is dropped. State per key
    is one boolean + last-seen event time; at crawl scale the state store
    shards by the same hash partitioning as the shuffle.

    ``ttl_minutes`` bounds the state store: a key idle for that long is
    evicted, so state size tracks the ACTIVE url set instead of every url
    ever crawled — the unbounded default is wrong at 10^12-url scale.
    Documented tradeoff: a recrawl arriving after the TTL re-emits its url
    (dedup window = TTL, not forever); downstream exact dedup (batch)
    catches stragglers.

    ``ttl_clock`` picks which clock the TTL runs on:

    - ``'processing'``: idle-wall-clock eviction — right for live ingest.
    - ``'event'``: the timeout fires when the stream's WATERMARK passes
      last-seen-event-time + TTL. Replayed / backfilled streams (event
      time != arrival time) get a dedup window anchored to CRAWL time, so
      a backfill replayed at 100x speed dedups exactly as the live run
      would have. Requires a watermark on ``event_time_col`` — pass
      ``watermark=`` here or set ``withWatermark`` upstream.

    Checkpoint compatibility: round 3 changed the state schema from
    ``emitted boolean`` to ``last_event_ms long`` (the event clock needs
    the last-seen event time). A streaming query restarted from a
    checkpoint written by the old build fails with a state-schema
    incompatibility — start a fresh checkpoint (the dedup window restarts;
    downstream batch exact-dedup catches the overlap, same contract as a
    TTL expiry)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if ttl_minutes is not None and ttl_minutes <= 0:
        raise ValueError(f"ttl_minutes must be positive, got {ttl_minutes}")
    if ttl_clock not in ("processing", "event"):
        raise ValueError(f"ttl_clock must be 'processing' or 'event', got {ttl_clock!r}")
    ttl_ms = ttl_minutes * 60_000 if ttl_minutes is not None else None
    event_ttl = ttl_clock == "event" and ttl_ms is not None
    if watermark is not None:
        pages_stream = pages_stream.withWatermark(event_time_col, watermark)
    out_schema = pages_stream.schema

    def _dedup(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()  # idle key: evict, next occurrence re-emits
            return iter(())
        seen = state.exists
        (last_ms,) = state.get if seen else (0,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        merged = None
        if chunks:
            merged = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            if event_ttl:
                # event-time extraction ONLY on the event clock: it demands
                # a timestamp-typed column, and the other modes must not
                # inherit that requirement (warc_ts as epoch-long/string
                # sorts fine but has no .value)
                ts_max = pd.to_datetime(merged[event_time_col]).dropna().max()
                if ts_max is not pd.NaT:
                    last_ms = max(last_ms, int(ts_max.value // 1_000_000))
        state.update((last_ms,))
        if ttl_ms is not None:
            if event_ttl:
                # evict when the WATERMARK passes last event time + TTL —
                # replay-safe: the window follows crawl time, not arrival.
                # Guarded: a key whose every row is NaT has no event time
                # yet (last_ms 0 would be a 1970 timeout, rejected by Spark
                # as before-the-watermark)
                if last_ms > 0:
                    state.setTimeoutTimestamp(last_ms + ttl_ms)
            else:
                state.setTimeoutDuration(ttl_ms)  # sliding wall-clock
        if seen or not chunks:
            return iter(())
        # the group may span multiple Arrow chunks: take the earliest row
        # across ALL of them, not just the first non-empty chunk
        return iter([merged.sort_values(event_time_col).iloc[[0]]])

    if ttl_ms is None:
        timeout = GroupStateTimeout.NoTimeout
    elif event_ttl:
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return pages_stream.groupBy(key).applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType="last_event_ms long",
        outputMode="append",
        timeoutConf=timeout,
    )


def stateful_hop_distance(
    pings_stream: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    out_col: str = "hop_m",
    ttl_minutes: int | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming great-circle hop distance — the stateful twin of
    ``operators.trajectories.with_hop_distance`` via
    ``applyInPandasWithState``: each entity carries (last event time, last
    position) across micro-batches, so every arriving ping is emitted with
    the haversine meters from its predecessor (null on the entity's first
    ping ever), without re-reading history.

    Ordering contract: within a micro-batch the group's rows are processed
    in event-time order (out-of-order WITHIN a batch is handled exactly);
    across batches the state's clock only moves forward — a ping arriving
    in a later batch with an event time BEHIND the state (late beyond the
    micro-batch boundary) is emitted with a NULL hop and does not regress
    the state, never a fabricated negative-time hop. Pass ``watermark=``
    to also bound how late such stragglers can arrive. The batch operator
    is the exact-twin backfill for replays.

    ``ttl_minutes`` bounds the state store on the PROCESSING clock (an
    entity idle that long is evicted; its next ping restarts with a null
    hop) — the unbounded default is wrong at web scale for the same
    reason as ``stateful_url_dedup``.

    State per entity: 24 bytes (ms timestamp + lon + lat)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pygridmap_spark import util as _util
    from pygridmap_spark.functions.geodesy import EARTH_RADIUS_M

    if ttl_minutes is not None and ttl_minutes <= 0:
        raise ValueError(f"ttl_minutes must be positive, got {ttl_minutes}")
    if watermark is not None:
        pings_stream = pings_stream.withWatermark(ts_col, watermark)
    out_schema = _util.schema_with(pings_stream, f"{out_col} double")

    def _hav_m(plon, plat, clon, clat):
        p1, p2 = np.radians(plat), np.radians(clat)
        a = (
            np.sin((p2 - p1) / 2.0) ** 2
            + np.cos(p1) * np.cos(p2) * np.sin((np.radians(clon) - np.radians(plon)) / 2.0) ** 2
        )
        return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))

    def _hops(key_tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60_000)
            return iter(())
        merged = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        merged = merged.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        ts_ms = (pd.to_datetime(merged[ts_col]).astype("int64") // 1_000_000).to_numpy()
        lo = merged[lon].to_numpy(dtype=np.float64)
        la = merged[lat].to_numpy(dtype=np.float64)
        if state.exists:
            s_ms, s_lon, s_lat = state.get
        else:
            s_ms, s_lon, s_lat = None, np.nan, np.nan
        # stale prefix: event time behind the state's clock -> null hop,
        # no state regression (the rows it would chain from are already
        # emitted in earlier batches)
        fresh0 = 0 if s_ms is None else int(np.searchsorted(ts_ms, s_ms, side="left"))
        hops = np.full(len(merged), np.nan)
        if fresh0 < len(merged):
            plon = np.concatenate(([s_lon], lo[fresh0:-1]))
            plat = np.concatenate(([s_lat], la[fresh0:-1]))
            hops[fresh0:] = _hav_m(plon, plat, lo[fresh0:], la[fresh0:])
            state.update((int(ts_ms[-1]), float(lo[-1]), float(la[-1])))
        elif s_ms is not None:
            state.update((int(s_ms), float(s_lon), float(s_lat)))  # keep alive
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60_000)
        out = merged.copy()
        # SQL NULL (nullable Float64 maps NaN -> NA), never NaN — the
        # repo-wide Arrow kernel contract (NaN passes >= filters downstream)
        out[out_col] = pd.array(hops, dtype="Float64")
        return iter([out])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return pings_stream.groupBy(entity_col).applyInPandasWithState(
        _hops,
        outputStructType=out_schema,
        stateStructType="last_ms long, last_lon double, last_lat double",
        outputMode="append",
        timeoutConf=timeout,
    )
