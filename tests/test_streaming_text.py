"""Streaming pipeline (file source -> windowed per-tile counts, checked
against the identical batch computation) and text-function unit tests."""

import pytest
from pyspark.sql import functions as F

from pygridmap_spark.functions import text as TX
from pygridmap_spark.sources import pages as P
from pygridmap_spark.streaming import pipeline as SP


def test_streaming_windowed_tile_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    pages = P.pages(spark, 2000)
    pages.write.parquet(src)

    stream = SP.read_pages_stream(spark, src, pages.schema)
    assert stream.isStreaming
    tiled = SP.tile_stream(stream, resolution=0.01, tile_size_cell=128, zoom=8)
    counts = SP.windowed_tile_counts(tiled, window="1 minute", watermark="2 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("append")  # watermark allows append with final windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT window.start AS wstart, xt, yt, n_pages, text_bytes FROM tile_counts"
    )
    batch = (
        SP.tile_stream(spark.read.parquet(src), resolution=0.01, tile_size_cell=128, zoom=8)
        .groupBy(F.window("warc_ts", "1 minute").getField("start").alias("wstart"), "xt", "yt")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum(F.length("text")).alias("text_bytes"))
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    # availableNow append-mode emits only watermark-closed windows; all
    # emitted rows must match the batch result, and most windows close
    assert g <= b
    assert len(g) >= 0.5 * len(b)


def test_sessionize_batch_matches_sql_reconstruction(spark):
    """session_window gap semantics == lag/cumsum reconstruction: touching
    windows merge (diff == gap merges), only diff > gap breaks; ties on ts
    merge."""
    rows = [
        # user 1: gaps 10 min merge; a gap of exactly 30 min ALSO merges
        # (touching windows); 30:01 breaks
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 00:20:00", 3.0),
        (1, "2024-01-01 00:50:00", 4.0),
        (1, "2024-01-01 01:20:01", 5.0),
        # user 2: tied timestamps merge; 29:59 gap merges (just under gap)
        (2, "2024-01-01 05:00:00", 1.0),
        (2, "2024-01-01 05:00:00", 1.0),
        (2, "2024-01-01 05:29:59", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = SP.sessionize(
        df, key="user_id", ts_col="ts", gap="30 minutes",
        extra_aggs=[F.sum("value").alias("sum_value")],
    )
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00", "2024-01-01 00:50:00", 4, 10.0),
        (1, "2024-01-01 01:20:01", "2024-01-01 01:20:01", 1, 5.0),
        (2, "2024-01-01 05:00:00", "2024-01-01 05:29:59", 3, 3.0),
    }


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """The SAME sessionize expression runs as a Structured-Streaming query
    (append mode + watermark); every emitted session must match the batch
    result exactly, and sessions well behind the watermark must close."""
    src = str(tmp_path / "events_src")
    # burst-shaped: per user, 5-event bursts 10 min apart with 2 h between
    # bursts -> clear sessions, and all but the last burst per user closes
    # behind the final watermark
    ev = (
        spark.range(500)
        .select(
            (F.col("id") % 7).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + F.floor(F.floor(F.col("id") / 7) / 5) * 7200
                + (F.floor(F.col("id") / 7) % 5) * 600
            ).alias("ts"),
            (F.col("id") % 13).cast("double").alias("value"),
        )
    )
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    sessions = SP.sessionize(
        stream, key="user_id", ts_col="ts", gap="30 minutes",
        watermark="1 minute",
        extra_aggs=[F.sum("value").alias("sum_value")],
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sessions_stream").collect()}
    batch = {
        tuple(r)
        for r in SP.sessionize(
            spark.read.parquet(src), key="user_id", ts_col="ts", gap="30 minutes",
            extra_aggs=[F.sum("value").alias("sum_value")],
        ).collect()
    }
    assert got <= batch
    assert len(got) >= 0.5 * len(batch)


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two words",), ("a  b\tc\nd",)], "text string"
    )
    got = [r[0] for r in df.select(TX.token_count(F.col("text"))).collect()]
    assert got == [0, 0, 1, 2, 4]


def test_lang_id_basic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is of no concern to me",),
            ("der hund und die katze ist nicht da",),
            ("le chat est dans la maison avec les autres",),
            ("xyzzy qwerty 12345",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(TX.lang_id(F.col("text"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [("",), ("the and of to is " * 30,), ("!!!###$$$",)], "text string"
    )
    got = [r[0] for r in df.select(TX.quality_score(F.col("text"))).collect()]
    assert all(0.0 <= v <= 1.0 for v in got)
    assert got[1] > got[2]  # stopword-rich english beats symbol soup


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "HELLO ... WORLD")],
        "id long, text string",
    )
    fps = [r[0] for r in df.select(TX.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(TX.word_shingles(F.col("text"), 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world! it's 42",)], "text string")
    n = df.select(TX.bpe_ish_token_count(F.col("text"))).collect()[0][0]
    assert n >= 7  # hello , world ! it ' s 42


def test_vectors_cosine(spark):
    from pygridmap_spark.functions import vectors as V

    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(V.cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == 0.0  # zero-vector guard
    l2 = [r[0] for r in df.select(V.l2_distance(F.col("a"), F.col("b"))).collect()]
    assert l2[1] == pytest.approx(2**0.5)
    u = [r[0] for r in df.select(V.unit(F.col("a"))).collect()]
    assert u[0] == pytest.approx([1.0, 0.0])
    assert u[2] == [0.0, 0.0]  # zero vector passes through, no div-by-zero
    u2 = df.select(V.unit(F.array(F.lit(3.0), F.lit(4.0)))).first()[0]
    assert u2 == pytest.approx([0.6, 0.8])


def test_stateful_url_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: duplicated urls emit exactly once."""
    src = str(tmp_path / "dup_src")
    pages = P.pages(spark, 300)
    dup = pages.limit(100)
    pages.unionByName(dup).repartition(4).write.parquet(src)

    stream = SP.read_pages_stream(spark, src, pages.schema)
    deduped = SP.stateful_url_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT url, count(*) c FROM dedup_out GROUP BY url")
    assert got.count() == 300
    assert got.filter("c > 1").count() == 0


def test_stateful_url_dedup_with_ttl(spark, tmp_path):
    """TTL variant still dedups within the window (state eviction only
    fires on idle keys; the dedup semantics inside the window are
    unchanged)."""
    src = str(tmp_path / "ttl_src")
    pages = P.pages(spark, 120)
    pages.unionByName(pages.limit(40)).repartition(4).write.parquet(src)

    stream = SP.read_pages_stream(spark, src, pages.schema)
    deduped = SP.stateful_url_dedup(stream, ttl_minutes=10)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_ttl_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT url, count(*) c FROM dedup_ttl_out GROUP BY url")
    assert got.count() == 120
    assert got.filter("c > 1").count() == 0


def test_stateful_url_dedup_event_time_ttl(spark, tmp_path):
    """Replay-safe TTL (round-3): the dedup window follows EVENT time via
    the watermark, not arrival time. A key whose last event is older than
    TTL when the watermark passes is evicted and re-emits; a key refreshed
    within the event-time window stays suppressed — regardless of how fast
    the backfill replays. Out-of-order rows inside a batch are covered by
    the watermark delay contract."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType, StructField, StringType, TimestampType

    src = str(tmp_path / "evt_src")
    os.makedirs(src)
    T = lambda s: pd.Timestamp(f"2026-01-01 {s}")  # noqa: E731

    files = [
        # f1: first sightings
        [("A", T("10:00")), ("B", T("10:00"))],
        # f2: A recrawled within the window (suppressed, extends A's TTL);
        # D new; max event time pushes the watermark to 12:00
        [("A", T("11:50")), ("D", T("12:00"))],
        # f3: B idle and its event-time TTL (10:00 + 1h) < watermark ->
        # evicted during this batch; A re-seen (still alive: 11:50+1h)
        [("A", T("12:10")), ("E", T("12:30"))],
        # f4: B reappears after eviction -> re-emitted; A still alive
        [("B", T("12:40")), ("A", T("12:45"))],
    ]
    for i, rows in enumerate(files):
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        p = os.path.join(src, f"f{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    schema = StructType(
        [StructField("url", StringType()), StructField("warc_ts", TimestampType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    deduped = SP.stateful_url_dedup(
        stream, ttl_minutes=60, ttl_clock="event", watermark="0 seconds"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("evt_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "evt_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["url"], str(r["warc_ts"]))
        for r in spark.sql("SELECT url, warc_ts FROM evt_dedup_out").collect()
    }
    want = {
        ("A", "2026-01-01 10:00:00"),  # first A only — recrawls in-window
        ("B", "2026-01-01 10:00:00"),  # first B
        ("B", "2026-01-01 12:40:00"),  # B re-emitted after event-TTL eviction
        ("D", "2026-01-01 12:00:00"),
        ("E", "2026-01-01 12:30:00"),
    }
    assert got == want
    with pytest.raises(ValueError, match="ttl_clock"):
        SP.stateful_url_dedup(stream, ttl_minutes=60, ttl_clock="bogus")


def test_term_frequencies(spark):
    from pygridmap_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple!")],
        "doc_id long, text string",
    )
    got = {r.term: (r.tf, r.df) for r in TS.term_frequencies(docs).collect()}
    assert got == {"apple": (3, 2), "banana": (2, 2), "cherry": (1, 1)}
    top1 = TS.term_frequencies(docs, top_k=1).collect()
    assert [(r.term, r.tf) for r in top1] == [("apple", 3)]


def test_sessionize_streaming_late_events_against_watermark(spark, tmp_path):
    """Multi-batch replay with late + out-of-order events (the append-mode
    emission timing that matters at scale): an event later than its
    session but INSIDE the watermark merges into the open session before
    it closes; an event behind the watermark is dropped and must neither
    reopen nor distort the already-emitted session. The emitted set must
    equal the batch twin over the in-watermark events, minus still-open
    sessions."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructField, StructType, StringType, TimestampType

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    T = lambda s: pd.Timestamp(f"2026-01-01 {s}")  # noqa: E731
    files = [
        # f1: open sessions for U and V; watermark after f1 = 10:10-20m
        [("U", T("10:00")), ("U", T("10:10")), ("V", T("10:00"))],
        # f2: U 10:05 is LATE but inside the watermark (09:50) -> must
        # merge into U's open session; W advances the clock (wm -> 11:10)
        [("U", T("10:05")), ("W", T("11:30"))],
        # f3: runs at wm 11:10 -> U and V sessions close and emit at the
        # end of this batch; X advances the clock (wm -> 12:40)
        [("W", T("11:40")), ("X", T("13:00"))],
        # f4: V 10:20 arrives AFTER V's session was evicted -> dropped
        # (must neither re-open nor re-emit V); Y pushes the final
        # watermark to 13:40 so W and X close; Y itself stays open
        # (window end 14:30 > 13:40), never emitted
        [("V", T("10:20")), ("Y", T("14:00"))],
    ]
    for i, rows in enumerate(files):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        p = os.path.join(src, f"f{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    schema = StructType([StructField("user_id", StringType()), StructField("ts", TimestampType())])
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    sessions = SP.sessionize(
        stream, key="user_id", ts_col="ts", gap="30 minutes", watermark="20 minutes"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM late_sessions").collect()
    }
    want = {
        # late 10:05 merged -> 3 events, bounds unchanged
        ("U", "2026-01-01 10:00:00", "2026-01-01 10:10:00", 3),
        # too-late 10:20 dropped -> single-event session, NOT (10:00,10:20,2)
        ("V", "2026-01-01 10:00:00", "2026-01-01 10:00:00", 1),
        ("W", "2026-01-01 11:30:00", "2026-01-01 11:40:00", 2),
        ("X", "2026-01-01 13:00:00", "2026-01-01 13:00:00", 1),
        # Y: still open behind the final watermark -> never emitted
    }
    assert got == want
    # batch twin over the in-watermark events (all minus the dropped late
    # row), restricted to closed sessions == the streaming emission
    in_watermark = [
        (u, t.to_pydatetime()) for f in files for (u, t) in f if (u, t) != ("V", T("10:20"))
    ]
    batch = SP.sessionize(
        spark.createDataFrame(in_watermark, schema),
        key="user_id", ts_col="ts", gap="30 minutes",
    )
    batch_closed = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in batch.collect()
        if r.user_id != "Y"
    }
    assert got == batch_closed


def test_sessionize_streaming_state_stays_bounded_at_volume(spark, tmp_path):
    """Many-batch volume run pinning that watermark eviction keeps the
    session state store BOUNDED: 24 micro-batches x 500 events over 50
    keys, each batch 2h later in event time (gap 30m, watermark 20m), so
    every batch's sessions close as the next arrives. numRowsTotal must
    plateau at ~open sessions (eviction lags one micro-batch), never grow
    with cumulative events — the 100-TB contract for an unbounded stream."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructField, StructType, StringType, TimestampType

    n_batches, n_keys, per_batch = 24, 50, 500
    src = str(tmp_path / "vol_src")
    os.makedirs(src)
    base = pd.Timestamp("2026-01-01 00:00:00")
    for b in range(n_batches):
        t0 = base + pd.Timedelta(hours=2 * b)
        keys = [f"u{i % n_keys}" for i in range(per_batch)]
        # events spread over 10 minutes (single session per key per batch)
        ts = [t0 + pd.Timedelta(seconds=(i * 7) % 600) for i in range(per_batch)]
        tbl = pa.table(
            {
                "user_id": pa.array(keys, pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
        p = os.path.join(src, f"b{b:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + b * 10, 1_700_000_000 + b * 10))

    schema = StructType(
        [StructField("user_id", StringType()), StructField("ts", TimestampType())]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    sessions = SP.sessionize(
        stream, key="user_id", ts_col="ts", gap="30 minutes", watermark="20 minutes"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("vol_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "vol_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators") and p["numInputRows"] > 0
    ]
    assert len(state_rows) >= n_batches - 1
    # bounded: open sessions (<= n_keys) + one batch of eviction lag —
    # never the cumulative 12 000 events / ~1 150 closed sessions
    assert max(state_rows) <= 3 * n_keys, state_rows
    # and the plateau really is a plateau, not a ramp: the last batches
    # hold the same bound as the early ones
    assert max(state_rows[-5:]) <= 3 * n_keys
    # emission completeness: all but the final (still-open) generation
    n_emitted = spark.sql("SELECT count(*) n FROM vol_sessions").collect()[0]["n"]
    assert n_emitted == (n_batches - 1) * n_keys


def test_stateful_hop_distance_matches_batch_twin(spark, tmp_path):
    """Streaming hop distance == operators.trajectories.with_hop_distance
    when the stream replays in order: cross-batch state carries the last
    position, so per-row hops are identical to the batch lag window."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    from pygridmap_spark.operators import trajectories as TJ

    src = str(tmp_path / "hop_src")
    os.makedirs(src)
    T = lambda m: pd.Timestamp("2026-01-01 10:00") + pd.Timedelta(minutes=m)  # noqa: E731
    # 3 users x 6 pings split across 3 files (2 pings/user/file), strictly
    # increasing ts -> every cross-file hop exercises the carried state
    rows_all = []
    for k in range(6):
        for u in range(3):
            rows_all.append((u * 100 + k, u, T(k * 7 + u), -100.0 + u * 31 + k * 7.3, -50.0 + u * 17 + k * 5.1))
    files = [rows_all[0:6], rows_all[6:12], rows_all[12:18]]
    for i, rows in enumerate(files):
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "lon": pa.array([r[3] for r in rows], pa.float64()),
            "lat": pa.array([r[4] for r in rows], pa.float64()),
        })
        p = os.path.join(src, f"f{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    schema = StructType([
        StructField("event_id", LongType()), StructField("user_id", LongType()),
        StructField("ts", TimestampType()), StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ])
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    hops = SP.stateful_hop_distance(stream)
    q = (
        hops.writeStream.format("memory")
        .queryName("hop_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_id: (None if r.hop_m is None else round(r.hop_m, 6))
        for r in spark.sql("SELECT * FROM hop_out").collect()
    }
    batch = TJ.with_hop_distance(
        spark.createDataFrame(
            [(r[0], r[1], r[2].to_pydatetime(), r[3], r[4]) for r in rows_all], schema
        )
    )
    want = {
        r.event_id: (None if r.hop_m is None else round(r.hop_m, 6))
        for r in batch.collect()
    }
    assert got == want  # 18 rows, 3 null first hops, 15 exact matches
    assert sum(v is None for v in got.values()) == 3


def test_stateful_hop_distance_late_event_null_no_state_regression(spark, tmp_path):
    """A ping arriving in a later batch with event time BEHIND the state:
    emitted with NULL hop, and the NEXT in-order ping still chains from
    the pre-late state position (no regression, no negative-time hop)."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    from pygridmap_spark.functions import geodesy as GD  # noqa: F401 (doc)

    src = str(tmp_path / "late_hop_src")
    os.makedirs(src)
    T = lambda m: pd.Timestamp("2026-01-01 10:00") + pd.Timedelta(minutes=m)  # noqa: E731
    files = [
        [(0, 1, T(0), 0.0, 0.0), (1, 1, T(10), 1.0, 0.0)],   # state -> (1.0, 0.0)
        [(2, 1, T(5), 50.0, 50.0)],                            # LATE: behind state
        [(3, 1, T(20), 2.0, 0.0)],                             # chains from (1.0, 0.0)
    ]
    for i, rows in enumerate(files):
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "lon": pa.array([r[3] for r in rows], pa.float64()),
            "lat": pa.array([r[4] for r in rows], pa.float64()),
        })
        p = os.path.join(src, f"f{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    schema = StructType([
        StructField("event_id", LongType()), StructField("user_id", LongType()),
        StructField("ts", TimestampType()), StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ])
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        SP.stateful_hop_distance(stream).writeStream.format("memory")
        .queryName("late_hop_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_hop_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.event_id: r.hop_m for r in spark.sql("SELECT * FROM late_hop_out").collect()}
    assert got[0] is None                     # first ping ever
    assert abs(got[1] - 111195.0) < 200       # 1 deg at the equator
    assert got[2] is None                     # late: null, never negative-time
    # event 3 chains from (1.0, 0.0), NOT from the late (50, 50) position
    assert abs(got[3] - 111195.0) < 200


def test_stateful_hop_distance_state_tracks_entities_not_events(spark, tmp_path):
    """Scale contract: state rows == DISTINCT entities (24 bytes each),
    flat across batches, while cumulative events grow linearly — the
    store is bounded by the active-user set, never the ping volume."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    src = str(tmp_path / "vol_hop_src")
    os.makedirs(src)
    n_users, per_batch, n_batches = 150, 600, 8
    t0 = pd.Timestamp("2026-01-01 00:00")
    eid = 0
    for b in range(n_batches):
        rows = []
        for j in range(per_batch):
            u = (b * per_batch + j) % n_users
            rows.append((eid, u, t0 + pd.Timedelta(seconds=eid),
                         -100.0 + (u * 13 + b) % 200, -50.0 + (u * 7 + b) % 100))
            eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "lon": pa.array([r[3] for r in rows], pa.float64()),
            "lat": pa.array([r[4] for r in rows], pa.float64()),
        })
        p = os.path.join(src, f"f{b}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + b * 10, 1_700_000_000 + b * 10))

    schema = StructType([
        StructField("event_id", LongType()), StructField("user_id", LongType()),
        StructField("ts", TimestampType()), StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ])
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        SP.stateful_hop_distance(stream).writeStream.format("memory")
        .queryName("vol_hop_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "vol_hop_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators") and p["numInputRows"] > 0
    ]
    assert totals, "no state metrics captured"
    # plateau at the entity count from the first batch on (every batch
    # touches all 150 users), NEVER growing with cumulative events
    assert max(totals) == n_users, totals
    assert totals[-1] == n_users
    out = spark.sql("SELECT count(*) c, count(hop_m) h FROM vol_hop_out").collect()[0]
    assert out["c"] == n_users * (per_batch // n_users) * n_batches
    assert out["h"] == out["c"] - n_users  # one null first-hop per entity
