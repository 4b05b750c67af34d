"""Streaming contact join (streaming/contacts.contact_events_stream):
the watermarked stream-stream self-join must produce EXACTLY the batch
operator's contact events on the same corpus (availableNow replay), plus
the batch-frame guard. The late-data contract (pings behind the
watermark lose contacts silently) is inherent to streaming inner joins
and documented in the module docstring.
"""

from pygridmap_spark.operators import trajectories as TJ
from pygridmap_spark.streaming import contacts as SC

from tests.test_contact_pairs import _cloud, _pings


def _full_rows(df_rows):
    """Multiset of FULL event rows (rounded dist) — catches duplicate
    emissions and wrong field values, not just pair membership."""
    import collections

    return collections.Counter(
        (r["ping_a"], r["ping_b"], r["user_a"], r["user_b"],
         str(r["ts_a"]), str(r["ts_b"]), str(r["contact_ts"]),
         round(r["dist_m"], 6))
        for r in df_rows
    )


def test_stream_matches_batch_events(spark, tmp_path):
    rows = [(r[0], r[1], r[2], r[3], r[4]) for r in _cloud(n=300)]
    src = str(tmp_path / "pings_src")
    batch_df = _pings(spark, rows)
    batch_df.write.parquet(src)

    radius, window = 20_000.0, 900.0
    batch = _full_rows(
        TJ.contact_events(spark.read.parquet(src), radius, window).collect()
    )
    assert batch, "fixture must produce contacts"

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    ev = SC.contact_events_stream(stream, radius, window, watermark="10 minutes")
    q = (
        ev.writeStream.format("memory")
        .queryName("contact_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _full_rows(spark.sql("SELECT * FROM contact_events").collect())
    assert got == batch  # full-row MULTISET equality: no dupes, all fields


def test_stream_multi_batch_state_survives_within_watermark(spark, tmp_path):
    # 4 files processed one per micro-batch: the stream-stream join state
    # must survive ACROSS batches long enough (watermark >= window) that
    # cross-batch contacts are found; emitted rows must stay a sub-multiset
    # of batch (late-eviction can only LOSE, never fabricate/duplicate)
    import time

    rows = sorted(
        ((r[0], r[1], r[2], r[3], r[4]) for r in _cloud(n=300)),
        key=lambda t: t[2],
    )
    src = str(tmp_path / "pings_multi")
    # four TIME-ORDERED chunks written sequentially: the file source
    # processes files in modification-time order, so event time advances
    # monotonically batch to batch (an out-of-order chunk would arrive
    # BEHIND the watermark and be dropped wholesale — the documented
    # late-data contract, exercised separately below)
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk:(i + 1) * chunk]
        _pings(spark, part).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    radius, window = 20_000.0, 900.0
    batch_df = _pings(spark, rows)
    batch = _full_rows(
        TJ.contact_events(spark.read.parquet(src), radius, window).collect()
    )
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermark (30 min) > contact window (15 min): a boundary ping's
    # partners from the PREVIOUS batch are still in join state when it
    # arrives, so cross-batch contacts must all be found
    ev = SC.contact_events_stream(stream, radius, window, watermark="30 minutes")
    q = (
        ev.writeStream.format("memory")
        .queryName("contact_events_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    progress = [p for p in q.recentProgress if p]
    got = _full_rows(spark.sql("SELECT * FROM contact_events_mb").collect())
    assert len(progress) >= 4, "expected one micro-batch per file"
    assert got == batch  # cross-batch contacts all recovered, no dupes


def test_batch_frame_rejected(spark):
    import pytest

    df = _pings(spark, [(0, 1, "2024-01-01 00:00:00", 0.0, 0.0)])
    with pytest.raises(ValueError, match="batch DataFrame"):
        SC.contact_events_stream(df, 100.0, 60.0)
