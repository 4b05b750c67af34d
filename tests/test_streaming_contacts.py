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


def test_stream_matches_batch_events(spark, tmp_path):
    rows = [(r[0], r[1], r[2], r[3], r[4]) for r in _cloud(n=300)]
    src = str(tmp_path / "pings_src")
    batch_df = _pings(spark, rows)
    batch_df.write.parquet(src)

    radius, window = 20_000.0, 900.0
    batch = {
        (r["ping_a"], r["ping_b"])
        for r in TJ.contact_events(spark.read.parquet(src), radius, window).collect()
    }
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
    got = {
        (r["ping_a"], r["ping_b"])
        for r in spark.sql("SELECT ping_a, ping_b FROM contact_events").collect()
    }
    assert got == batch


def test_batch_frame_rejected(spark):
    import pytest

    df = _pings(spark, [(0, 1, "2024-01-01 00:00:00", 0.0, 0.0)])
    with pytest.raises(ValueError, match="batch DataFrame"):
        SC.contact_events_stream(df, 100.0, 60.0)
