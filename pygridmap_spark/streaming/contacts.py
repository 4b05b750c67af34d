"""Streaming spatio-temporal co-location: the contact-tracing join as a
WATERMARKED STREAM-STREAM SELF-JOIN — the batch operator
(operators/trajectories.contact_events) run unchanged on a streaming
pings frame.

How the state stays bounded (the part that matters at stream scale):
both derived sides of the candidate join carry an event-time watermark,
and the join condition includes the ± window time-interval constraint on
the two timestamp columns — exactly the contract Structured Streaming
requires to EVICT join state as the watermark advances. State held at any
moment is the pings inside (watermark lag + contact window), independent
of stream length. Because the join is INNER, matched contact events emit
immediately (no watermark wait); late pings behind the watermark may
silently lose contacts — the standard streaming-join late-data contract,
pinned by the parity test.

Batch == stream: `tests/test_streaming_contacts.py` runs the SAME corpus
through the batch operator and an availableNow stream and asserts the
event sets are identical — the repo's streaming-parity discipline (the
PII scrub and hop-distance twins use the same gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pygridmap_spark.operators import trajectories as TJ


def contact_events_stream(
    pings_stream: DataFrame,
    radius_m: float,
    window_s: float,
    watermark: str = "2 minutes",
    level: int | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    ping_id: str = "ping_id",
) -> DataFrame:
    """Per-contact event rows over a streaming pings frame — see
    operators/trajectories.contact_events for semantics and columns.
    ``watermark`` bounds both how late a ping may arrive and how much
    join state is held; pick it >= the source's real event-time disorder
    (a ping later than that loses its contacts, silently, by the
    streaming inner-join contract)."""
    if not pings_stream.isStreaming:
        raise ValueError(
            "pings_stream is a batch DataFrame - use "
            "operators/trajectories.contact_events directly"
        )
    return TJ.contact_events(
        pings_stream,
        radius_m,
        window_s,
        level,
        entity_col=entity_col,
        ts_col=ts_col,
        lon=lon,
        lat=lat,
        ping_id=ping_id,
        watermark=watermark,
    )
