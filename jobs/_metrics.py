"""Shared REST-API metrics helpers for the rehearsal jobs.

One copy of the executed-metrics reader (CLAUDE.md gotcha: a Python-side
``df.queryExecution()`` is a never-executed plan copy — stage totals must
come from the REST endpoint after the action). The four per-job copies of
this helper had already drifted (GB vs MB units) — review finding, round 5.
"""

from __future__ import annotations

import json
import urllib.request


def rest_stages(spark) -> list[dict]:
    """All COMPLETED stages of this app from the UI REST endpoint."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete&details=false"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def shuffle_totals_mb(spark) -> tuple[float, float]:
    """(write MB, read MB) summed over all completed stages so far —
    delta two calls around a job to attribute volume to it."""
    st = rest_stages(spark)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in st) / 1e6,
        sum(s.get("shuffleReadBytes", 0) for s in st) / 1e6,
    )


def shuffle_totals_gb(spark) -> tuple[float, float]:
    """(write GB, read GB) variant."""
    w, r = shuffle_totals_mb(spark)
    return w / 1e3, r / 1e3
