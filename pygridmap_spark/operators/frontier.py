"""Crawl-frontier politeness scheduling: assign every queued URL its
fetch ROUND under the per-host-queue round-robin discipline (Heritrix /
Frontera frontier semantics, public): each host serves its URLs in
priority order, and a polite crawler fetches at most ONE URL per host
per round — so a URL's round number IS its earliest polite fetch
opportunity, and the interleaved frontier order is (round, priority)
regardless of how hub-heavy the queue is.

Shape at scale: ONE window exchange keyed on the host — the natural
partitioning of a frontier (per-host state is what politeness is ABOUT),
reused by any downstream per-host rollup. A mega-host queue (millions of
URLs on one host) sorts within its partition — inherent to the
semantics (that host's queue IS a sequential object) and bounded by the
biggest single host, not the corpus. No global sort anywhere: emitting
the frontier in fetch order is a plain distributed sort on (round,
priority) when a consumer wants it, never a row_number over everything.

Reference parity: pygridmap has no crawl tooling; this is the frontier
member of the engine's webtext intake family (robots.py decides MAY we
fetch, frontier.py decides WHEN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def crawl_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str | None = None,
    max_rounds: int | None = None,
    round_col: str = "round",
    queued_col: str | None = "n_queued",
) -> DataFrame:
    """Append each URL's politeness round: ``round`` = its 1-based rank
    within its host's queue under (``priority_col`` desc NULLS LAST,
    ``url_col`` asc — the deterministic tie-break). ``max_rounds``
    truncates every host's queue (the crawl-budget cap: "at most k pages
    per host this cycle"). ``queued_col`` adds the host's total queue
    length (rides the same window exchange; None skips it).

    NULL hosts are one queue of their own (window partition semantics) —
    filter upstream if unparseable URLs should not be scheduled.

    Determinism precondition: (host, url) pairs must be UNIQUE — a URL
    queued twice for the same host fully ties the sort key and
    row_number assigns the duplicate rounds arbitrarily per run. Real
    frontiers dedup before scheduling (operators/curation.
    canonical_url_dedup is the upstream); this operator does not hide a
    missing dedup behind a silent distinct.
    """
    if max_rounds is not None and max_rounds <= 0:
        raise ValueError(f"max_rounds must be positive, got {max_rounds}")
    order = (
        [F.col(priority_col).desc_nulls_last()] if priority_col else []
    ) + [F.col(url_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    out = frontier.withColumn(round_col, F.row_number().over(w))
    if queued_col:
        wq = Window.partitionBy(host_col)
        out = out.withColumn(queued_col, F.count(F.lit(1)).over(wq))
    if max_rounds is not None:
        out = out.filter(F.col(round_col) <= F.lit(int(max_rounds)))
    return out
