"""Crawl-frontier politeness scheduling (operators/frontier.
crawl_schedule): per-host round-robin round assignment under
(priority desc NULLS LAST, url asc), queue-length column, crawl-budget
truncation, NULL-host queue, and the no-priority ordering mode. The
driver oracle (`crawl_schedule`) gates the identical window in DuckDB.
"""

import pytest

from pygridmap_spark.operators import frontier as FR

SCHEMA = "url string, host string, pri long"


def _f(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_rounds_priority_and_ties(spark):
    rows = [
        ("u/a", "h1", 5), ("u/b", "h1", 9), ("u/c", "h1", 9),
        ("u/x", "h2", 1),
    ]
    out = {
        r["url"]: r
        for r in FR.crawl_schedule(_f(spark, rows), priority_col="pri").collect()
    }
    # h1: pri 9 first, tie (b, c) broken by url asc, then pri 5
    assert out["u/b"]["round"] == 1
    assert out["u/c"]["round"] == 2
    assert out["u/a"]["round"] == 3
    assert out["u/x"]["round"] == 1
    assert out["u/a"]["n_queued"] == 3 and out["u/x"]["n_queued"] == 1


def test_null_priority_last_and_null_host_queue(spark):
    rows = [
        ("u/a", "h1", None), ("u/b", "h1", 2),
        ("u/n1", None, 3), ("u/n2", None, 1),
    ]
    out = {
        r["url"]: r["round"]
        for r in FR.crawl_schedule(_f(spark, rows), priority_col="pri").collect()
    }
    assert out["u/b"] == 1 and out["u/a"] == 2  # NULL priority queues last
    assert out["u/n1"] == 1 and out["u/n2"] == 2  # NULL host is one queue


def test_budget_cap_and_contract(spark):
    rows = [(f"u/{i}", "h1", i) for i in range(5)] + [("u/z", "h2", 0)]
    out = FR.crawl_schedule(
        _f(spark, rows), priority_col="pri", max_rounds=2
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r["host"], []).append(r["url"])
    assert sorted(per["h1"]) == ["u/3", "u/4"]  # top-2 priorities kept
    assert per["h2"] == ["u/z"]
    with pytest.raises(ValueError, match="max_rounds"):
        FR.crawl_schedule(_f(spark, rows), max_rounds=0)


def test_no_priority_mode_orders_by_url(spark):
    rows = [("u/b", "h1", 9), ("u/a", "h1", 1)]
    out = {
        r["url"]: r["round"]
        for r in FR.crawl_schedule(_f(spark, rows), queued_col=None).collect()
    }
    assert out["u/a"] == 1 and out["u/b"] == 2
