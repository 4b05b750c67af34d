"""Host link-graph extraction: href parsing parity, pair aggregation,
self-link dropping, degree rollups, and the no-Expand plan contract."""

from pyspark.sql import functions as F

from pygridmap_spark.operators import linkgraph as LG

PAGES = [
    ("https://s1.com/a", '<a href="https://d1.com/x">1</a> <a href="https://d2.com/y">2</a>'),
    ("https://s1.com/b", '<a href="https://d1.com/z">1</a> <a href="https://d1.com/w">1b</a>'),
    ("https://s2.com/a", '<a href="https://s2.com/nav">self</a> <a href="http://d1.com/q">1</a>'),
    ("https://s3.com/a", "no links at all"),
    ("https://s4.com/a", None),
    (None, '<a href="https://d9.com/x">orphan</a>'),
]


def _df(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_extract_outlinks(spark):
    out = LG.extract_outlinks(_df(spark)).select("url", "outlink").collect()
    got = sorted(
        ((r.url, r.outlink) for r in out),
        key=lambda p: (p[0] is not None, p[0] or "", p[1]),
    )
    assert got == [
        (None, "https://d9.com/x"),
        ("https://s1.com/a", "https://d1.com/x"),
        ("https://s1.com/a", "https://d2.com/y"),
        ("https://s1.com/b", "https://d1.com/w"),
        ("https://s1.com/b", "https://d1.com/z"),
        ("https://s2.com/a", "http://d1.com/q"),
        ("https://s2.com/a", "https://s2.com/nav"),
    ]


def test_host_link_graph(spark):
    g = LG.host_link_graph(_df(spark)).collect()
    got = {(r.src_host, r.dst_host): (r.n_links, r.n_pages) for r in g}
    # s2 self-link dropped; NULL src page dropped; two s1 pages hit d1
    assert got == {
        ("s1.com", "d1.com"): (3, 2),
        ("s1.com", "d2.com"): (1, 1),
        ("s2.com", "d1.com"): (1, 1),
    }


def test_host_link_graph_keep_self(spark):
    g = LG.host_link_graph(_df(spark), drop_self=False).collect()
    got = {(r.src_host, r.dst_host): r.n_links for r in g}
    assert got[("s2.com", "s2.com")] == 1


def test_host_degrees(spark):
    edges = LG.host_link_graph(_df(spark))
    d = {r.host: (r.out_degree, r.out_links, r.in_degree, r.in_links)
         for r in LG.host_degrees(edges).collect()}
    assert d["s1.com"] == (2, 4, 0, 0)
    assert d["d1.com"] == (0, 0, 2, 4)
    assert d["d2.com"] == (0, 0, 1, 1)


def test_link_host_null_for_relative(spark):
    df = spark.createDataFrame(
        [("relative/path",), ("https://ok.com/x",), (None,)], "u string"
    )
    got = [r.h for r in df.select(LG.link_host(F.col("u")).alias("h")).collect()]
    assert got == [None, "ok.com", None]


def test_plan_no_expand_and_partial_agg(spark):
    plan = (
        LG.host_link_graph(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    # exploded rows are partially aggregated before any exchange: in the
    # top-down plan text the map-side partial_count sits BELOW (after)
    # the last Exchange
    assert "partial_count" in plan.split("Exchange")[-1]
