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


# ---------------------------------------------------------------------------
# pagerank_int
# ---------------------------------------------------------------------------

_PR_EDGES = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "a", 1),
             ("d", "a", 3)]


def _pr_python(iterations, scale=10**9, d=85):
    ow = {}
    for s, _, w in _PR_EDGES:
        ow[s] = ow.get(s, 0) + w
    nodes = sorted({x for e in _PR_EDGES for x in e[:2]})
    rk = {h: scale for h in nodes}
    base = ((100 - d) * scale) // 100
    for _ in range(iterations):
        inc = {}
        for s, t, w in _PR_EDGES:
            inc[t] = inc.get(t, 0) + (rk[s] // ow[s]) * w
        rk = {h: base + d * inc.get(h, 0) // 100 for h in nodes}
    return rk


def _pr_df(spark):
    return spark.createDataFrame(
        _PR_EDGES, "src_host string, dst_host string, n_links long"
    )


def test_pagerank_matches_reference_arithmetic(spark):
    got = {r.host: r.rank for r in
           LG.pagerank_int(_pr_df(spark), iterations=3).collect()}
    assert got == _pr_python(3)


def test_pagerank_partitioning_independent(spark):
    df = _pr_df(spark)
    a = {r.host: r.rank for r in
         LG.pagerank_int(df.repartition(1), iterations=4).collect()}
    b = {r.host: r.rank for r in
         LG.pagerank_int(df.repartition(7), iterations=4).collect()}
    assert a == b  # bit-identical, the whole point of the integer form


def test_pagerank_dangling_and_sink(spark):
    rk = _pr_python(2)
    got = {r.host: r.rank for r in
           LG.pagerank_int(_pr_df(spark), iterations=2).collect()}
    # d has no inbound links: exactly the base after any iteration
    assert got["d"] == ((100 - 85) * 10**9) // 100 == rk["d"]
    # total mass never exceeds n*scale (DIV only leaks mass)
    assert sum(got.values()) <= 4 * 10**9


def test_pagerank_composes_with_host_link_graph(spark):
    edges = LG.host_link_graph(_df(spark))
    out = LG.pagerank_int(edges, iterations=2)
    got = {r.host: r.rank for r in out.collect()}
    assert set(got) == {"s1.com", "s2.com", "d1.com", "d2.com"}
    # d1 has all the inbound mass -> strictly the largest rank
    assert got["d1.com"] == max(got.values())


def _hits_python(iterations, scale=10**6):
    nodes = sorted({x for e in _PR_EDGES for x in e[:2]})
    hub = {h: scale for h in nodes}
    auth = {h: 0 for h in nodes}

    def norm(raw):
        t = max(sum(raw.get(h, 0) for h in nodes), 1)
        return {h: (raw.get(h, 0) * scale) // t for h in nodes}

    for _ in range(iterations):
        araw = {}
        for s, t, w in _PR_EDGES:
            araw[t] = araw.get(t, 0) + hub[s] * w
        auth = norm(araw)
        hraw = {}
        for s, t, w in _PR_EDGES:
            hraw[s] = hraw.get(s, 0) + auth[t] * w
        hub = norm(hraw)
    return hub, auth


def test_hits_matches_reference_arithmetic(spark):
    hub, auth = _hits_python(3)
    got = LG.hits_int(_pr_df(spark), iterations=3).collect()
    assert {r.host: r.hub for r in got} == hub
    assert {r.host: r.auth for r in got} == auth


def test_hits_partitioning_independent(spark):
    df = _pr_df(spark)
    a = sorted(map(tuple, LG.hits_int(df.repartition(1), iterations=4).collect()))
    b = sorted(map(tuple, LG.hits_int(df.repartition(7), iterations=4).collect()))
    assert a == b  # bit-identical, the whole point of the integer form


def test_hits_pure_hub_and_authority_roles(spark):
    # star graph: h points at a1..a3; h is all hub, the a's all authority
    edges = spark.createDataFrame(
        [("h", "a1", 1), ("h", "a2", 1), ("h", "a3", 2)],
        "src_host string, dst_host string, n_links long",
    )
    got = {r.host: (r.hub, r.auth) for r in
           LG.hits_int(edges, iterations=2).collect()}
    assert got["h"][0] == max(v[0] for v in got.values())  # top hub
    assert got["h"][1] == 0                                # zero authority
    assert all(got[a][0] == 0 for a in ("a1", "a2", "a3"))  # pure sinks
    # the double-weighted edge concentrates authority on a3
    assert got["a3"][1] == max(v[1] for v in got.values())
    # L1 normalization: each half sums to <= scale (DIV only leaks mass)
    assert sum(v[0] for v in got.values()) <= 10**6
    assert sum(v[1] for v in got.values()) <= 10**6


def test_hits_composes_with_host_link_graph(spark):
    edges = LG.host_link_graph(_df(spark))
    got = {r.host: (r.hub, r.auth) for r in
           LG.hits_int(edges, iterations=2).collect()}
    assert set(got) == {"s1.com", "s2.com", "d1.com", "d2.com"}
    # d1 takes all inbound links -> the dominant authority
    assert got["d1.com"][1] == max(v[1] for v in got.values())


def test_undirected_host_edges_canonicalizes(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("a", "a"), (None, "x"), ("c", None),
         ("b", "c")],
        "src_host string, dst_host string",
    )
    got = sorted((r.a, r.b) for r in LG.undirected_host_edges(df).collect())
    assert got == [("a", "b"), ("b", "c")]


def test_host_triangles_small(spark):
    # one triangle a-b-c; a pendant path c-d-e; duplicated/reversed edges
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "d"),
         ("d", "e"), ("e", "d")],
        "src_host string, dst_host string",
    )
    got = {r.host: r.n_triangles for r in LG.host_triangles(df).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_host_triangles_vs_bruteforce(spark):
    # deterministic modular graph; brute-force the truth in Python
    from itertools import combinations

    edges = []
    for i in range(300):
        edges.append((f"h{i % 23}", f"h{(i * 3 + 1) % 23}"))
        edges.append((f"h{(i * 5 + 2) % 23}", f"h{(i * 7 + 3) % 23}"))
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[str, int] = {}
    for trio in combinations(sorted(adj), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for h in trio:
                want[h] = want.get(h, 0) + 1
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r.host: r.n_triangles for r in LG.host_triangles(df).collect()}
    assert got == want


ANCHOR_PAGES = [
    ("https://s1.com/a",
     '<a href="https://d1.com/x">Great Search-Engine</a> filler '
     '<a href="https://d2.com/y">maps</a>'),
    ("https://s2.com/a",
     '<a href="https://d1.com/z">great search</a> '
     '<a href="https://s2.com/nav">home</a>'),          # self anchor
    ("https://s3.com/a",
     '<a href="https://d1.com/w"><b>nested</b></a> '    # nested: no match
     '<a href="https://d1.com/v"></a>'),                # empty text: no terms
    ("https://s4.com/a", None),
    (None, '<a href="https://d9.com/x">orphan</a>'),
]


def test_anchor_text_index(spark):
    df = spark.createDataFrame(ANCHOR_PAGES, "url string, html string")
    out = LG.anchor_text_index(df).collect()
    got = {(r.dst_host, r.term): (r.n_anchors, r.n_src_hosts) for r in out}
    assert got == {
        ("d1.com", "great"): (2, 2),
        ("d1.com", "search"): (2, 2),
        ("d1.com", "engine"): (1, 1),
        ("d2.com", "maps"): (1, 1),
    }


def test_anchor_text_index_keep_self(spark):
    df = spark.createDataFrame(ANCHOR_PAGES, "url string, html string")
    got = {
        (r.dst_host, r.term): r.n_anchors
        for r in LG.anchor_text_index(df, drop_self=False).collect()
    }
    assert got[("s2.com", "home")] == 1


def test_anchor_plan_no_expand(spark):
    df = spark.createDataFrame(ANCHOR_PAGES, "url string, html string")
    plan = (
        LG.anchor_text_index(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan


# --- link reciprocity ------------------------------------------------------


def test_reciprocity_counts(spark):
    from pygridmap_spark.operators.linkgraph import host_reciprocity

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # reciprocal pair
            ("a", "c"),                       # one-way
            ("a", "c"),                       # duplicate edge: distinct-pairs
            ("c", "d"), ("d", "c"),           # reciprocal pair
            ("d", "d"),                       # self-loop: excluded
            ("e", "a"),                       # one-way into a
        ],
        "src_host string, dst_host string",
    )
    out = {r["host"]: r for r in host_reciprocity(edges).collect()}
    assert out["a"]["n_out"] == 2 and out["a"]["n_reciprocal"] == 1
    assert out["a"]["reciprocity"] == 0.5
    assert out["b"]["n_out"] == 1 and out["b"]["n_reciprocal"] == 1
    assert out["c"]["n_out"] == 1 and out["c"]["n_reciprocal"] == 1
    assert out["d"]["n_out"] == 1 and out["d"]["n_reciprocal"] == 1
    assert out["e"]["n_out"] == 1 and out["e"]["n_reciprocal"] == 0
    assert "dd" not in out  # self-loop contributed nothing


def test_reciprocity_null_and_no_out(spark):
    from pygridmap_spark.operators.linkgraph import host_reciprocity

    edges = spark.createDataFrame(
        [("a", None), (None, "b"), ("a", "b")],
        "src_host string, dst_host string",
    )
    out = {r["host"]: r for r in host_reciprocity(edges).collect()}
    assert set(out) == {"a"}  # NULL endpoints dropped; b has no out-edges
    assert out["a"]["n_out"] == 1 and out["a"]["n_reciprocal"] == 0
