"""Host-level link graph extraction from crawled HTML — the web-graph
side of a crawl pipeline (per-host outlink edges, degree rollups, crawl
frontier seeds).

Not a reference feature (eurostat/pygridmap is geospatial-only); part of
the LLM-training-data family. Extraction is pure Catalyst
(``regexp_extract_all`` + ``explode`` — JVM-side, no Python), with the
href/host regexes held to the Java-regex/RE2 agreement subset so the
driver oracle re-runs the identical extraction in DuckDB.

Scale shape (100 TB):

- ``host_link_graph`` explodes hrefs then aggregates on (src_host,
  dst_host) in ONE shuffle with map-side partial aggregation — the
  exploded rows never ride the exchange at full width, only partial
  (src, dst, count) triples do. Mega-hub destinations (google.com) are
  NOT skew keys here because the key is the PAIR.
- Degree rollups (``host_degrees``) run over the already-aggregated EDGE
  table, not the raw explode — the hub-dst skew lands on a frame that is
  orders of magnitude smaller than the corpus (bounded by distinct
  pairs), and the count/sum aggs partial-aggregate besides.
- Registered-domain collapsing composes with the broadcast PSL dimension
  (``functions.urls.with_registered_domain``) BEFORE the pair agg, so the
  graph can be built at domain granularity with zero extra exchanges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# href attribute values with an absolute http(s) target. Deliberately
# literal-minded (lowercase href, double quotes) — crawl HTML is usually
# normalized upstream; the pattern is a contract, not a parser.
HREF_PATTERN = r'href="(https?://[^"]+)"'
# authority host (no port / userinfo handling beyond the ':' stop)
HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def link_host(url: Column) -> Column:
    """Lowercased host of an absolute URL via the oracle-parity regex
    (``functions.urls.host`` uses the JVM ``parse_url`` — equivalent on
    well-formed absolute URLs; this one is restateable in DuckDB)."""
    h = F.lower(F.regexp_extract(url, HOST_PATTERN, 1))
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def extract_outlinks(
    df: DataFrame, html_col: str = "html", out_col: str = "outlink"
) -> DataFrame:
    """One row per absolute http(s) href in ``html_col`` (rows with no
    links drop — ``explode``, not ``explode_outer``; NULL html drops)."""
    return df.withColumn(
        out_col,
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), 1)),
    )


def host_link_graph(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = True,
) -> DataFrame:
    """(src_host, dst_host, n_links, n_pages) edge table: every absolute
    outlink in the corpus, aggregated to host pairs. ``n_links`` counts
    href occurrences; ``n_pages`` counts distinct source pages (by
    ``url_col``). ``drop_self`` removes same-host (navigation) edges.

    Plan shape (pinned in tests): the exploded rows never ride a shuffle
    raw — Spark plans the mixed count / count(distinct) as partial-agg on
    (src, dst, page) -> exchange of those triples -> partial distinct ->
    exchange on (src, dst). Two exchanges, both post-partial-agg, bounded
    by DISTINCT key combinations rather than corpus link volume; no
    Expand node."""
    links = extract_outlinks(
        df.select(
            F.col(url_col).alias("__page__"),
            link_host(F.col(url_col)).alias("src_host"),
            F.col(html_col),
        ),
        html_col=html_col,
    )
    edges = links.select(
        "src_host",
        link_host(F.col("outlink")).alias("dst_host"),
        "__page__",
    ).filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if drop_self:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("__page__").alias("n_pages"),
    )


def host_degrees(edges: DataFrame) -> DataFrame:
    """Per-host degree summary from an edge table (the output of
    :func:`host_link_graph`): out_degree / in_degree = distinct neighbor
    counts, out_links / in_links = total href counts. Runs on the edge
    frame (already collapsed to pairs), so hub skew never touches
    corpus-sized data; the two rollups are a full outer join on host."""
    out_d = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("n_links").alias("out_links"),
    )
    in_d = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("n_links").alias("in_links"),
    )
    return (
        out_d.join(in_d, "host", "full_outer")
        .fillna(0, ["out_degree", "out_links", "in_degree", "in_links"])
    )


def hits_int(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
) -> DataFrame:
    """Deterministic integer HITS (Kleinberg 1999, public) over a
    weighted edge table (the output of :func:`host_link_graph`):
    ``(host, hub, auth)`` scores in units of ``scale`` and EVERY
    operation is int64 —

        auth_raw[v] = sum_{u->v} hub[u] * w(u,v)
        auth[v]     = (auth_raw[v] * scale) DIV max(total_auth_raw, 1)
        hub_raw[u]  = sum_{u->v} auth[v] * w(u,v)
        hub[u]      = (hub_raw[u] * scale) DIV max(total_hub_raw, 1)

    The classical algorithm L2-normalizes each half-step; L1 (sum)
    normalization keeps the SAME fixed point direction (both are scalar
    rescalings of the power iteration on A^T A / A A^T) while staying in
    integer arithmetic — which is what makes the scores bit-reproducible
    run-to-run, partitioning-to-partitioning, and engine-to-engine (the
    driver oracle re-runs the identical arithmetic as unrolled DuckDB
    CTEs with scalar-subquery totals). The same reason pagerank_int
    exists: float HITS depends on the reduction order of distributed
    sums, so a rank sort on its scores is nondeterministic. The DIV
    truncation leaks sub-ulp mass per node, identically on every engine.

    Overflow bound: after each normalization every score <= scale and
    their sum <= scale, so the next raw sums are <= scale *
    total_edge_weight and the scaled numerator <= scale^2 * W — keep
    ``scale**2 * sum(w) < 2**63`` (~9e6 total weight at the default
    scale; lower ``scale`` for heavier graphs).

    Scale shape: the edge frame is projected once, repartitioned on src
    and persisted; each iteration shuffles ONLY sparse (host, score)
    frames — two partial-aggregated sums, each localCheckpointed to
    keep the plan flat (the iterative-loop discipline from
    connected_components / pagerank_int) with its 1-row total read from
    the checkpoint and inlined as a literal. Hosts with no incoming
    contribution stay ABSENT through the loop (absent == score 0 for
    every consumer, all inner joins); the dense zero fill happens once,
    on the final output.
    """
    e = edges.select(
        F.col(src_col).alias("__src__"),
        F.col(dst_col).alias("__dst__"),
        F.col(weight_col).cast("long").alias("__w__"),
    ).repartition("__src__").persist()
    nodes = (
        e.select(F.col("__src__").alias("host"))
        .unionByName(e.select(F.col("__dst__").alias("host")))
        .distinct()
        .persist()
    )

    def _norm(raw: DataFrame, out: str) -> DataFrame:
        # Normalize over the SPARSE raw frame: a host with no incoming
        # contribution normalizes to 0 * scale DIV t = 0, exactly what
        # the former dense fill produced, and every downstream consumer
        # is an inner join against the edge table, which treats an
        # absent host and a 0 score identically — so the per-half-step
        # nodes fill join, the 1-row broadcast build and the crossJoin
        # all drop out of the loop (guide §2.4); the dense fill happens
        # once, on the final output. The total is the same int64 sum
        # (absent hosts contribute 0 to it), collected as a 1-row
        # scalar and inlined as a literal; the checkpoint keeps the
        # iterative plan flat and is also what the total is read from.
        raw_cp = raw.localCheckpoint(eager=True)
        row = raw_cp.agg(F.sum("__r__").alias("__t__")).first()
        total = max(int(row["__t__"] or 0), 1)
        return raw_cp.select(
            "host",
            F.expr(
                f"(__r__ * CAST({scale} AS BIGINT))"
                f" DIV CAST({total} AS BIGINT)"
            ).cast("long").alias(out),
        )

    hub = nodes.select("host", F.lit(scale).cast("long").alias("hub"))
    auth = nodes.select("host", F.lit(0).cast("long").alias("auth"))
    try:
        for _ in range(iterations):
            araw = (
                e.join(hub, e["__src__"] == hub["host"])
                .select(
                    F.col("__dst__").alias("host"),
                    (F.col("hub") * F.col("__w__")).alias("__c__"),
                )
                .groupBy("host")
                .agg(F.sum("__c__").alias("__r__"))
            )
            auth = _norm(araw, "auth")
            hraw = (
                e.join(auth, e["__dst__"] == auth["host"])
                .select(
                    F.col("__src__").alias("host"),
                    (F.col("auth") * F.col("__w__")).alias("__c__"),
                )
                .groupBy("host")
                .agg(F.sum("__c__").alias("__r__"))
            )
            hub = _norm(hraw, "hub")
        return (
            nodes.join(hub, "host", "left")
            .join(auth, "host", "left")
            .select(
                "host",
                F.coalesce("hub", F.lit(0).cast("long")).alias("hub"),
                F.coalesce("auth", F.lit(0).cast("long")).alias("auth"),
            )
            # materialize before the finally releases the nodes/e caches
            .localCheckpoint(eager=True)
        )
    finally:
        e.unpersist()
        nodes.unpersist()


def pagerank_int(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
) -> DataFrame:
    """Deterministic integer PageRank over a weighted edge table (the
    output of :func:`host_link_graph`): ranks live in units of
    ``scale`` and EVERY operation is int64 —

        contrib(u->v) = (rank[u] DIV out_w[u]) * w(u,v)
        rank'[v]      = ((100-d)*scale) DIV 100
                        + (d * sum_in(contrib)) DIV 100

    Why integer: float PageRank depends on the reduction order of the
    incoming-contribution sum, which a distributed engine cannot pin —
    two runs of the same job can disagree in the last ulp and a rank
    SORT on those values is then nondeterministic. The integer
    formulation is bit-reproducible run-to-run, partitioning-to-
    partitioning, and engine-to-engine (the driver oracle re-runs the
    identical arithmetic as unrolled DuckDB CTEs). The DIV truncation
    deliberately leaks a sub-ulp of mass per edge; dangling-node mass is
    dropped (the standard simplification). Overflow bound: the total
    mass stays <= nodes*scale, so ``damping_pct * nodes * scale`` must
    stay below 2^63 (~1e8 hosts at the default scale; raise/lower
    ``scale`` to trade precision against headroom).

    Scale shape: the edge table is joined with its precomputed
    out-weight once, repartitioned on src and persisted; each iteration
    then shuffles ONLY the (host, rank) frame — one join exchange plus
    one partial-aggregated sum by dst — and localCheckpoints the new
    ranks to keep the plan flat (the iterative-loop discipline from
    connected_components)."""
    e = edges.select(
        F.col(src_col).alias("__src__"),
        F.col(dst_col).alias("__dst__"),
        F.col(weight_col).cast("long").alias("__w__"),
    )
    out_w = e.groupBy("__src__").agg(F.sum("__w__").alias("__ow__"))
    e = e.join(out_w, "__src__").repartition("__src__").persist()
    nodes = (
        e.select(F.col("__src__").alias("host"))
        .unionByName(e.select(F.col("__dst__").alias("host")))
        .distinct()
        .persist()
    )
    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.select("host", F.lit(scale).cast("long").alias("rank"))
    try:
        for _ in range(iterations):
            contrib = (
                e.join(ranks, e["__src__"] == ranks["host"])
                .select(
                    F.col("__dst__").alias("host"),
                    (F.expr("rank DIV __ow__") * F.col("__w__")).alias("__c__"),
                )
                .groupBy("host")
                .agg(F.sum("__c__").alias("__s__"))
            )
            ranks = (
                nodes.join(contrib, "host", "left")
                .select(
                    "host",
                    (
                        F.lit(base)
                        + F.expr(
                            f"CAST({damping_pct} AS BIGINT)"
                            " * coalesce(__s__, CAST(0 AS BIGINT)) DIV 100"
                        )
                    ).cast("long").alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks
    finally:
        e.unpersist()
        nodes.unpersist()


def undirected_host_edges(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Canonical undirected edge set from a (possibly bidirectional,
    possibly duplicated) directed edge table: one row per unordered
    host pair ``(a, b)`` with ``a < b`` (plain column ordering — the
    same comparison DuckDB applies, so the oracle restates it as
    least/greatest). Self-loops and NULL endpoints drop."""
    a = F.least(F.col(src_col), F.col(dst_col))
    b = F.greatest(F.col(src_col), F.col(dst_col))
    return (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
        .distinct()
    )


def host_triangles(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host triangle participation counts over the UNDIRECTED host
    graph: ``(host, n_triangles)`` where ``n_triangles`` is the number
    of distinct triangles (3-cliques) the host belongs to. Hosts in no
    triangle do not appear (the caller left-joins against a node table
    if zeros matter).

    Algorithm: the degree-ordered node-iterator (Schank & Wagner 2005,
    "Finding, Counting and Listing all Triangles in Large Graphs" —
    public). Each undirected edge is oriented from its lower to its
    higher endpoint under the total order ``(degree, host)``; wedges
    are generated only at an edge's LOW endpoint and closed by an
    equi-join back into the oriented edge set. The orientation bounds
    the wedge fan-out by sum_u C(outdeg(u), 2) = O(m^{3/2}) on any
    graph — hub hosts with millions of neighbors generate NO wedges
    because almost all their edges point INTO them under the order.

    Every triangle {u,v,w} is emitted exactly once (at its lowest-order
    vertex), then exploded to its three member hosts for the rollup.

    Scale shape: distinct-pair canonicalization (one exchange, bounded
    by distinct pairs, never raw link volume); degree agg + two
    node-keyed joins to attach the order key; the wedge self-join
    shuffles on the low endpoint; the closing join shuffles wedges on
    the (v, w) pair — the O(m^{3/2}) frame is the only super-linear
    exchange and it carries host ids only. The oriented frame is
    persisted across its three consumers. Per-host counts partial-
    aggregate before the final exchange."""
    und = undirected_host_edges(edges, src_col, dst_col)
    deg = (
        und.select(F.col("a").alias("h"))
        .unionByName(und.select(F.col("b").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("h").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("h").alias("b"), F.col("d").alias("db"))
    keyed = und.join(da, "a").join(db, "b")
    ka = F.struct(F.col("da").alias("d"), F.col("a").alias("h"))
    kb = F.struct(F.col("db").alias("d"), F.col("b").alias("h"))
    oriented = keyed.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(ka < kb, kb).otherwise(ka).alias("khi"),
    ).persist()
    try:
        e1 = oriented.select(
            F.col("lo").alias("u"), F.col("hi").alias("v"),
            F.col("khi").alias("kv"),
        )
        e2 = oriented.select(
            F.col("lo").alias("u"), F.col("hi").alias("w"),
            F.col("khi").alias("kw"),
        )
        # wedge (u; v, w) with v strictly below w in the SAME total
        # order that oriented the edges -> the closing edge, if it
        # exists, is stored exactly as (lo=v, hi=w).
        wedges = e1.join(e2, "u").filter(F.col("kv") < F.col("kw"))
        closing = oriented.select(
            F.col("lo").alias("v"), F.col("hi").alias("w")
        )
        tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
        member = tri.select(
            F.explode(F.array("u", "v", "w")).alias("host")
        )
        # eager: count the triangles while `oriented` is still persisted
        out = member.groupBy("host").agg(
            F.count(F.lit(1)).alias("n_triangles")
        )
        return out.localCheckpoint(eager=True)
    finally:
        oriented.unpersist()


# full anchor element with an absolute http(s) target and a text-only
# body (nested markup deliberately excluded — same contract spirit as
# HREF_PATTERN; stays inside the Java-regex/RE2 agreement subset: no
# backreferences, no lookaround)
ANCHOR_PATTERN = r'<a href="(https?://[^"]+)">([^<]*)</a>'


def anchor_text_index(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = True,
) -> DataFrame:
    """Anchor-text term index: ``(dst_host, term, n_anchors,
    n_src_hosts)`` — how the web DESCRIBES each target host (the
    classic anchor-text relevance signal used by web search / corpus
    labeling; anchor terms describe the target better than the
    target's own page does). Terms are the lowercased ``[a-z0-9]+``
    runs of each anchor's text body; an anchor contributes one count
    per term occurrence; ``n_src_hosts`` counts distinct linking
    hosts (the spam-resistant variant of the count). ``drop_self``
    removes navigation anchors (src host == dst host).

    Pure Catalyst: ``regexp_extract_all`` (whole-tag match) → explode →
    per-tag group extraction → term split/explode → one mixed
    count / count-distinct aggregation. Plan shape mirrors
    :func:`host_link_graph`: exploded term rows partial-aggregate on
    (dst_host, term, src_host) BEFORE any exchange, then a second
    partial-aggregated exchange on (dst_host, term) — both bounded by
    distinct key combinations, never raw anchor volume; no Expand
    node."""
    tags = df.select(
        link_host(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 0)
        ).alias("__tag__"),
    )
    anchors = tags.select(
        "src_host",
        link_host(
            F.regexp_extract(F.col("__tag__"), ANCHOR_PATTERN, 1)
        ).alias("dst_host"),
        F.lower(F.regexp_extract(F.col("__tag__"), ANCHOR_PATTERN, 2))
        .alias("__text__"),
    ).filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if drop_self:
        anchors = anchors.filter(F.col("src_host") != F.col("dst_host"))
    terms = anchors.select(
        "src_host",
        "dst_host",
        F.explode(F.split(F.col("__text__"), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    return terms.groupBy("dst_host", "term").agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.countDistinct("src_host").alias("n_src_hosts"),
    )


def host_reciprocity(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host link reciprocity over the DIRECTED host graph — the
    classic link-farm / link-exchange signal (Becchetti et al. 2008,
    "Link Analysis for Web Spam Detection", public): organic linking is
    largely one-way (page -> authority), while paid or collusive link
    schemes reciprocate. Returns ``(host, n_out, n_reciprocal,
    reciprocity)`` where ``n_out`` counts distinct out-neighbors
    (self-loops excluded), ``n_reciprocal`` counts those that link back,
    and ``reciprocity`` is their ratio (one IEEE division of exact
    integers). Hosts with no out-edges do not appear.

    Plan shape at crawl scale: the edge list collapses to distinct
    directed pairs FIRST (one partial-aggregated exchange bounded by
    distinct pairs, never raw link volume — the host_triangles
    discipline); the reciprocal test is ONE self equi-join on the
    REVERSED pair key (left semi, ids only); both rollups
    partial-aggregate on the src key. A mega-hub dst is harmless: the
    join key is the (src, dst) PAIR, which is unique per row — no skew
    key exists at all.
    """
    pairs = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d")))
        .distinct()
    )
    rev = pairs.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = pairs.join(rev, ["s", "d"], "left_semi")
    n_out = pairs.groupBy(F.col("s").alias("host")).agg(
        F.count(F.lit(1)).alias("n_out")
    )
    n_rec = recip.groupBy(F.col("s").alias("host")).agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    return (
        n_out.join(n_rec, "host", "left")
        .select(
            "host",
            "n_out",
            F.coalesce(F.col("n_reciprocal"), F.lit(0)).alias("n_reciprocal"),
            (
                F.coalesce(F.col("n_reciprocal"), F.lit(0)).cast("double")
                / F.col("n_out").cast("double")
            ).alias("reciprocity"),
        )
    )
