"""Link-graph operators: extraction, host edges, fixed-point PageRank,
anchor terms — including exact equality against a pure-Python twin of the
integer PageRank (the same arithmetic the DuckDB oracle unrolls)."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.pipeline import webgraph as wg

HTML_ROWS = [
    (
        1,
        "https://alpha.example.com/home",
        '<html><a href="https://beta.example.com/p">thai news</a>'
        '<a class="x" href="https://gamma.example.com/q">street food</a>'
        '<a href="/relative/path">skip me</a>'
        '<a href="HTTPS://Beta.example.com:8080/r">thai FOOD</a></html>',
    ),
    (
        2,
        "https://beta.example.com/about",
        '<html><a href="https://alpha.example.com/z">news</a>'
        "<p>no links here</p></html>",
    ),
    (3, "https://gamma.example.com/solo", "<html>nothing</html>"),
]


@pytest.fixture(scope="module")
def links(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(HTML_ROWS, ["doc_id", "url", "html"])
    return wg.extract_links(docs, "doc_id", "html").join(
        docs.select(F.col("doc_id").alias("doc_key"), "url"), "doc_key"
    )


def test_extract_links_tags_and_filter(spark):
    docs = spark.createDataFrame(HTML_ROWS, ["doc_id", "url", "html"])
    out = wg.extract_links(docs, "doc_id", "html").orderBy("doc_key", "link").collect()
    # relative href dropped, absolute kept (case-insensitive scheme)
    assert [(r.doc_key, r.link, r.anchor) for r in out] == [
        (1, "HTTPS://Beta.example.com:8080/r", "thai FOOD"),
        (1, "https://beta.example.com/p", "thai news"),
        (1, "https://gamma.example.com/q", "street food"),
        (2, "https://alpha.example.com/z", "news"),
    ]


def test_host_edges_drops_self_loops_and_ports(spark, links):
    edges = wg.host_edges(links).orderBy("src_host", "dst_host").collect()
    # doc1 links to beta twice (one with a port — same host at graph grain)
    assert [(r.src_host, r.dst_host, r.n_links) for r in edges] == [
        ("alpha.example.com", "beta.example.com", 2),
        ("alpha.example.com", "gamma.example.com", 1),
        ("beta.example.com", "alpha.example.com", 1),
    ]


def _py_pagerank(edges, iterations=5, damping_bp=8500, scale=10**9):
    """Pure-Python twin of the integer fixed-point update (exact)."""
    out_w: dict = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    init = scale // len(nodes)
    base = (10000 - damping_bp) * init // 10000
    ranks = {n: init for n in nodes}
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d, w in edges:
            inflow[d] += ranks[s] * w // out_w[s]
        ranks = {n: base + damping_bp * inflow[n] // 10000 for n in nodes}
    return ranks


EDGES = [
    ("hub", "a", 3),
    ("hub", "b", 1),
    ("a", "hub", 1),
    ("b", "hub", 1),
    ("c", "hub", 2),  # c: pure source (dangling none; c gets only base)
    ("a", "sink", 1),  # sink: no outlinks (dangling — mass drops)
]


def test_pagerank_matches_python_twin_exactly(spark):
    df = spark.createDataFrame(EDGES, ["src_host", "dst_host", "n_links"])
    got = {
        r.host: r.rank_units
        for r in wg.pagerank(df, iterations=5).collect()
    }
    assert got == _py_pagerank(EDGES, iterations=5)
    # structure: hub (most inflow) outranks everyone; source-only node c
    # bottoms out at base level
    assert got["hub"] == max(got.values())
    assert got["c"] == min(got.values())
    # dangling sink keeps rank mass strictly below the total budget
    assert sum(got.values()) < 10**9


def test_pagerank_single_iteration_and_validation(spark):
    df = spark.createDataFrame(EDGES, ["src_host", "dst_host", "n_links"])
    got = {r.host: r.rank_units for r in wg.pagerank(df, iterations=1).collect()}
    assert got == _py_pagerank(EDGES, iterations=1)
    with pytest.raises(ValueError):
        wg.pagerank(df, iterations=0)


def test_pagerank_cycle_is_uniform(spark):
    cyc = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    df = spark.createDataFrame(cyc, ["src_host", "dst_host", "n_links"])
    got = {r.host: r.rank_units for r in wg.pagerank(df, iterations=4).collect()}
    assert len(set(got.values())) == 1  # symmetric cycle → identical ranks


def test_anchor_terms_topk_deterministic(spark, links):
    out = wg.anchor_terms(links, k=2).orderBy("dst_host", "pos").collect()
    rows = [(r.dst_host, r.term, r.n, r.pos) for r in out]
    # beta receives "thai news" + "thai FOOD" → thai:2 then food/news tie
    # broken by term asc at n=1 → food first, k=2 cuts news
    assert rows == [
        ("alpha.example.com", "news", 1, 1),
        ("beta.example.com", "thai", 2, 1),
        ("beta.example.com", "food", 1, 2),
        ("gamma.example.com", "food", 1, 1),
        ("gamma.example.com", "street", 1, 2),
    ]
