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


def _py_pagerank_dangling(edges, iterations=5, damping_bp=8500, scale=10**9):
    """Pure-Python twin of the redistribute_dangling update (exact)."""
    out_w: dict = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    dangling = [n for n in nodes if n not in out_w]
    init = scale // len(nodes)
    base = (10000 - damping_bp) * init // 10000
    ranks = {n: init for n in nodes}
    for _ in range(iterations):
        share = sum(ranks[n] for n in dangling) // len(nodes)
        inflow = {n: 0 for n in nodes}
        for s, d, w in edges:
            inflow[d] += ranks[s] * w // out_w[s]
        ranks = {
            n: base + damping_bp * (inflow[n] + share) // 10000 for n in nodes
        }
    return ranks


def test_pagerank_dangling_redistribution(spark):
    df = spark.createDataFrame(EDGES, ["src_host", "dst_host", "n_links"])
    got = {
        r.host: r.rank_units
        for r in wg.pagerank(df, iterations=5, redistribute_dangling=True).collect()
    }
    assert got == _py_pagerank_dangling(EDGES, iterations=5)
    # mass conservation: with the leak closed, the sum is scale minus only
    # integer-division losses (< 1 unit per edge contribution, per node
    # base/damping div, and per-iteration share div)
    n_nodes, n_edges = 5, len(EDGES)
    assert 10**9 - (n_edges + 2 * n_nodes + 1) * 5 <= sum(got.values()) <= 10**9
    # and strictly more mass retained than the dropping variant
    dropped = {r.host: r.rank_units for r in wg.pagerank(df, iterations=5).collect()}
    assert sum(got.values()) > sum(dropped.values())
    # the dangling sink's inflow sources (a) benefit; ordering of hub stays
    assert got["hub"] == max(got.values())


def test_pagerank_dangling_duckdb_parity(spark):
    import duckdb

    df = spark.createDataFrame(EDGES, ["src_host", "dst_host", "n_links"])
    got = {
        r.host: r.rank_units
        for r in wg.pagerank(df, iterations=4, redistribute_dangling=True).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE eref(src_host VARCHAR, dst_host VARCHAR, n_links BIGINT)"
    )
    con.executemany("INSERT INTO eref VALUES (?,?,?)", EDGES)
    sql = wg.pagerank_sql(
        "SELECT * FROM eref", iterations=4, redistribute_dangling=True
    )
    oracle = {h: int(u) for h, u in con.execute(sql).fetchall()}
    assert got == oracle
    # no dangling nodes → flag is a no-op (shares are all zero)
    cyc = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    dfc = spark.createDataFrame(cyc, ["src_host", "dst_host", "n_links"])
    a = {r.host: r.rank_units for r in wg.pagerank(dfc, iterations=3).collect()}
    b = {
        r.host: r.rank_units
        for r in wg.pagerank(dfc, iterations=3, redistribute_dangling=True).collect()
    }
    assert a == b


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


def test_frontier_excludes_crawled_caps_hosts_and_ranks(spark):
    from pyspark.sql import functions as F

    # pages 1..3 crawled; their links discover beta/gamma urls.  One target
    # (beta.example.com/p) is ALSO already crawled -> must vanish.
    docs = spark.createDataFrame(HTML_ROWS, ["doc_id", "url", "html"])
    links = wg.extract_links(docs, "doc_id", "html")
    crawled = docs.select("url").union(
        spark.createDataFrame([("https://beta.example.com/p",)], ["url"])
    )
    ranks = spark.createDataFrame(
        [("beta.example.com", 700), ("gamma.example.com", 300)],
        "host string, rank_units long",
    )
    out = wg.frontier(crawled, links, ranks, per_host_cap=1).orderBy("host").collect()
    got = [(r.host, r.url, r.rank_units, r.n_refs, r.slot) for r in out]
    # beta host: /p excluded (crawled); the cap=1 keeps the port-variant url
    # (only remaining beta candidate).  alpha's /z target has no rank row ->
    # rank_units 0.  Case-preserved urls, lowercase hosts.
    assert got == [
        ("alpha.example.com", "https://alpha.example.com/z", 0, 1, 1),
        ("beta.example.com", "HTTPS://Beta.example.com:8080/r", 700, 1, 1),
        ("gamma.example.com", "https://gamma.example.com/q", 300, 1, 1),
    ]
    # cap=2 admits a second url per host where one exists
    out2 = wg.frontier(crawled, links, ranks, per_host_cap=2)
    assert out2.filter(F.col("slot") == 2).count() == 0  # every host has 1 left


def test_frontier_duckdb_parity(spark):
    import duckdb

    docs = spark.createDataFrame(HTML_ROWS, ["doc_id", "url", "html"])
    links = wg.extract_links(docs, "doc_id", "html")
    edges = wg.host_edges(
        links.join(
            docs.selectExpr("doc_id AS doc_key", "url"), "doc_key"
        )
    )
    ranks = wg.pagerank(edges, iterations=3)
    crawled = docs.select("url")
    a = (
        wg.frontier(crawled, links, ranks, per_host_cap=2)
        .toPandas()
        .sort_values(["host", "slot"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?, ?)", HTML_ROWS)
    links_sql = wg.extract_links_sql("pages", "doc_id", "html")
    edges_sql = wg.host_edges_sql(
        f"SELECT l.*, p.url FROM ({links_sql}) l JOIN pages p ON l.doc_key = p.doc_id"
    )
    b = (
        con.execute(
            wg.frontier_sql(
                "SELECT url FROM pages",
                links_sql,
                wg.pagerank_sql(edges_sql, iterations=3),
                per_host_cap=2,
            )
        )
        .df()
        .sort_values(["host", "slot"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    for col in ["host", "url", "rank_units", "n_refs", "slot"]:
        assert (a[col].values == b[col].values).all(), col


@pytest.mark.parametrize("seed", [0, 1])
def test_frontier_randomized_batch_parity(spark, seed):
    """Randomized link soup × crawled sets, Spark vs DuckDB in one batch:
    candidate collapse, anti-join, rank coalesce, host extraction, and the
    per-host window must agree on every (case-variant scheme, port, missing
    rank, shared target, already-crawled target) combination emitted."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(seed)
    hosts = [f"h{i}.example.com" for i in range(8)]
    schemes = ["https://", "http://", "HTTPS://", "Http://"]

    def url(host):
        port = rng.choice(["", "", ":8080", ":443"])
        path = rng.choice(["/", "/p", "/p/q", "/x?y=1", ""])
        return f"{rng.choice(schemes)}{host}{port}{path}"

    pages = []
    for i in range(25):
        targets = [url(rng.choice(hosts)) for _ in range(rng.randint(0, 4))]
        html = "".join(f'<a href="{t}">t{j}</a>' for j, t in enumerate(targets))
        pages.append((i, url(rng.choice(hosts)), f"<html>{html}</html>"))
    # crawled = own urls + a random slice of the targets (the anti-join bites)
    pdf = spark.createDataFrame(pages, "doc_id long, url string, html string")
    links = wg.extract_links(pdf, "doc_id", "html")
    some_targets = [
        (r["link"],) for r in links.collect() if rng.random() < 0.3
    ]
    crawled_rows = [(u,) for _, u, _ in pages] + some_targets
    crawled = spark.createDataFrame(crawled_rows, "url string")
    # ranks for a subset of hosts only (missing -> 0)
    rank_rows = [(h, rng.randint(1, 1000)) for h in hosts[:5]]
    ranks = spark.createDataFrame(rank_rows, "host string, rank_units long")
    a = (
        wg.frontier(crawled, links, ranks, per_host_cap=2)
        .toPandas().sort_values(["host", "slot"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pg", pd.DataFrame(pages, columns=["doc_id", "url", "html"]))
    con.register("cr", pd.DataFrame(crawled_rows, columns=["url"]))
    con.register("rk", pd.DataFrame(rank_rows, columns=["host", "rank_units"]))
    b = con.execute(
        wg.frontier_sql(
            "SELECT url FROM cr",
            wg.extract_links_sql("pg", "doc_id", "html"),
            "SELECT host, rank_units FROM rk",
            per_host_cap=2,
        )
    ).df().sort_values(["host", "slot"]).reset_index(drop=True)
    assert len(a) == len(b)
    for c in ["host", "url", "rank_units", "n_refs", "slot"]:
        assert list(a[c]) == list(b[c]), f"seed={seed} col={c}"


@pytest.mark.parametrize("seed", [0, 1])
def test_keep_best_randomized_batch_parity(spark, seed):
    """Randomized docs + candidate pairs (chains, cliques, dupes, length
    ties), Spark label propagation vs DuckDB recursive closure + the same
    canonical window."""
    import random

    import duckdb
    import pandas as pd

    from meilisearch_thai_spark.pipeline import dedup as dd

    rng = random.Random(100 + seed)
    docs = [(i, "w " * rng.randint(1, 30) + rng.choice(["a", "bb", ""])) for i in range(40)]
    pairs = []
    for _ in range(25):
        u, v = rng.randrange(40), rng.randrange(40)
        if u != v:
            pairs.append((u, v))
    if not pairs:
        pairs = [(0, 1)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(pairs, "left_key long, right_key long")
    a = (
        dd.keep_best_per_cluster(ddf, pdf, "doc_id", "text")
        .toPandas().sort_values("component").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("dtab", pd.DataFrame(docs, columns=["doc_id", "text"]))
    con.register("ptab", pd.DataFrame(pairs, columns=["left_key", "right_key"]))
    b = con.execute(
        dd.keep_best_per_cluster_sql(
            "SELECT * FROM ptab", "dtab", "doc_id", "text"
        )
    ).df().sort_values("component").reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ["component", "kept_key", "kept_len", "n_members"]:
        assert list(a[c]) == list(b[c]), f"seed={seed} col={c}"


def test_frontier_crawl_delay_caps_and_parity(spark):
    """Crawl-delay refinement: declared delays shrink a host's cycle cap
    (floor(cycle/delay), 0 = skip this cycle), undeclared hosts keep the
    flat cap; default plan unchanged; DuckDB twin agrees."""
    import duckdb

    links = spark.createDataFrame(
        [(f"p{i}", f"https://{h}.ex.com/u{i}") for h in ("a", "b", "c")
         for i in range(4)],
        ["doc_key", "link"],
    )
    crawled = spark.createDataFrame([("https://a.ex.com/u999",)], ["url"])
    ranks = spark.createDataFrame([("a.ex.com", 100)], "host string, rank_units long")
    delays = spark.createDataFrame(
        [("a.ex.com", 30.0), ("b.ex.com", 120.0)],  # cycle 60 → caps 2, 0
        "host string, crawl_delay_sec double",
    )
    base = wg.frontier(crawled, links, ranks, per_host_cap=3)
    per_host = {h: 0 for h in ("a.ex.com", "b.ex.com", "c.ex.com")}
    for r in base.collect():
        per_host[r["host"]] += 1
    assert per_host == {"a.ex.com": 3, "b.ex.com": 3, "c.ex.com": 3}

    capped = wg.frontier(
        crawled, links, ranks, per_host_cap=3, crawl_delays=delays, cycle_sec=60.0
    )
    got = sorted((r["host"], r["url"], r["slot"]) for r in capped.collect())
    per_host = {}
    for h, _u, _s in got:
        per_host[h] = per_host.get(h, 0) + 1
    assert per_host == {"a.ex.com": 2, "c.ex.com": 3}  # b skipped this cycle

    con = duckdb.connect()
    con.execute("CREATE TABLE links(doc_key VARCHAR, link VARCHAR)")
    con.executemany("INSERT INTO links VALUES (?,?)",
                    [(r["doc_key"], r["link"]) for r in links.collect()])
    con.execute("CREATE TABLE crawled(url VARCHAR)")
    con.execute("INSERT INTO crawled VALUES ('https://a.ex.com/u999')")
    con.execute("CREATE TABLE ranks(host VARCHAR, rank_units BIGINT)")
    con.execute("INSERT INTO ranks VALUES ('a.ex.com', 100)")
    con.execute("CREATE TABLE delays(host VARCHAR, crawl_delay_sec DOUBLE)")
    con.execute("INSERT INTO delays VALUES ('a.ex.com', 30.0), ('b.ex.com', 120.0)")
    sql = wg.frontier_sql(
        "SELECT * FROM crawled", "SELECT * FROM links", "SELECT * FROM ranks",
        per_host_cap=3, crawl_delays_sql="SELECT * FROM delays", cycle_sec=60.0,
    )
    oracle = sorted((h, u, s) for h, u, _ru, _n, s in con.execute(sql).fetchall())
    assert got == oracle
