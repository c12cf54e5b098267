"""URL canonicalization (RFC 3986 syntax normalization + tracking-param
strip) and per-host crawl rollups — the canonical key url-keyed dedup needs."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.pipeline import weburl as wu
from meilisearch_thai_spark.pipeline.weburl import host_stats, normalize_urls


def _norm(spark, url):
    df = spark.createDataFrame([(1, url)], "id long, url string")
    return normalize_urls(df, "id", "url").collect()[0]


def test_normalization_rules(spark):
    r = _norm(spark, "HTTPS://WWW.Example.COM:443/Path/One?utm_source=x&id=7&gclid=z#sec")
    assert r["norm_url"] == "https://www.example.com/Path/One?id=7"
    assert r["host"] == "www.example.com"
    assert r["domain"] == "example.com"


def test_path_case_and_nondefault_port_preserved(spark):
    r = _norm(spark, "http://Site.ORG:8080/CaseSensitive?Q=Mixed")
    assert r["norm_url"] == "http://site.org:8080/CaseSensitive?Q=Mixed"
    assert r["host"] == "site.org:8080"  # 8080 is not http's default


def test_default_port_only_for_matching_scheme(spark):
    # :443 on plain http is NOT the default port — must stay
    r = _norm(spark, "http://a.example.com:443/x")
    assert r["norm_url"] == "http://a.example.com:443/x"


def test_all_params_tracking_drops_question_mark(spark):
    r = _norm(spark, "https://a.example.com/x?utm_source=a&utm_medium=b")
    assert r["norm_url"] == "https://a.example.com/x"


def test_host_stats_counts_canonical_duplicates(spark):
    rows = [
        (1, "https://a.example.com/p?id=1"),
        (2, "HTTPS://A.Example.com/p?id=1&utm_source=x"),  # same canonical
        (3, "https://a.example.com/p?id=2"),
        (4, "https://b.example.com/q"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r["host"]: (r["n_docs"], r["n_urls"])
        for r in host_stats(normalize_urls(df, "id", "url")).collect()
    }
    assert got == {"a.example.com": (3, 2), "b.example.com": (1, 1)}


def test_bare_tracking_param_strips(spark):
    # a valueless '?utm_source' (no '=') is still a tracking param
    r = _norm(spark, "https://a.example.com/x?utm_source&id=3")
    assert r["norm_url"] == "https://a.example.com/x?id=3"
    r2 = _norm(spark, "https://a.example.com/x?utm_source")
    assert r2["norm_url"] == "https://a.example.com/x"


def test_domain_excludes_nondefault_port(spark):
    # the port stays in host but must NOT leak into the registered domain
    r = _norm(spark, "http://a.example.com:8080/x")
    assert r["host"] == "a.example.com:8080"
    assert r["domain"] == "example.com"


def test_filter_blocklist_by_host_and_domain(spark):
    from meilisearch_thai_spark.pipeline.weburl import filter_blocklist

    import pytest

    df = spark.createDataFrame(
        [
            (1, "https://bad.example.com/x"),
            (2, "https://good.example.com/y"),
            (3, "https://anything.evil.net/z"),
        ],
        "id long, url string",
    )
    urls = normalize_urls(df, "id", "url")
    by_host = filter_blocklist(urls, ["bad.example.com"], "host")
    assert {r["doc_key"] for r in by_host.collect()} == {2, 3}
    by_domain = filter_blocklist(urls, ["evil.net"], "domain")
    assert {r["doc_key"] for r in by_domain.collect()} == {1, 2}
    with pytest.raises(ValueError):
        filter_blocklist(urls, ["x"], "path")


def test_filter_blocklist_duckdb_parity(spark):
    import duckdb

    from meilisearch_thai_spark.pipeline.weburl import (
        filter_blocklist,
        filter_blocklist_sql,
        normalize_urls_sql,
    )

    rows = [
        (i, f"https://www.site{i % 5}.example.com/p/{i}?id={i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    blocked = ["www.site1.example.com", "www.site4.example.com"]
    got = sorted(
        r["doc_key"]
        for r in filter_blocklist(normalize_urls(df, "id", "url"), blocked).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, u in rows)
        + ") v(id, url)"
    )
    want = [
        r[0]
        for r in con.execute(
            filter_blocklist_sql(normalize_urls_sql("t", "id", "url"), blocked)
            + " ORDER BY doc_key"
        ).fetchall()
    ]
    assert got == want and len(got) == 24


def test_filter_blocklist_rejects_empty_list(spark):
    import pytest

    from meilisearch_thai_spark.pipeline.weburl import (
        filter_blocklist,
        filter_blocklist_sql,
    )

    df = spark.createDataFrame([(1, "https://a.example.com/x")], "id long, url string")
    urls = normalize_urls(df, "id", "url")
    with pytest.raises(ValueError):
        filter_blocklist(urls, [])
    with pytest.raises(ValueError):
        filter_blocklist_sql("SELECT 1", [])


def test_recrawl_latest_keeps_newest_capture_per_url(spark):
    from meilisearch_thai_spark.pipeline.weburl import recrawl_latest

    rows = [
        ("u1", 10, 1), ("u1", 30, 2), ("u1", 20, 3),   # newest ts wins
        ("u2", 5, 4),                                   # singleton passes
        ("u3", 7, 5), ("u3", 7, 6),                     # ts tie → max tiebreak
    ]
    df = spark.createDataFrame(rows, "url string, ts long, doc_id long")
    got = {
        r["url"]: (r["ts"], r["doc_id"])
        for r in recrawl_latest(df, "url", "ts", "doc_id").collect()
    }
    assert got == {"u1": (30, 2), "u2": (5, 4), "u3": (7, 6)}


def test_recrawl_latest_duckdb_parity(spark, sf_dir):
    import duckdb

    from pyspark.sql import functions as F

    from meilisearch_thai_spark.pipeline.weburl import (
        recrawl_latest,
        recrawl_latest_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    crawls = docs.select(
        F.concat(F.lit("https://site/"), (F.col("doc_id") % 20).cast("string")).alias("url"),
        ((F.col("doc_id") * 37) % 11).cast("long").alias("ts"),  # forced ts ties
        "doc_id",
    )
    a = (
        recrawl_latest(crawls, "url", "ts", "doc_id")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(
            recrawl_latest_sql(
                "SELECT 'https://site/' || CAST(doc_id % 20 AS VARCHAR) AS url, "
                "CAST((doc_id * 37) % 11 AS BIGINT) AS ts, doc_id FROM documents",
                "url", "ts", "doc_id", ["ts", "doc_id"],
            )
        )
        .df()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (a[["url", "ts", "doc_id"]].values == b[["url", "ts", "doc_id"]].values).all()


# ------------------------------------------------------------- robots.txt
@pytest.fixture(scope="module")
def robots_rules(spark):
    body = (
        "# comment only line\n"
        "User-agent: googlebot\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: *\n"
        "User-agent: bingbot\n"
        "Disallow: /blocked\n"
        "Allow: /blocked/ok\n"
        "disallow : /Case\n"     # case-insensitive field name, value kept as-is
        "Disallow:\n"            # empty value -> dropped
        "\n"
        "User-agent: yandex\n"
        "Disallow: /yandex-only\n"
    )
    orphan = "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n"
    rdf = spark.createDataFrame(
        [("h1", body), ("h2", orphan)], "host string, robots_txt string"
    )
    return wu.parse_robots(rdf)


def test_parse_robots_star_group_only(robots_rules):
    got = {(r.host, r.rule, r.path) for r in robots_rules.collect()}
    assert got == {
        ("h1", "disallow", "/blocked"),
        ("h1", "allow", "/blocked/ok"),
        ("h1", "disallow", "/Case"),
        ("h2", "disallow", "/x"),  # the pre-group orphan rule is ignored
    }


def test_apply_robots_longest_match_allow_wins(spark, robots_rules):
    urls = spark.createDataFrame(
        [
            (1, "https://h1/blocked/page"),
            (2, "https://h1/blocked/ok/page"),
            (3, "https://h1/free"),
            (4, "https://h1/Case/x"),
            (5, "https://h1/case/x"),      # prefix match is case-SENSITIVE
            (6, "https://h2/x"),
            (7, "https://unknown-host/x"),  # no robots -> allowed
        ],
        "doc_key long, url string",
    )
    out = {r.doc_key: r for r in wu.apply_robots(urls, "doc_key", "url", robots_rules).collect()}
    assert not out[1].allowed and out[1].matched_path == "/blocked"
    assert out[2].allowed and out[2].matched_path == "/blocked/ok"
    assert out[3].allowed and out[3].matched_rule is None
    assert not out[4].allowed
    assert out[5].allowed
    assert not out[6].allowed
    assert out[7].allowed


def test_robots_duckdb_parity(spark, robots_rules):
    import duckdb
    import pandas as pd

    rows = [
        ("h1", "User-agent: *\nAllow: /a/b\nDisallow: /a\nUser-agent: late\nDisallow: /l\n"),
        ("h3", "User-agent: other\nDisallow: /\n"),  # no star group at all
    ]
    urls = [(1, "https://h1/a/b/c"), (2, "https://h1/a/z"), (3, "https://h3/a")]
    rdf = spark.createDataFrame(rows, "host string, robots_txt string")
    udf_ = spark.createDataFrame(urls, "doc_key long, url string")
    a = (
        wu.apply_robots(udf_, "doc_key", "url", wu.parse_robots(rdf))
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("rbsrc", pd.DataFrame(rows, columns=["host", "robots_txt"]))
    con.register("usrc", pd.DataFrame(urls, columns=["doc_key", "url"]))
    b = con.execute(
        wu.apply_robots_sql(
            "SELECT doc_key, url FROM usrc", wu.parse_robots_sql("SELECT * FROM rbsrc")
        )
    ).df().sort_values("doc_key").reset_index(drop=True)
    for c in a.columns:
        assert list(a[c]) == list(b[c]), c
    assert list(a["allowed"]) == [True, False, True]


def test_apply_robots_root_query_and_host_case(spark):
    # RFC 9309 edge set: 'Disallow: /' must block a bare-host url (empty
    # path matches as '/'), rules match against PATH+QUERY, and a robots
    # row keyed by a mixed-case host still matches (DNS case-insensitive)
    rdf = spark.createDataFrame(
        [
            ("WWW.Blocked.COM", "User-agent: *\nDisallow: /\n"),
            ("h1", "User-agent: *\nDisallow: /search?q=\n"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://www.blocked.com"),
            (2, "https://www.blocked.com/any/page"),
            (3, "https://h1/search?q=foo"),
            (4, "https://h1/search"),
            (5, "https://h1?q=1"),  # query-only url -> path '/?q=1'
        ],
        "doc_key long, url string",
    )
    out = {r.doc_key: r for r in wu.apply_robots(urls, "doc_key", "url", wu.parse_robots(rdf)).collect()}
    assert not out[1].allowed and out[1].path == "/"
    assert not out[2].allowed
    assert not out[3].allowed and out[3].matched_path == "/search?q="
    assert out[4].allowed  # no query -> the query rule does not match
    assert out[5].allowed and out[5].path == "/?q=1"


def test_robots_root_block_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    rows = [("B.com", "User-agent: *\nDisallow: /\nAllow: /pub\n")]
    urls = [(1, "https://b.com"), (2, "https://b.com/pub/x"), (3, "https://b.com/priv?y=1")]
    a = (
        wu.apply_robots(
            spark.createDataFrame(urls, "doc_key long, url string"),
            "doc_key", "url",
            wu.parse_robots(spark.createDataFrame(rows, "host string, robots_txt string")),
        ).toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("rbsrc2", pd.DataFrame(rows, columns=["host", "robots_txt"]))
    con.register("usrc2", pd.DataFrame(urls, columns=["doc_key", "url"]))
    b = con.execute(
        wu.apply_robots_sql(
            "SELECT doc_key, url FROM usrc2", wu.parse_robots_sql("SELECT * FROM rbsrc2")
        )
    ).df().sort_values("doc_key").reset_index(drop=True)
    for c in a.columns:
        assert list(a[c]) == list(b[c]), c
    assert list(a["allowed"]) == [False, True, False]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_robots_randomized_batch_parity(spark, seed):
    """Randomized robots bodies × urls, Spark vs DuckDB in ONE batch job:
    the two independently-written parsers/matchers must agree on every
    (group structure, precedence, edge) combination the generator emits."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(seed)
    line_pool = [
        "User-agent: *", "User-agent: bot", "user-AGENT: *",
        "Allow: /a", "Allow: /a/b", "Allow: /",
        "Disallow: /a", "Disallow: /a/b", "Disallow: /c", "Disallow: /",
        "Disallow:", "Allow:", "# comment", "", "junk line no colon",
        "Disallow: /x?q=", "  Allow:   /a/bc  ", "Crawl-delay: 10",
    ]
    hosts = []
    for i in range(12):
        n = rng.randint(0, 10)
        hosts.append((f"h{i}", "\n".join(rng.choice(line_pool) for _ in range(n))))
    paths = ["", "/", "/a", "/a/b", "/a/bc", "/a/b/c", "/c", "/x?q=1", "/x", "?q=1"]
    urls = [
        (j, f"https://h{rng.randint(0, 13)}{rng.choice(paths)}") for j in range(60)
    ]
    rdf = spark.createDataFrame(hosts, "host string, robots_txt string")
    udf_ = spark.createDataFrame(urls, "doc_key long, url string")
    a = (
        wu.apply_robots(udf_, "doc_key", "url", wu.parse_robots(rdf))
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("rbsrc3", pd.DataFrame(hosts, columns=["host", "robots_txt"]))
    con.register("usrc3", pd.DataFrame(urls, columns=["doc_key", "url"]))
    b = con.execute(
        wu.apply_robots_sql(
            "SELECT doc_key, url FROM usrc3", wu.parse_robots_sql("SELECT * FROM rbsrc3")
        )
    ).df().sort_values("doc_key").reset_index(drop=True)
    assert len(a) == 60
    for c in a.columns:
        assert list(a[c]) == list(b[c]), f"seed={seed} col={c}"


def test_parse_sitemaps_fields_and_parity(spark):
    import duckdb
    import pandas as pd

    from meilisearch_thai_spark.pipeline.weburl import parse_sitemaps, parse_sitemaps_sql

    xml = (
        "<?xml version='1.0'?><urlset>"
        "<url><loc> https://a.com/p1?x=1&amp;y=2 </loc><lastmod>2026-01-02</lastmod></url>"
        "<URL><loc>https://a.com/p2</loc></URL>"              # case-insensitive block
        "<url><lastmod>2026-01-01</lastmod></url>"            # no loc: dropped
        "<url><loc>https://a.com/p3</loc><lastmod>not a date</lastmod></url>"
        "<url><loc>https://a.com/p4</loc>"
        "<lastmod>2026-01-05T18:00:15+00:00</lastmod></url>"  # RFC 3339 w/ offset
        "</urlset>"
    )
    rows = [("a.com", xml), ("b.com", None)]
    df = spark.createDataFrame(rows, "host string, xml string")
    # offset-bearing lastmod resolves through the session tz: pin UTC for
    # the cross-engine compare (the documented contract)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = sorted(
            (r["host"], r["url"], str(r["lastmod"]))
            for r in parse_sitemaps(df, "host", "xml").collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert got == [
        ("a.com", "https://a.com/p1?x=1&y=2", "2026-01-02 00:00:00"),  # &amp; decoded
        ("a.com", "https://a.com/p2", "None"),
        ("a.com", "https://a.com/p3", "None"),  # unparseable lastmod -> NULL
        ("a.com", "https://a.com/p4", "2026-01-05 18:00:15"),
    ]
    con = duckdb.connect()
    con.register("sm", pd.DataFrame(rows, columns=["host", "xml"]))
    b = con.execute(
        parse_sitemaps_sql("SELECT * FROM sm", "host", "xml")
    ).df()
    got_b = sorted(
        (r["host"], r["url"], str(r["lastmod"]) if pd.notna(r["lastmod"]) else "None")
        for _, r in b.iterrows()
    )
    assert got_b == got


def test_parse_crawl_delay_star_group_and_parity(spark):
    """Crawl-delay: star-group resolution, conservative max, junk dropped,
    DuckDB twin parity."""
    import duckdb

    from meilisearch_thai_spark.pipeline.weburl import (
        parse_crawl_delay,
        parse_crawl_delay_sql,
    )

    rows = [
        # star group with delay; a second star group declares a bigger one
        ("A.example.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
                          "User-agent: *\nCrawl-delay: 10.5\n"),
        # delay only in a non-star group → host absent
        ("b.example.com", "User-agent: googlebot\nCrawl-delay: 7\n"
                          "User-agent: *\nDisallow: /\n"),
        # junk value and negative dropped; comment stripped
        ("c.example.com", "User-agent: *\nCrawl-delay: soon # tomorrow\n"
                          "Crawl-delay: -3\n"),
        # multi-UA block containing star
        ("d.example.com", "User-agent: bingbot\nUser-agent: *\nCrawl-delay: 1.5\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {r["host"]: r["crawl_delay_sec"] for r in parse_crawl_delay(df).collect()}
    assert got == {"a.example.com": 10.5, "d.example.com": 1.5}

    con = duckdb.connect()
    con.execute("CREATE TABLE robots(host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots VALUES (?,?)", rows)
    oracle = dict(con.execute(
        parse_crawl_delay_sql("SELECT * FROM robots")
    ).fetchall())
    assert got == oracle


def test_parse_sitemap_index_nesting_and_parity(spark):
    """Sitemap INDEX files: child sitemap urls + freshness extracted; a
    mixed (malformed) document parses its <sitemap> blocks here and its
    <url> blocks in parse_sitemaps; DuckDB twin parity."""
    import duckdb

    from meilisearch_thai_spark.pipeline.weburl import (
        parse_sitemap_index,
        parse_sitemap_index_sql,
        parse_sitemaps,
    )

    rows = [
        ("a.ex.com",
         '<?xml version="1.0"?><sitemapindex>'
         "<sitemap><loc>https://a.ex.com/maps/a1.xml</loc>"
         "<lastmod>2026-01-05</lastmod></sitemap>"
         "<SITEMAP><loc> https://a.ex.com/maps/a2.xml?p=1&amp;q=2 </loc></SITEMAP>"
         "<sitemap><lastmod>2026-01-01</lastmod></sitemap>"  # loc-less drops
         "</sitemapindex>"),
        # mixed document: one child sitemap AND one leaf url
        ("b.ex.com",
         "<sitemapindex><sitemap><loc>https://b.ex.com/s.xml</loc></sitemap>"
         "</sitemapindex><urlset><url><loc>https://b.ex.com/page</loc></url>"
         "</urlset>"),
        ("c.ex.com", None),
    ]
    df = spark.createDataFrame(rows, "host string, xml string")
    got = sorted(
        (r["host"], r["sitemap_url"], str(r["lastmod"]))
        for r in parse_sitemap_index(df, "host", "xml").collect()
    )
    assert got == [
        ("a.ex.com", "https://a.ex.com/maps/a1.xml", "2026-01-05 00:00:00"),
        ("a.ex.com", "https://a.ex.com/maps/a2.xml?p=1&q=2", "None"),
        ("b.ex.com", "https://b.ex.com/s.xml", "None"),
    ]
    # the mixed document's LEAF url comes out of parse_sitemaps, not here
    leaves = {r["url"] for r in parse_sitemaps(df, "host", "xml").collect()}
    assert leaves == {"https://b.ex.com/page"}

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("CREATE TABLE sm(host VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO sm VALUES (?,?)", rows)
    oracle = sorted(
        (h, u, str(lm) if lm is not None else "None")
        for h, u, lm in con.execute(
            parse_sitemap_index_sql("SELECT * FROM sm", "host", "xml")
        ).fetchall()
    )
    assert got == oracle


def test_robots_sitemap_urls_group_independent_and_parity(spark):
    """Sitemap: directives are group-independent (RFC 9309 §2.3) — found in
    any group or outside all groups, case-insensitive key, comments
    stripped, deduplicated; DuckDB twin parity."""
    import duckdb

    from meilisearch_thai_spark.pipeline.weburl import (
        robots_sitemap_urls,
        robots_sitemap_urls_sql,
    )

    rows = [
        ("A.ex.com",
         "Sitemap: https://a.ex.com/s1.xml\n"
         "User-agent: googlebot\nDisallow: /\n"
         "SITEMAP: https://a.ex.com/s2.xml # the index\n"
         "Sitemap: https://a.ex.com/s1.xml\n"),  # dup collapses
        ("b.ex.com", "User-agent: *\nDisallow: /private\n"),  # none
        ("c.ex.com", "sitemap:https://c.ex.com/map.xml\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = sorted((r["host"], r["sitemap_url"])
                 for r in robots_sitemap_urls(df).collect())
    assert got == [
        ("a.ex.com", "https://a.ex.com/s1.xml"),
        ("a.ex.com", "https://a.ex.com/s2.xml"),
        ("c.ex.com", "https://c.ex.com/map.xml"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE robots(host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots VALUES (?,?)", rows)
    oracle = sorted(con.execute(
        robots_sitemap_urls_sql("SELECT * FROM robots")
    ).fetchall())
    assert got == oracle
