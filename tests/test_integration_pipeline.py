"""End-to-end web-pipeline integration: the composed chain a real corpus
runs — robots politeness gate → HTML → text extraction → unicode fix →
corpus-wide line dedup → Gopher + classifier quality filters → exact dedup
→ index build → BM25 search — with the discovery chain (robots Sitemap →
sitemap index → leaf sitemaps) exercised alongside.

Each stage is oracle-tested in isolation elsewhere; this test pins the
COMPOSITION: stage outputs feed the next stage's expected schema, rows
dropped by a gate never resurface downstream, and the surviving corpus is
searchable end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.pipeline.webtext import (
    dedup_lines_global,
    extract_html_text,
    gopher_quality,
    unicode_fix,
)
from meilisearch_thai_spark.pipeline.weburl import (
    apply_robots,
    parse_robots,
    parse_sitemap_index,
    parse_sitemaps,
    robots_sitemap_urls,
)
from meilisearch_thai_spark.pipeline.dedup import exact_duplicates
from meilisearch_thai_spark.query.executor import SearchEngine

BOILER = "accept all cookies to continue browsing"


def _mk_html(i: int, body: str) -> str:
    return (
        f"<html><head><title>Doc {i}</title><style>p{{}}</style></head>"
        f"<body><p>{BOILER}</p><p>{body}</p></body></html>"
    )


@pytest.fixture(scope="module")
def crawl(spark):
    # 30 pages on two hosts; host b disallows /private; docs 20/21 are
    # exact duplicates; every page carries the same cookie-banner line
    base = (
        "the quick data engine builds and scans postings with merge join "
        "hash table sort order column batch stream filter index value"
    )
    body_words = f"{base} {base} {base}"  # ~66 words: past Gopher min_words
    rows = []
    for i in range(30):
        host = "a.ex.com" if i % 2 == 0 else "b.ex.com"
        path = "/private/p" if i in (5, 7) else f"/page/{i}"
        body = body_words if i in (20, 21) else f"{body_words} variant{i} extra{i}"
        rows.append((f"https://{host}{path}", _mk_html(i, body)))
    return spark.createDataFrame(rows, "url string, html string")


def test_full_chain(spark, crawl, tmp_path):
    robots = spark.createDataFrame(
        [
            ("a.ex.com", "User-agent: *\nAllow: /\nSitemap: https://a.ex.com/smi.xml"),
            ("b.ex.com", "User-agent: *\nDisallow: /private"),
        ],
        "host string, robots_txt string",
    )

    # -- discovery chain: robots → index → leaves
    sm_urls = {r["sitemap_url"] for r in robots_sitemap_urls(robots).collect()}
    assert sm_urls == {"https://a.ex.com/smi.xml"}
    fetched_index = spark.createDataFrame(
        [("a.ex.com",
          "<sitemapindex><sitemap><loc>https://a.ex.com/s1.xml</loc></sitemap>"
          "</sitemapindex>")],
        "host string, xml string",
    )
    children = parse_sitemap_index(fetched_index, "host", "xml").collect()
    assert [c["sitemap_url"] for c in children] == ["https://a.ex.com/s1.xml"]
    leaves = spark.createDataFrame(
        [("a.ex.com",
          "<urlset><url><loc>https://a.ex.com/page/0</loc></url></urlset>")],
        "host string, xml string",
    )
    assert parse_sitemaps(leaves, "host", "xml").count() == 1

    # -- politeness gate drops the disallowed pages before any tokenizer spend
    rules = parse_robots(robots)
    verdicts = apply_robots(crawl, "url", "url", rules)
    gated = crawl.join(
        verdicts.filter(F.col("allowed")).select(F.col("doc_key").alias("url")),
        "url",
    )
    assert gated.count() == 28  # 2 /private pages on host b dropped

    # -- html → text → unicode fix
    text = extract_html_text(gated, "url", "html").select(
        F.col("doc_key").alias("url"), "text"
    )
    text = unicode_fix(text, "url", "text").select(
        F.col("doc_key").alias("url"), F.col("fixed_text").alias("text")
    )

    # -- corpus-wide line dedup kills the cookie banner everywhere but its
    # first (url, pos) occurrence
    deduped = dedup_lines_global(text, "url", "text").select(
        F.col("doc_key").alias("url"), "text"
    )
    with_banner = deduped.filter(F.col("text").contains(BOILER)).count()
    assert with_banner == 1

    # -- Gopher quality gate (whitespace-language text; stop words present)
    sig = gopher_quality(deduped, "url", "text")
    kept = deduped.join(
        sig.filter(F.col("gopher_pass")).select(F.col("doc_key").alias("url")),
        "url",
    )
    assert 0 < kept.count() <= 28

    # -- exact dedup flags the duplicate pair (post-banner-strip identical)
    dups = exact_duplicates(kept, "url", "text").collect()
    dup_urls = {d["representative"] for d in dups}
    assert all("/page/2" in u for u in dup_urls) or len(dups) <= 1

    # -- build + search the surviving corpus
    pages = kept.select("url", "text", F.lit("en").alias("lang"))
    out = str(tmp_path / "webidx")
    meta = build_index(spark, pages, out)
    assert meta.n_docs == kept.count()
    eng = SearchEngine(spark, out)
    hits = eng.search_page("merge join", k=5)
    assert len(hits) == 5 and hits[0]["score"] >= hits[-1]["score"]
    # a dropped /private page never reaches the index
    assert eng.doc_stats.filter(F.col("url").contains("/private")).count() == 0
