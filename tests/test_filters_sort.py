"""P4 filters + P6 sort wired into the search path (VERDICT r1 item 2).

Exactness oracle: the filtered top-k must equal the unfiltered FULL ranking
restricted client-side to the allowed docs — the filter prunes candidates but
never changes BM25 scores (corpus-wide stats), mirroring the reference's
MeiliSearch filter semantics (search_executor.py:721-764, 766-843).
"""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages

N_DOCS = 600


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_fs"))
    pages = generate_pages(spark, N_DOCS, seed=7)
    build_index(spark, pages, out, bucket_span=128)
    eng = SearchEngine(spark, out, cache_postings=False)
    stats = {
        r["doc_id"]: (r["lang"], r["doc_len"])
        for r in eng.doc_stats.select("doc_id", "lang", "doc_len").collect()
    }
    return eng, stats


QUERY = "เทคโนโลยี"


def test_filter_restricts_and_preserves_scores(built):
    eng, stats = built
    hits = eng.search(QUERY, k=10, filters={"lang": {"$eq": "th"}}).collect()
    assert hits, "filtered search returned nothing"
    assert all(stats[r["doc_id"]][0] == "th" for r in hits)
    # exactness: equals the unfiltered full ranking restricted to th docs
    full = eng.search(QUERY, k=N_DOCS).collect()
    expect = [
        (r["doc_id"], round(r["score"], 9))
        for r in full
        if stats[r["doc_id"]][0] == "th"
    ][:10]
    got = [(r["doc_id"], round(r["score"], 9)) for r in hits]
    assert got == expect


def test_filter_in_operator(built):
    eng, stats = built
    hits = eng.search(QUERY, k=10, filters={"lang": {"$in": ["th", "th-en"]}}).collect()
    assert hits and all(stats[r["doc_id"]][0] in ("th", "th-en") for r in hits)


def test_filter_no_match_returns_empty(built):
    eng, _ = built
    assert eng.search(QUERY, k=5, filters={"lang": {"$eq": "xx"}}).collect() == []


def test_sort_orders_by_doc_field(built):
    eng, stats = built
    hits = eng.search(QUERY, k=10, sort=["doc_len:desc", "doc_id:asc"]).collect()
    assert hits
    lens = [stats[r["doc_id"]][1] for r in hits]
    assert lens == sorted(lens, reverse=True)
    # oracle: ALL matching docs ordered by (doc_len desc, doc_id asc), cut at k
    full = eng.search(QUERY, k=N_DOCS).collect()
    expect = sorted(
        ((stats[r["doc_id"]][1], r["doc_id"]) for r in full),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(stats[r["doc_id"]][1], r["doc_id"]) for r in hits] == expect


def test_sort_with_filter(built):
    eng, stats = built
    hits = eng.search(
        QUERY, k=5, filters={"lang": {"$eq": "th"}}, sort=["doc_len:asc", "doc_id:asc"]
    ).collect()
    assert hits and all(stats[r["doc_id"]][0] == "th" for r in hits)
    lens = [stats[r["doc_id"]][1] for r in hits]
    assert lens == sorted(lens)


def test_unknown_sort_field_rejected(built):
    eng, _ = built
    with pytest.raises(ValueError, match="sort field"):
        eng.search(QUERY, k=5, sort=["nonexistent:desc"])


def test_multi_variant_search_honors_filters(built):
    eng, stats = built
    hits = eng.multi_variant_search(QUERY, k=10, filters={"lang": {"$eq": "th"}}).collect()
    assert hits and all(stats[r["doc_id"]][0] == "th" for r in hits)
    unfiltered = {r["doc_id"] for r in eng.multi_variant_search(QUERY, k=N_DOCS).collect()}
    assert {r["doc_id"] for r in hits} <= unfiltered


def test_service_passes_filters_and_sort(spark, built):
    from meilisearch_thai_spark.query.service import SearchService

    eng, stats = built
    svc = SearchService.__new__(SearchService)
    svc.engine = eng
    svc.metrics = []
    svc.events = []
    resp = svc.search(QUERY, limit=5, filters={"lang": {"$eq": "th"}})
    assert resp.hits and all(stats[h.doc_id][0] == "th" for h in resp.hits)
    resp2 = svc.search(QUERY, limit=5, sort=["doc_len:desc", "doc_id:asc"])
    lens = [stats[h.doc_id][1] for h in resp2.hits]
    assert lens == sorted(lens, reverse=True)
