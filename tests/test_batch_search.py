"""Batch search (reference POST /api/v1/batch-search,
search_proxy_service.py:267-349): many queries answered with full search
semantics, all scored in ONE Spark job.
"""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.service import SearchService
from meilisearch_thai_spark.sources.pages import generate_pages

# deliberately OVERLAPPING term sets (อาหารไทย twice-ish, shared tokens):
# batch results must match single-query results even when another batch
# member already "saw" a query's terms (expansion suppression must be
# per-query — code-review r2 finding)
QUERIES = ["ปัญญาประดิษฐ์", "อาหารไทย", "อาหาร", "เทคโนโลยี", "machine learning"]


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("svc_batch"))
    build_index(spark, generate_pages(spark, 600, seed=27), out, store_text_crop=400)
    return SearchService(spark, out)


def test_batch_matches_individual_searches(svc):
    batch = svc.batch_search(QUERIES, limit=5, algorithm="optimized_score")
    assert len(batch) == len(QUERIES)
    for q, resp in zip(QUERIES, batch):
        single = svc.search(q, limit=5, algorithm="optimized_score")
        got = [(h.doc_id, round(h.score, 6)) for h in resp.hits]
        want = [(h.doc_id, round(h.score, 6)) for h in single.hits]
        assert got == want, q
        assert resp.query_info["original_query"] == single.query_info["original_query"]


def test_batch_empty_result_query_isolated(svc):
    batch = svc.batch_search(["อาหารไทย", "zzzznothingzzz"], limit=5)
    assert batch[0].hits
    assert batch[1].hits == [] and batch[1].total_unique_hits == 0


def test_batch_validation(svc):
    with pytest.raises(ValueError, match="batch size"):
        svc.batch_search([], limit=5)
    with pytest.raises(ValueError, match="batch size"):
        svc.batch_search(["q"] * 51, limit=5)
    with pytest.raises(ValueError, match="cannot be empty"):
        svc.batch_search(["อาหารไทย", "   "], limit=5)
    with pytest.raises(ValueError, match="too long"):
        svc.batch_search(["x" * 501], limit=5)


def test_batch_records_events_per_query(svc):
    before = len(svc.events)
    svc.batch_search(QUERIES[:2], limit=3, session_id="batch-1")
    assert len(svc.events) == before + 2
    assert all(e["session_id"] == "batch-1" for e in svc.events[-2:])


def test_batch_search_terms_equals_singles(svc):
    """DataFrame-native batch (batch_search_terms): one job, per-query
    top-k identical to N independent search_terms calls."""
    eng = svc.engine
    term_sets = [["ไทย"], ["อาหาร", "ไทย"], ["machine", "learning"]]
    out = eng.batch_search_terms(term_sets, k=8).collect()
    assert {r["query_id"] for r in out} <= {0, 1, 2}
    for qid, ts in enumerate(term_sets):
        got = [(r["url"], round(r["score"], 6)) for r in out if r["query_id"] == qid]
        want = [
            (r["url"], round(r["score"], 6))
            for r in eng.search_terms(ts, k=8).collect()
        ]
        assert got == want, f"query {qid}"


def test_batch_search_terms_validation(svc):
    with pytest.raises(ValueError, match="at least one"):
        svc.engine.batch_search_terms([], k=5)


def test_batch_search_terms_stopwords_equal_singles(spark, tmp_path):
    """Batch == singles on an engine with configured stopwords: the batch
    preamble must drop them exactly like search_terms does."""
    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.executor import SearchEngine
    from meilisearch_thai_spark.sources.pages import generate_pages

    out = str(tmp_path / "idx_sw")
    build_index(
        spark, generate_pages(spark, 300, seed=41), out, stopwords=["ไทย"]
    )
    eng = SearchEngine(spark, out, cache_postings=False)
    term_sets = [["ไทย", "อาหาร"], ["ไทย"]]
    rows = eng.batch_search_terms(term_sets, k=5).collect()
    got0 = [(r["url"], round(r["score"], 6)) for r in rows if r["query_id"] == 0]
    want0 = [
        (r["url"], round(r["score"], 6))
        for r in eng.search_terms(term_sets[0], k=5).collect()
    ]
    assert got0 == want0
    # the all-stopword query contributes no rows, like its single-query twin
    assert [r for r in rows if r["query_id"] == 1] == []
    assert eng.search_terms(term_sets[1], k=5).collect() == []
    # every-query-all-stopwords: empty frame, correct schema, no job blowup
    empty = eng.batch_search_terms([["ไทย"]], k=5)
    assert empty.collect() == []
    assert empty.columns == ["query_id", "url", "doc_id", "score", "terms_matched"]
