"""Warm serving tier + bounded vocabulary (VERDICT r1 item 5, the two
scale-killers).

The warm tier is the decoded in-memory twin of the compressed postings; a
point query over it must return EXACTLY what the block-max python path
returns.  The driver vocabulary is capped by descending df with a
distributed fallback, so no full-vocab collect exists on any path.
"""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine, _edit_distance_within
from meilisearch_thai_spark.sources.pages import generate_pages

N_DOCS = 800

QUERIES = ["ปัญญาประดิษฐ์", "อาหารไทย", "เทคโนโลยี", "machine learning", "Startup ไทย"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_warm"))
    build_index(spark, generate_pages(spark, N_DOCS, seed=21), out, bucket_span=256)
    return out


def test_warm_path_matches_blockmax_path(spark, idx):
    warm = SearchEngine(spark, idx, cache_postings=True)
    cold = SearchEngine(spark, idx, cache_postings=False)
    assert warm._warm_enabled and not cold._warm_enabled
    for q in QUERIES:
        a = [(r["doc_id"], round(r["score"], 6)) for r in warm.search(q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 6)) for r in cold.search(q, k=10).collect()]
        assert a == b, q
    # warm tier materialized once, row count == total postings
    assert warm._warm is not None
    assert warm._warm.count() == warm.meta.n_postings
    warm.postings.unpersist()
    warm.doc_stats.unpersist()
    warm._warm.unpersist()


def test_warm_multi_variant_matches(spark, idx):
    warm = SearchEngine(spark, idx, cache_postings=True)
    cold = SearchEngine(spark, idx, cache_postings=False)
    for q in ["อาหารไทย", "เทคโนโลยี การเรียนรู้"]:
        a = [(r["doc_id"], round(r["score"], 6)) for r in warm.multi_variant_search(q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 6)) for r in cold.multi_variant_search(q, k=10).collect()]
        assert a == b, q
    warm.postings.unpersist()
    warm.doc_stats.unpersist()
    if warm._warm is not None:
        warm._warm.unpersist()


def test_vocab_bounded_and_truncation_flag(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False, vocab_cap=50)
    v = eng.vocabulary()
    assert len(v) == 50 and eng._vocab_truncated
    assert v == sorted(v)
    # capped by df: every kept term at least as frequent as the global median
    full = SearchEngine(spark, idx, cache_postings=False)
    assert len(full.vocabulary()) > 50 and not full._vocab_truncated


def test_spark_fallback_expansion(spark, idx):
    tiny = SearchEngine(spark, idx, cache_postings=False, vocab_cap=10)
    full = SearchEngine(spark, idx, cache_postings=False)
    # a Thai token whose expansions exist in the full vocab but (almost
    # surely) not in a 10-term head: the driver miss must fall through to
    # the distributed lookup and still find them
    probe = "อาหาร"
    distributed = tiny.expand_terms_spark(probe, max_expansions=5)
    assert all(probe in t and t != probe for t in distributed)
    if any(probe in t and t != probe for t in full.vocabulary()):
        assert distributed, "distributed expansion found nothing"
        assert tiny.expand_terms(probe, max_expansions=5), "fallback not wired"


def test_fuzzy_length_bands_equal_brute_scan(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    vocab = eng.vocabulary()
    for tok in ("starup", "machne", "leerning"):
        banded = set(eng.expand_terms_fuzzy(tok, max_expansions=100))
        budget = 2 if len(tok) >= 9 else 1
        brute = {
            t
            for t in vocab
            if t != tok and t.isascii() and _edit_distance_within(tok, t, budget)
        }
        assert banded == brute, tok
