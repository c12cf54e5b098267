"""Golden parity against the reference's OWN corpus and query set.

Loads the reference's sample documents (data/samples/thai_documents.json —
the MeiliSearch-format corpus its integration tests index) through this
engine's reference-format ingest, builds a positional index, and replays the
reference's golden query corpus (data/samples/test_queries.json: 35 typed
queries with expected_results doc-id lists).

Read directly from /root/reference (read-only fixtures, skipped when absent)
— the north rule's "matching the reference's top-k on the reference query
set" made executable.
"""

from __future__ import annotations

import json
import os

import pytest

REF_SAMPLES = "/root/reference/data/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SAMPLES), reason="reference samples not available"
)


def _load_docs():
    docs = []
    for fn in ("thai_documents.json", "formal_documents.json", "informal_documents.json"):
        p = os.path.join(REF_SAMPLES, fn)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as fh:
                payload = json.load(fh)
            docs.extend(payload if isinstance(payload, list) else payload.get("documents", []))
    # keep first occurrence per id (files may overlap)
    seen, out = set(), []
    for d in docs:
        if d.get("id") and d["id"] not in seen:
            seen.add(d["id"])
            out.append(d)
    return out


def _load_queries():
    with open(os.path.join(REF_SAMPLES, "test_queries.json"), encoding="utf-8") as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from meilisearch_thai_spark.query.executor import SearchEngine
    from meilisearch_thai_spark.sources import documents as D

    docs = _load_docs()
    assert len(docs) >= 15
    df = D.documents_from_list(
        spark,
        [
            {
                "id": d["id"],
                "title": d.get("title"),
                "content": d.get("content"),
                "metadata": {},
            }
            for d in docs
        ],
    )
    out = str(tmp_path_factory.mktemp("golden_idx"))
    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.sources.documents import documents_to_pages, validate_documents

    ok, bad = validate_documents(df)
    assert bad.count() == 0
    build_index(spark, documents_to_pages(ok), out, positional=True)
    return SearchEngine(spark, out, cache_postings=False)


def _hit_ids(engine, query, k=10):
    rows = engine.multi_variant_search(query, k=k).collect()
    return [r["url"].removeprefix("doc://") for r in rows]


def test_golden_recall(engine):
    """Every golden query whose expected docs exist in the corpus must
    surface at least one of them in the top-10; basic-difficulty queries
    must surface ALL of them."""
    queries = _load_queries()
    corpus_ids = set()
    for d in _load_docs():
        corpus_ids.add(d["id"])
    misses, total = [], 0
    for q in queries:
        expected = [e for e in q.get("expected_results", []) if e in corpus_ids]
        if not expected:
            continue
        total += 1
        got = _hit_ids(engine, q["query"])
        found = [e for e in expected if e in got]
        if q.get("difficulty") == "basic":
            if set(found) != set(expected):
                misses.append((q["query"], q["search_type"], expected, got[:5]))
        elif not found:
            misses.append((q["query"], q["search_type"], expected, got[:5]))
    assert total >= 25
    assert not misses, f"golden failures ({len(misses)}/{total}): {misses[:5]}"


def test_golden_exact_compound_top1(engine):
    """Single-expectation exact_compound queries rank their doc first."""
    for q in _load_queries():
        if q.get("search_type") == "exact_compound" and len(q.get("expected_results", [])) == 1:
            got = _hit_ids(engine, q["query"], k=5)
            assert got and got[0] == q["expected_results"][0], (q["query"], got)


def test_golden_wakame_suite(engine):
    """The wakame compound queries (seaweed_* docs) — the reference's
    flagship integration scenario (tests/integration/test_wakame_compound_words.py)."""
    got = _hit_ids(engine, "สาหร่ายวากาเมะ", k=10)
    assert any(g.startswith("seaweed_") for g in got)
    got = _hit_ids(engine, "วากาเมะ", k=10)
    assert any(g.startswith("seaweed_") for g in got)
