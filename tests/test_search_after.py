"""Keyset (cursor) pagination: stable total order, page disjointness, full
coverage to exhaustion — the deep-pagination surface offset cannot sustain."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_sa") / "idx")
    build_index(spark, generate_pages(spark, 400, seed=21), out, bucket_span=128)
    return SearchEngine(spark, out, cache_postings=False)


def _term(eng):
    from pyspark.sql import functions as F

    return eng.postings.groupBy("term").agg(F.max("df").alias("df")).orderBy(
        F.desc("df"), F.asc("term")
    ).limit(1).collect()[0]["term"]


def test_pages_partition_the_full_result(spark, eng):
    t = _term(eng)
    full = [(r["url"], r["score"]) for r in eng.search_after([t], k=10**6).collect()]
    assert len(full) > 20
    # order is (rounded score desc, url asc) — total and deterministic
    assert full == sorted(full, key=lambda x: (-x[1], x[0]))
    pages, cursor = [], None
    while True:
        rows = eng.search_after([t], cursor=cursor, k=7).collect()
        if not rows:
            break
        pages.extend((r["url"], r["score"]) for r in rows)
        cursor = (rows[-1]["score"], rows[-1]["url"])
    # exhaustive walk == one-shot enumeration: nothing lost, nothing repeated
    assert pages == full


def test_cursor_excludes_self_and_ties_break_by_url(spark, eng):
    t = _term(eng)
    p1 = eng.search_after([t], k=5).collect()
    cursor = (p1[-1]["score"], p1[-1]["url"])
    p2 = eng.search_after([t], cursor=cursor, k=5).collect()
    assert {r["url"] for r in p1}.isdisjoint({r["url"] for r in p2})
    # any tie straddling the page break respects url order
    for r in p2:
        assert (-r["score"], r["url"]) > (-cursor[0], cursor[1])


def test_search_after_with_filters(spark, eng):
    t = _term(eng)
    filt = {"lang": {"$in": ["th", "th-en"]}}
    p1 = eng.search_after([t], k=4, filters=filt, attributes_to_retrieve=["lang"]).collect()
    assert p1 and all(r["lang"] in ("th", "th-en") for r in p1)
    p2 = eng.search_after(
        [t], cursor=(p1[-1]["score"], p1[-1]["url"]), k=4, filters=filt,
        attributes_to_retrieve=["lang"],
    ).collect()
    assert all(r["lang"] in ("th", "th-en") for r in p2)
    assert {r["url"] for r in p1}.isdisjoint({r["url"] for r in p2})


def test_search_after_stopword_terms_cursor_yields_empty(spark, tmp_path):
    """A cursor must never be silently dropped: termless (all-stopword)
    queries return page 1 as-is but an explicit cursor walk terminates."""
    from meilisearch_thai_spark.index.builder import build_index

    out = str(tmp_path / "idx_sw2")
    build_index(
        spark, generate_pages(spark, 200, seed=42), out, stopwords=["ไทย"]
    )
    e = SearchEngine(spark, out, cache_postings=False)
    assert e.search_after(["ไทย"], cursor=(1.0, "u"), k=5).collect() == []
    assert e.search_after(["ไทย"], k=5).collect() == []
