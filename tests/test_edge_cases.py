"""Robustness edges: degenerate corpora and exotic unicode through the full
build → search path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import PAGES_SCHEMA


def _pages(spark, rows):
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_single_doc_corpus(spark, tmp_path):
    import datetime

    rows = [("https://x/1", datetime.datetime(2024, 1, 1), b"", "สวัสดีครับ ประเทศไทย", "th")]
    meta = build_index(spark, _pages(spark, rows), str(tmp_path / "idx"))
    assert meta.n_docs == 1 and meta.n_postings > 0
    eng = SearchEngine(spark, str(tmp_path / "idx"), cache_postings=False)
    hits = eng.search("ประเทศไทย", k=5).collect()
    assert len(hits) == 1 and hits[0]["doc_id"] == 0


def test_empty_and_whitespace_docs(spark, tmp_path):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://x/1", ts, b"", "", "th"),
        ("https://x/2", ts, b"", "   ", "th"),
        ("https://x/3", ts, b"", "ปัญญาประดิษฐ์", "th"),
    ]
    meta = build_index(spark, _pages(spark, rows), str(tmp_path / "idx"))
    assert meta.n_docs == 3  # empty docs keep their identity (doc_stats rows)
    eng = SearchEngine(spark, str(tmp_path / "idx"), cache_postings=False)
    hits = eng.search("ปัญญาประดิษฐ์", k=5).collect()
    assert [h["url"] for h in hits] == ["https://x/3"]


def test_exotic_unicode_roundtrip(spark, tmp_path):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    weird = "สวัสดี 👋🏽 ครับ ​中文 русский ١٢٣ é"
    rows = [("https://x/u", ts, b"", weird, "th-en")]
    meta = build_index(spark, _pages(spark, rows), str(tmp_path / "idx"))
    assert meta.n_docs == 1
    eng = SearchEngine(spark, str(tmp_path / "idx"), cache_postings=False)
    # the Thai words still index and match
    assert eng.search("สวัสดี", k=3).collect()
    # no crash on emoji / rtl / combining queries, just empty or typed results
    for q in ("👋🏽", "中文", "é"):
        eng.search(q, k=3).collect()


def test_duplicate_urls_last_distinct_ids(spark, tmp_path):
    """Same url twice in the batch input: ids stay dense (both rows ranked) —
    dedup is the ingest layer's job (documents.validate / streaming latest-
    batch), the core build never silently drops rows."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://x/1", ts, b"", "ปัญญาประดิษฐ์", "th"),
        ("https://x/1", ts, b"", "ปัญญาประดิษฐ์", "th"),
    ]
    meta = build_index(spark, _pages(spark, rows), str(tmp_path / "idx"))
    assert meta.n_docs == 2
    stats = spark.read.parquet(str(tmp_path / "idx" / "doc_stats"))
    ids = [r["doc_id"] for r in stats.select("doc_id").collect()]
    assert sorted(ids) == [0, 1]
