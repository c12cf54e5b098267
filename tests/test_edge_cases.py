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


def test_pathological_head_term_skew(spark, tmp_path):
    """A term present in EVERY doc (worst-case Zipf head): the salted
    (term, bucket) merge must spread its postings across many bounded groups,
    and querying the hot term must still return exact top-k."""
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.sources.pages import generate_pages

    # prepend the hot dictionary word to every generated page
    pages = generate_pages(spark, 4000, seed=77).withColumn(
        "text", F.concat(F.lit("ประเทศไทย"), F.col("text"))
    )
    out = str(tmp_path / "idx")
    meta = build_index(spark, pages, out, bucket_span=256)  # small span: many buckets
    pst = spark.read.parquet(out + "/postings").filter(F.col("term") == "ประเทศไทย")
    stats = pst.agg(
        F.countDistinct("bucket").alias("nb"),
        F.sum("n_docs").alias("np"),
        F.max("n_docs").alias("mx"),
    ).collect()[0]
    assert stats["np"] == 4000  # every doc posts the hot term
    assert stats["nb"] >= 10  # spread across many salt buckets...
    assert stats["mx"] <= 128  # ...with bounded blocks
    eng = SearchEngine(spark, out, cache_postings=False)
    hits = eng.search("ประเทศไทย", k=10).collect()
    assert len(hits) == 10
    assert all(h["terms_matched"] == 1 for h in hits)
    # idf of an everywhere-term is ~log(1+ (0.5/ (N+0.5))) ≈ tiny but > 0
    assert 0 < hits[0]["score"] < 0.01
