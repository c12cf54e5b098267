"""End-to-end: synthetic pages → index build → BM25 top-k, rank-identical to
the brute-force oracle on reference-style Thai/mixed queries (SURVEY §5)."""

from __future__ import annotations

import math

import pytest

from meilisearch_thai_spark.index.builder import build_index, load_meta
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.query.oracle import BM25Oracle
from meilisearch_thai_spark.sources.pages import generate_pages

N_DOCS = 1200

QUERIES = [
    "ปัญญาประดิษฐ์",
    "การเรียนรู้",
    "เทคโนโลยี",
    "อาหารไทย",
    "ต้มยำกุ้ง",
    "วากาเมะ",
    "สาหร่ายวากาเมะ",
    "ตลาดหุ้น",
    "เชียงใหม่",
    "Startup ไทย",
    "machine learning",
    "ร้านอาหารในกรุงเทพฯ",
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    pages = generate_pages(spark, N_DOCS, seed=42)
    meta = build_index(spark, pages, out, bucket_span=256)  # small span: many buckets
    corpus = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    return out, meta, corpus


def test_meta_sane(built):
    out, meta, corpus = built
    assert meta.n_docs == N_DOCS
    assert meta.avgdl > 5
    assert meta.n_terms > 50
    assert meta.n_postings > N_DOCS
    assert load_meta(out).dictionary_fingerprint == meta.dictionary_fingerprint


def test_doc_ids_dense_and_stable(spark, built):
    out, meta, corpus = built
    ds = spark.read.parquet(out + "/doc_stats")
    ids = [r["doc_id"] for r in ds.select("doc_id").collect()]
    assert sorted(ids) == list(range(N_DOCS))
    # ids follow url sort order (range partition + within-partition sort)
    rows = ds.select("url", "doc_id").orderBy("url").collect()
    assert [r["doc_id"] for r in rows] == list(range(N_DOCS))


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_vs_oracle(spark, built, query):
    out, meta, corpus = built
    oracle = BM25Oracle(corpus)
    engine = SearchEngine(spark, out, cache_postings=False)
    expected = oracle.top_k(query, k=10)
    got = [(r["url"], r["score"]) for r in engine.search(query, k=10).collect()]
    assert [u for u, _ in got] == [u for u, _ in expected], query
    for (gu, gs), (eu, es) in zip(got, expected):
        assert math.isclose(gs, es, rel_tol=1e-9), (query, gu, gs, es)


def test_conjunctive_matching(spark, built):
    out, meta, corpus = built
    oracle = BM25Oracle(corpus)
    engine = SearchEngine(spark, out, cache_postings=False)
    q = "อาหารไทยอร่อย"
    expected = oracle.top_k(q, k=10, matching="all")
    got = [(r["url"], r["score"]) for r in engine.search(q, k=10, matching="all").collect()]
    assert [u for u, _ in got] == [u for u, _ in expected]


def test_generation_deterministic_across_parallelism(spark, built):
    # same (seed,row_id) -> same row regardless of partition count
    a = generate_pages(spark, 50, seed=42, partitions=2).select("url", "text", "lang").collect()
    b = generate_pages(spark, 50, seed=42, partitions=16).select("url", "text", "lang").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_doc_ids_dense_unique_any_parallelism(spark):
    """doc_id = global url rank: dense, unique, and identical regardless of
    partitioning (regression: unpersisted repartitionByRange re-samples
    boundaries per job, which once produced duplicate ids)."""
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import tokenized_docs

    pages = generate_pages(spark, 5000, seed=9)
    for parts in (3, 17):
        caches = []
        d = tokenized_docs(pages, partitions=parts, _caches=caches)
        r = d.select(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
            F.bit_xor(F.xxhash64("doc_id", "url")).alias("dig"),
        ).collect()[0]
        assert (r["n"], r["nd"], r["mn"], r["mx"]) == (5000, 5000, 0, 4999)
        for c in caches:
            c.unpersist()
