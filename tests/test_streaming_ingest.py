"""Streaming ingest equals batch build: stream page dumps in two drops
(including a re-crawled url), finalize, and compare against a one-shot
``build_index`` over the logically-identical corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages
from meilisearch_thai_spark.streaming.ingest import finalize_streamed_index, start_ingest_stream

N = 600


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inbox = str(root / "inbox")
    out_stream = str(root / "idx_stream")
    out_batch = str(root / "idx_batch")

    pages = generate_pages(spark, N, seed=31).persist()

    # deterministic split into two "crawl drops" by url hash parity
    half = pages.withColumn("_h", F.pmod(F.xxhash64("url"), F.lit(2)))
    drop1 = half.filter(F.col("_h") == 0).drop("_h")
    drop2 = half.filter(F.col("_h") == 1).drop("_h")
    # re-crawl: one url from drop1 appears again in drop2 with the SAME
    # content (latest batch wins; content identical keeps batch-parity)
    recrawl = drop1.orderBy("url").limit(1)
    drop2 = drop2.unionByName(recrawl)

    drop1.write.mode("overwrite").parquet(os.path.join(inbox, "drop1"))
    q = start_ingest_stream(spark, inbox + "/*", out_stream, n_shards=4)
    q.awaitTermination(120)
    drop2.write.mode("overwrite").parquet(os.path.join(inbox, "drop2"))
    q = start_ingest_stream(spark, inbox + "/*", out_stream, n_shards=4)
    q.awaitTermination(180)

    meta_stream = finalize_streamed_index(spark, out_stream)
    meta_batch = build_index(spark, pages, out_batch)
    pages.unpersist()
    return out_stream, out_batch, meta_stream, meta_batch


def test_meta_identical(built):
    _, _, ms, mb = built
    assert ms.n_docs == mb.n_docs == N
    assert ms.avgdl == pytest.approx(mb.avgdl)
    assert ms.n_terms == mb.n_terms
    assert ms.n_postings == mb.n_postings


def test_doc_stats_identical(spark, built):
    out_stream, out_batch, *_ = built
    cols = ["doc_id", "url", "doc_len", "norm_hash"]
    a = spark.read.parquet(f"{out_stream}/doc_stats").select(cols)
    b = spark.read.parquet(f"{out_batch}/doc_stats").select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_postings_identical(spark, built):
    out_stream, out_batch, *_ = built
    cols = ["term", "bucket", "block_id", "first_doc", "n_docs", "doc_bytes", "tf_bytes", "df"]
    a = spark.read.parquet(f"{out_stream}/postings").select(cols)
    b = spark.read.parquet(f"{out_batch}/postings").select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_lineage_records_per_batch(built):
    out_stream, *_ = built
    ldir = os.path.join(out_stream, "lineage")
    recs = [f for f in os.listdir(ldir) if f.startswith("stream-batch-")]
    assert len(recs) >= 2  # at least one batch per drop


def test_within_batch_duplicate_url_keeps_latest(spark, tmp_path_factory):
    """A single micro-batch containing the SAME url twice must not sum tf
    across the duplicates (that corrupts doc_len/BM25); last crawl by warc_ts
    wins, uniform with the cross-batch latest-batch rule."""
    from datetime import datetime

    root = tmp_path_factory.mktemp("stream_dup")
    inbox = str(root / "inbox")
    out = str(root / "idx")
    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0), b"", "เทคโนโลยี", "th"),
        ("u1", datetime(2024, 1, 2, 0, 0), b"", "อาหารไทยอาหารไทย", "th"),  # later crawl
        ("u2", datetime(2024, 1, 1, 0, 0), b"", "เทคโนโลยี", "th"),
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(inbox, "drop"))
    q = start_ingest_stream(spark, inbox + "/*", out, n_shards=2)
    q.awaitTermination(120)
    meta = finalize_streamed_index(spark, out)
    assert meta.n_docs == 2
    eng = SearchEngine(spark, out, cache_postings=False)
    dls = {r["url"]: r["doc_len"] for r in eng.doc_stats.select("url", "doc_len").collect()}
    assert dls["u1"] == 2  # the LATER crawl's two terms, not a 3-term merge
    assert not eng.search("เทคโนโลยี", k=5).filter(F.col("url") == "u1").collect()


def test_streamed_index_queryable(spark, built):
    out_stream, out_batch, *_ = built
    es = SearchEngine(spark, out_stream, cache_postings=False)
    eb = SearchEngine(spark, out_batch, cache_postings=False)
    for q in ["ปัญญาประดิษฐ์", "อาหารไทย", "เทคโนโลยี"]:
        a = [(r["url"], round(r["score"], 9)) for r in es.search(q, k=5).collect()]
        b = [(r["url"], round(r["score"], 9)) for r in eb.search(q, k=5).collect()]
        assert a == b


def test_stream_transform_hygiene(spark, tmp_path):
    """The per-batch transform seam: clean_corpus on a live stream strips
    boilerplate before staging, so it never reaches the posting vocabulary;
    gate-dropped rows are never staged."""
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.pipeline.webtext import clean_corpus
    from meilisearch_thai_spark.query.executor import SearchEngine

    src = str(tmp_path / "in")
    out = str(tmp_path / "idx")
    boiler = "accept cookies now"
    rows = [
        (f"https://t/{i}", None, None, f"{boiler}\nเนื้อหาจริง เรื่องที่ {i}", "th")
        for i in range(1, 7)
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(src)
    q = start_ingest_stream(
        spark, src, out,
        n_shards=2,
        transform=lambda df: clean_corpus(df, "url", "text", min_df=3, mask=False),
    )
    q.awaitTermination(120)
    meta = finalize_streamed_index(spark, out)
    assert meta.n_docs == 6
    vocab = {
        r.term
        for r in spark.read.parquet(f"{out}/postings").select("term").distinct().collect()
    }
    assert "cookies" not in vocab and "accept" not in vocab
    # the compound segments; search through the full query pipeline so the
    # cleaned content is provably still queryable
    from meilisearch_thai_spark.query.executor import SearchEngine as _SE

    hits = _SE(spark, out, cache_postings=False).search("เนื้อหาจริง", k=6).collect()
    assert hits
