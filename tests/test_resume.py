"""Resumable build: kill after the first batch, resume, assert the final
index is identical to a clean one-shot build (SURVEY §5 test plan item 4;
north rule: checkpoint-resumable with per-partition lineage + metrics)."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.index.lineage import (
    ShardCommitError,
    build_index_resumable,
    completed_shards,
    read_lineage,
)
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages

N_DOCS = 800
N_SHARDS = 8
BATCH = 2

QUERIES = ["ปัญญาประดิษฐ์", "อาหารไทย", "สาหร่ายวากาเมะ", "เทคโนโลยี"]


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    clean = str(tmp_path_factory.mktemp("idx_clean"))
    resumed = str(tmp_path_factory.mktemp("idx_resumed"))
    pages = generate_pages(spark, N_DOCS, seed=5)

    meta_clean = build_index(spark, pages, clean)

    # crash after the first committed batch…
    with pytest.raises(ShardCommitError):
        build_index_resumable(
            spark, pages, resumed, n_shards=N_SHARDS, shard_batch_size=BATCH, fail_after_batches=1
        )
    partial = completed_shards(resumed, N_SHARDS)
    # …then resume to completion
    meta_resumed = build_index_resumable(
        spark, pages, resumed, n_shards=N_SHARDS, shard_batch_size=BATCH
    )
    return clean, resumed, meta_clean, meta_resumed, partial


def test_partial_state_after_crash(dirs):
    *_, partial = dirs
    assert len(partial) == BATCH, "exactly one batch committed before the crash"


def test_lineage_metrics_written(dirs):
    _, resumed, _, _, _ = dirs
    recs = read_lineage(resumed)
    assert len(recs) == N_SHARDS
    assert sum(r["batch_n_docs"] for r in recs) > 0
    assert all("wall_sec" in r for r in recs)
    assert len(completed_shards(resumed, N_SHARDS)) == N_SHARDS


def test_meta_identical(dirs):
    _, _, mc, mr, _ = dirs
    assert mc.n_docs == mr.n_docs
    assert mc.avgdl == pytest.approx(mr.avgdl)
    assert mc.n_terms == mr.n_terms
    assert mc.n_postings == mr.n_postings
    assert mc.dictionary_fingerprint == mr.dictionary_fingerprint


def test_doc_stats_identical(spark, dirs):
    clean, resumed, *_ = dirs
    a = spark.read.parquet(f"{clean}/doc_stats").select("doc_id", "url", "doc_len", "norm_hash")
    b = spark.read.parquet(f"{resumed}/doc_stats").select("doc_id", "url", "doc_len", "norm_hash")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rank_identical_queries(spark, dirs):
    clean, resumed, *_ = dirs
    ec, er = SearchEngine(spark, clean), SearchEngine(spark, resumed)
    for q in QUERIES:
        rc = [(r["doc_id"], round(r["score"], 6)) for r in ec.search(q, k=10).collect()]
        rr = [(r["doc_id"], round(r["score"], 6)) for r in er.search(q, k=10).collect()]
        assert rc == rr, f"rank mismatch for {q!r}"


def test_rerun_is_noop_fast(spark, dirs):
    """A third run over a complete index skips all phase-1 work."""
    _, resumed, _, mr, _ = dirs
    pages = generate_pages(spark, N_DOCS, seed=5)
    meta = build_index_resumable(spark, pages, resumed, n_shards=N_SHARDS, shard_batch_size=BATCH)
    assert meta.n_postings == mr.n_postings
