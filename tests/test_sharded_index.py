"""Sharded serving (the horizontal-scale story): build_sharded_index splits
one corpus into self-contained shard indexes scored with GLOBAL statistics;
federated_search(normalize=False) over the shards must reproduce the
monolithic index's top-k urls AND scores exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index, load_meta
from meilisearch_thai_spark.index.sharded import build_sharded_index, shard_dir
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.query.federation import federated_search
from meilisearch_thai_spark.sources.pages import generate_pages

N = 500
N_SHARDS = 3


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded")
    mono = str(root / "mono")
    shroot = str(root / "shards")
    pages = generate_pages(spark, N, seed=21).persist()
    pages.count()
    build_index(spark, pages, mono)
    metas = build_sharded_index(spark, pages, shroot, N_SHARDS)
    pages.unpersist()
    return mono, shroot, metas


def test_shard_metas_carry_global_stats(spark, built):
    mono, shroot, metas = built
    mm = load_meta(mono)
    assert len(metas) == N_SHARDS
    for s, m in enumerate(metas):
        assert m.sharding == {"n_shards": N_SHARDS, "shard": s}
        assert m.n_docs == mm.n_docs == N
        assert abs(m.avgdl - mm.avgdl) < 1e-12
    # every document lands in exactly one shard
    total = sum(
        spark.read.parquet(f"{shard_dir(shroot, s)}/doc_stats").count()
        for s in range(N_SHARDS)
    )
    assert total == N


def test_shard_postings_carry_global_df(spark, built):
    mono, shroot, _ = built
    gdf = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{mono}/postings")
        .select("term", "df")
        .distinct()
        .collect()
    }
    sdf = (
        spark.read.parquet(*[f"{shard_dir(shroot, s)}/postings" for s in range(N_SHARDS)])
        .select("term", "df")
        .distinct()
        .collect()
    )
    for r in sdf:
        assert gdf[r["term"]] == r["df"], r["term"]


@pytest.mark.parametrize("query", ["ปัญญาประดิษฐ์", "อาหารไทย ตลาด"])
def test_federated_shards_match_monolithic_exactly(spark, built, query):
    from meilisearch_thai_spark.tokenizer import extract_index_terms, tokenize_for_index

    mono, shroot, _ = built
    terms = extract_index_terms(tokenize_for_index(query))
    mono_eng = SearchEngine(spark, mono, cache_postings=False)
    expected = [
        (r["url"], round(r["score"], 4))
        for r in mono_eng.search_terms(terms, k=10).collect()
    ]
    engines = {
        f"s{s}": SearchEngine(spark, shard_dir(shroot, s), cache_postings=False)
        for s in range(N_SHARDS)
    }
    got_df = federated_search(engines, terms, k=10, normalize=False)
    got = [(r["url"], r["federated_score"]) for r in got_df.collect()]
    assert got == expected  # urls AND scores, in order — exact parity


def test_federated_normalized_mode_unchanged(spark, built):
    """The default (normalize=True) mode still max-normalizes per index —
    each index's best hit scores exactly its weight."""
    _, shroot, _ = built
    engines = {
        f"s{s}": SearchEngine(spark, shard_dir(shroot, s), cache_postings=False)
        for s in range(N_SHARDS)
    }
    rows = federated_search(engines, ["ปัญญาประดิษฐ์"], k=30).collect()
    best = {}
    for r in rows:
        best.setdefault(r["index_uid"], r["federated_score"])
    assert all(v == 1.0 for v in best.values())


def test_empty_shards_and_rebuild_into_same_root(spark, tmp_path):
    """Review regression: n_shards > n_docs leaves some shards empty (they
    must still be well-formed, servable, and federable), and re-building
    into the same out_root must not crash on existing doc_stats dirs."""
    root = str(tmp_path / "tiny_shards")
    pages = generate_pages(spark, 3, seed=3)
    metas = build_sharded_index(spark, pages, root, 5)
    assert len(metas) == 5
    engines = {}
    for s in range(5):
        d = shard_dir(root, s)
        assert spark.read.parquet(f"{d}/doc_stats").columns == [
            "doc_id", "url", "lang", "doc_len", "norm_hash",
        ]
        engines[f"s{s}"] = SearchEngine(spark, d, cache_postings=False)
    total = sum(
        spark.read.parquet(f"{shard_dir(root, s)}/doc_stats").count() for s in range(5)
    )
    assert total == 3
    # empty shards federate without error
    federated_search(engines, ["ปัญญาประดิษฐ์"], k=5, normalize=False).collect()
    # idempotent rebuild into the same root
    metas2 = build_sharded_index(spark, pages, root, 5)
    assert [m.n_docs for m in metas2] == [3] * 5
