"""Incremental add_documents (reference client.py:104-123 add/update
documents by primary key): only new pages are tokenized, re-added urls
overwrite, and the result is byte-identical to a fresh build over the
merged corpus (deterministic doc ids make that checkable exactly)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages
from meilisearch_thai_spark.streaming.ingest import (
    add_documents,
    finalize_streamed_index,
)

N = 400

POSTING_COLS = ["term", "bucket", "block_id", "first_doc", "n_docs", "doc_bytes", "tf_bytes", "df"]


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_pages(spark, N, seed=77).persist()
    pages.count()
    yield pages
    pages.unpersist()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    """Bootstrap with the first 300 urls, then add the remaining 100."""
    root = tmp_path_factory.mktemp("adddocs")
    out = str(root / "idx_inc")
    ref = str(root / "idx_ref")
    first = corpus.orderBy("url").limit(300)
    rest = corpus.orderBy("url").subtract(first)
    m0 = add_documents(spark, first, out, n_shards=4)
    assert m0.n_docs == 300
    meta = add_documents(spark, rest, out, n_shards=4)
    build_index(spark, corpus, ref)
    return out, ref, meta


def test_incremental_equals_fresh_build(spark, built):
    out, ref, meta = built
    assert meta.n_docs == N
    a = spark.read.parquet(f"{out}/postings").select(POSTING_COLS)
    b = spark.read.parquet(f"{ref}/postings").select(POSTING_COLS)
    assert _same(a, b)
    cols = ["doc_id", "url", "doc_len", "norm_hash"]
    assert _same(
        spark.read.parquet(f"{out}/doc_stats").select(cols),
        spark.read.parquet(f"{ref}/doc_stats").select(cols),
    )


def test_adhoc_lineage_and_batch_ids(built):
    out, *_ = built
    recs = sorted(
        f for f in os.listdir(os.path.join(out, "lineage")) if f.startswith("adhoc-batch-")
    )
    assert len(recs) == 2
    ids = [int(r[len("adhoc-batch-") : -len(".json")]) for r in recs]
    assert ids[1] == ids[0] + 1 >= 1_000_000_000


def test_re_add_overwrites_document(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("adddocs_ow")
    out = str(root / "idx")
    ref = str(root / "idx_ref")
    add_documents(spark, corpus, out, n_shards=4)
    # re-add one url with replaced text; a fresh build over the patched
    # corpus must be byte-identical
    victim = corpus.orderBy("url").limit(1)
    patched_row = victim.withColumn("text", F.lit("สาหร่ายวากาเมะ ใหม่ล่าสุด"))
    meta = add_documents(spark, patched_row, out, n_shards=4)
    assert meta.n_docs == N  # overwrite, not append
    patched_corpus = corpus.subtract(victim).unionByName(patched_row)
    build_index(spark, patched_corpus, ref)
    assert _same(
        spark.read.parquet(f"{out}/postings").select(POSTING_COLS),
        spark.read.parquet(f"{ref}/postings").select(POSTING_COLS),
    )
    eng = SearchEngine(spark, out, cache_postings=False)
    url = victim.collect()[0]["url"]
    hits = [r["url"] for r in eng.search("สาหร่ายวากาเมะ ใหม่ล่าสุด", k=3).collect()]
    assert hits and hits[0] == url


def test_staged_trickle_then_finalize(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("adddocs_trickle") / "idx")
    a = corpus.orderBy("url").limit(200)
    b = corpus.orderBy("url").subtract(a)
    assert add_documents(spark, a, out, n_shards=4, finalize=False) is None
    assert not os.path.exists(os.path.join(out, "meta.json"))
    assert add_documents(spark, b, out, n_shards=4, finalize=False) is None
    meta = finalize_streamed_index(spark, out)
    assert meta.n_docs == N


def test_rejects_unbatched_staging_layout(spark, corpus, tmp_path_factory):
    from meilisearch_thai_spark.index.lineage import build_index_resumable

    out = str(tmp_path_factory.mktemp("adddocs_bad") / "idx")
    build_index_resumable(spark, corpus.limit(50), out, n_shards=2)
    with pytest.raises(ValueError, match="batch"):
        add_documents(spark, corpus.limit(10), out, n_shards=2)


def test_rejects_classic_build_index_dir(spark, corpus, tmp_path_factory):
    # meta.json without tf staging = classic build_index layout; a silent
    # pass here would REPLACE the whole index with only the new pages
    out = str(tmp_path_factory.mktemp("adddocs_classic") / "idx")
    build_index(spark, corpus.limit(50), out)
    with pytest.raises(ValueError, match="not incrementally updatable"):
        add_documents(spark, corpus.limit(10), out, n_shards=2)


def test_settings_and_params_survive_add(spark, corpus, tmp_path_factory):
    from meilisearch_thai_spark.index.builder import BM25Params, load_meta
    from meilisearch_thai_spark.index.settings import update_stop_words, update_synonyms

    out = str(tmp_path_factory.mktemp("adddocs_settings") / "idx")
    a = corpus.orderBy("url").limit(300)
    b = corpus.orderBy("url").subtract(a)
    from meilisearch_thai_spark.index.settings import (
        export_settings,
        update_filterable_attributes,
        update_sortable_attributes,
        update_typo_tolerance,
    )

    add_documents(spark, a, out, n_shards=4, params=BM25Params(k1=1.5), block_size=64)
    update_synonyms(out, {"ปัญญาประดิษฐ์": ["เอไอ"]})
    update_stop_words(out, ["และ"])
    update_typo_tolerance(out, one_typo=6, disable_on_words=["thai"])
    update_filterable_attributes(out, ["lang"])
    update_sortable_attributes(out, ["doc_len"])
    meta = add_documents(spark, b, out, n_shards=4)  # defaults = inherit
    assert meta.k1 == 1.5 and meta.block_size == 64
    m = load_meta(out)
    assert m.synonyms == {"ปัญญาประดิษฐ์": ["เอไอ"]}
    assert m.stopwords == ["และ"]
    # the WHOLE settings surface must survive a delta add, not just
    # synonyms/stop-words (ADVICE r3: typoTolerance + attribute declarations
    # were silently reset to defaults by the next finalize)
    assert m.typo_tolerance["one_typo"] == 6
    assert m.typo_tolerance["disable_on_words"] == ["thai"]
    assert m.filterable_attributes == ["lang"]
    assert m.sortable_attributes == ["doc_len"]
    exported = export_settings(out)
    assert exported["typo_tolerance"]["one_typo"] == 6
    assert exported["filterable_attributes"] == ["lang"]


def test_finalize_streamed_index_inherits_layout(spark, corpus, tmp_path_factory):
    """The documented trickle flow (add_documents(..., finalize=False) →
    finalize_streamed_index) must inherit the bootstrap's layout and BM25
    constants from meta.json, not silently reset them to defaults."""
    from meilisearch_thai_spark.index.builder import BM25Params

    out = str(tmp_path_factory.mktemp("adddocs_inherit") / "idx")
    a = corpus.orderBy("url").limit(300)
    b = corpus.orderBy("url").subtract(a)
    add_documents(spark, a, out, n_shards=4, params=BM25Params(k1=1.5), block_size=64)
    assert add_documents(spark, b, out, n_shards=4, finalize=False) is None
    meta = finalize_streamed_index(spark, out)  # no args = inherit
    assert meta.k1 == 1.5 and meta.block_size == 64
    assert meta.n_docs == N


def test_staged_deletion_registry_one_entry_per_url(spark, corpus, tmp_path_factory):
    """Repeat deletes of the same url keep ONE registry entry (max
    watermarks) — the registry is O(distinct deleted urls), not O(deletes)."""
    import json as _json

    from meilisearch_thai_spark.index.maintenance import delete_docs
    from meilisearch_thai_spark.streaming.ingest import DELETED_REGISTRY

    out = str(tmp_path_factory.mktemp("adddocs_reg") / "idx")
    add_documents(spark, corpus.orderBy("url").limit(50), out, n_shards=2)
    victim = corpus.orderBy("url").limit(1).collect()[0]["url"]
    assert delete_docs(spark, out, [victim]) == 1
    assert delete_docs(spark, out, [victim, victim]) == 0  # repeat + dup input
    with open(os.path.join(out, DELETED_REGISTRY)) as fh:
        reg = _json.load(fh)
    assert len(reg) == 1 and reg[0]["url"] == victim


def test_delete_survives_finalize_and_readd_resurrects(spark, corpus, tmp_path_factory):
    from meilisearch_thai_spark.index.maintenance import delete_docs

    out = str(tmp_path_factory.mktemp("adddocs_del") / "idx")
    a = corpus.orderBy("url").limit(300)
    b = corpus.orderBy("url").subtract(a)
    add_documents(spark, a, out, n_shards=4)
    victim = a.orderBy("url").limit(1).collect()[0]
    assert delete_docs(spark, out, [victim["url"]]) == 1
    # a later delta-add finalize must NOT resurrect the deleted url from the
    # staged tf rows (tombstones alone only cover the queryable index)
    meta = add_documents(spark, b, out, n_shards=4)
    assert meta.n_docs == N - 1
    ds = spark.read.parquet(f"{out}/doc_stats")
    assert ds.filter(F.col("url") == victim["url"]).count() == 0
    assert not os.path.exists(os.path.join(out, "tombstones"))  # applied, cleared
    # an EXPLICIT re-add after the delete legitimately resurrects (higher
    # adhoc batch id than the recorded watermark)
    readd = corpus.filter(F.col("url") == victim["url"])
    meta2 = add_documents(spark, readd, out, n_shards=4)
    assert meta2.n_docs == N
    assert (
        spark.read.parquet(f"{out}/doc_stats").filter(F.col("url") == victim["url"]).count()
        == 1
    )
