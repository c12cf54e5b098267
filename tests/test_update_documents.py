"""Partial document updates — MeiliSearch update-documents semantics
(reference src/meilisearch_integration/client.py:214-249: merge supplied
fields into the stored document by primary key; unsupplied fields keep
their current values), vs add_documents' whole-document replace."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.sources.pages import generate_pages
from meilisearch_thai_spark.streaming.ingest import add_documents, update_documents

N = 300

POSTING_COLS = ["term", "bucket", "block_id", "first_doc", "n_docs", "doc_bytes", "tf_bytes", "df"]


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_pages(spark, N, seed=55).persist()
    pages.count()
    yield pages
    pages.unpersist()


def _partial(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_text_update_equals_fresh_build_over_merged_corpus(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("upd_text")
    out, ref = str(root / "idx"), str(root / "idx_ref")
    add_documents(spark, corpus, out, n_shards=4)
    victims = [r["url"] for r in corpus.orderBy("url").limit(5).collect()]
    new_text = "อาหารไทย merged update"
    meta = update_documents(
        spark,
        _partial(spark, [(u, new_text) for u in victims], "url string, text string"),
        out,
        n_shards=4,
    )
    assert meta.n_docs == N  # updates, not inserts
    merged = corpus.withColumn(
        "text",
        F.when(F.col("url").isin(victims), F.lit(new_text)).otherwise(F.col("text")),
    )
    add_documents(spark, merged, ref, n_shards=4)
    assert _same(
        spark.read.parquet(f"{out}/postings").select(POSTING_COLS),
        spark.read.parquet(f"{ref}/postings").select(POSTING_COLS),
    )
    # lang was NOT supplied → kept from the stored documents
    cols = ["doc_id", "url", "lang", "doc_len", "norm_hash"]
    assert _same(
        spark.read.parquet(f"{out}/doc_stats").select(cols),
        spark.read.parquet(f"{ref}/doc_stats").select(cols),
    )


def test_metadata_only_update_skips_tokenizer(spark, corpus, tmp_path_factory, monkeypatch):
    import meilisearch_thai_spark.tokenizer.udfs as udfs

    out = str(tmp_path_factory.mktemp("upd_meta") / "idx")
    add_documents(spark, corpus, out, n_shards=4)
    before_postings = spark.read.parquet(f"{out}/postings").select(POSTING_COLS).collect()
    victims = [r["url"] for r in corpus.orderBy("url").limit(4).collect()]

    def _boom(*a, **k):  # metadata-only updates must never build a tokenize plan
        raise AssertionError("tokenizer invoked for a metadata-only update")

    monkeypatch.setattr(udfs, "index_features_udf", _boom)
    update_documents(
        spark,
        _partial(spark, [(u, "zz") for u in victims], "url string, lang string"),
        out,
        n_shards=4,
    )
    monkeypatch.undo()
    # postings identical (url set and texts unchanged → same doc ids, terms)
    after = spark.read.parquet(f"{out}/postings").select(POSTING_COLS)
    assert sorted(map(tuple, before_postings)) == sorted(map(tuple, after.collect()))
    # lang merged in doc_stats; untouched docs keep theirs
    langs = {
        r["url"]: r["lang"]
        for r in spark.read.parquet(f"{out}/doc_stats").select("url", "lang").collect()
    }
    orig = {r["url"]: r["lang"] for r in corpus.select("url", "lang").collect()}
    for u in victims:
        assert langs[u] == "zz"
    for u in set(orig) - set(victims):
        assert langs[u] == orig[u]
    # lineage records the split
    recs = sorted(
        f for f in os.listdir(os.path.join(out, "lineage")) if f.startswith("adhoc-batch-")
    )
    with open(os.path.join(out, "lineage", recs[-1])) as fh:
        rec = json.load(fh)
    assert rec["kind"] == "update"
    assert rec["n_retokenized"] == 0 and rec["n_metadata_only"] == 4


def test_null_value_means_keep(spark, corpus, tmp_path_factory):
    """A present-but-NULL column keeps the stored value (same rule as an
    absent column)."""
    out = str(tmp_path_factory.mktemp("upd_null") / "idx")
    add_documents(spark, corpus, out, n_shards=4)
    u0, u1 = [r["url"] for r in corpus.orderBy("url").limit(2).collect()]
    orig = {r["url"]: r["lang"] for r in corpus.select("url", "lang").collect()}
    update_documents(
        spark,
        _partial(
            spark,
            [(u0, "new text body", None), (u1, None, "xx")],
            "url string, text string, lang string",
        ),
        out,
        n_shards=4,
    )
    langs = {
        r["url"]: r["lang"]
        for r in spark.read.parquet(f"{out}/doc_stats").select("url", "lang").collect()
    }
    assert langs[u0] == orig[u0]  # text updated, lang kept
    assert langs[u1] == "xx"  # lang updated


def test_insert_new_url_and_empty_text(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("upd_ins") / "idx")
    add_documents(spark, corpus, out, n_shards=4)
    meta = update_documents(
        spark,
        _partial(
            spark,
            [("zzz-new-doc", "fresh document text", "en"), ("zzz-textless", None, "en")],
            "url string, text string, lang string",
        ),
        out,
        n_shards=4,
    )
    assert meta.n_docs == N + 2
    stats = {
        r["url"]: r["doc_len"]
        for r in spark.read.parquet(f"{out}/doc_stats")
        .filter(F.col("url").startswith("zzz-"))
        .collect()
    }
    assert stats["zzz-new-doc"] > 0
    assert stats["zzz-textless"] == 0  # created with empty searchable text


def test_duplicate_urls_raise(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("upd_dup") / "idx")
    add_documents(spark, corpus.limit(50), out, n_shards=4)
    with pytest.raises(ValueError, match="duplicate urls"):
        update_documents(
            spark,
            _partial(spark, [("a", "x"), ("a", "y")], "url string, text string"),
            out,
        )


def test_requires_staged_layout(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("upd_req") / "nope")
    with pytest.raises(ValueError, match="existing staged index"):
        update_documents(
            spark, _partial(spark, [("a", "x")], "url string, text string"), out
        )


def test_metadata_update_of_null_lang_doc_keeps_postings(spark, tmp_path_factory):
    """Review regression: existence must be a literal flag, not inferred from
    lang's nullability — a stored doc with lang=NULL getting a metadata-only
    update must keep its postings (it was previously misrouted to the
    retokenize path with text='' and wiped)."""
    out = str(tmp_path_factory.mktemp("upd_nulllang") / "idx")
    pages = spark.createDataFrame(
        [("u1", "alpha beta gamma", None), ("u2", "delta epsilon", "en")],
        "url string, text string, lang string",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    add_documents(spark, pages, out, n_shards=2)
    before = {
        r["url"]: r["doc_len"]
        for r in spark.read.parquet(f"{out}/doc_stats").collect()
    }
    assert before["u1"] > 0
    meta = update_documents(
        spark,
        spark.createDataFrame([("u1", "th")], "url string, lang string"),
        out,
        n_shards=2,
    )
    assert meta.n_docs == 2
    after = {
        (r["url"]): (r["doc_len"], r["lang"])
        for r in spark.read.parquet(f"{out}/doc_stats").collect()
    }
    assert after["u1"] == (before["u1"], "th")  # postings intact, lang merged
