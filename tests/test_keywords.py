"""Per-document TF-IDF keyword extraction: hand-checked ranking semantics +
cross-engine parity at corpus scale."""

from __future__ import annotations

import duckdb
import pytest

from meilisearch_thai_spark.pipeline.textstats import keywords_tfidf, keywords_tfidf_sql


def test_rare_term_outranks_common_term(spark):
    # at equal tf, 'zebra' (df=1/4) outranks 'the' (df=4/4) on idf
    df = spark.createDataFrame(
        [
            (1, "the zebra"),
            (2, "the cat"),
            (3, "the dog"),
            (4, "the cow"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_key"], r["rank"]): r["term"]
        for r in keywords_tfidf(df, "doc_id", "text", k=2).collect()
    }
    assert rows[(1, 1)] == "zebra"
    assert rows[(1, 2)] == "the"
    # ties (cat/dog/cow all df=1 tf=1) break by term asc within their doc
    assert rows[(2, 1)] == "cat" and rows[(3, 1)] == "dog"


def test_lowercasing_merges_case_variants(spark):
    df = spark.createDataFrame([(1, "Apple apple APPLE pie")], "doc_id long, text string")
    rows = sorted(
        keywords_tfidf(df, "doc_id", "text", k=5).collect(), key=lambda r: r["rank"]
    )
    assert rows[0]["term"] == "apple"


def test_k_cut(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    assert keywords_tfidf(df, "doc_id", "text", k=3).count() == 3


@pytest.mark.parametrize("k", [3, 5])
def test_duckdb_parity_corpus(spark, sf_dir, k):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = (
        keywords_tfidf(docs, "doc_id", "text", k=k)
        .toPandas()
        .sort_values(["doc_key", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(keywords_tfidf_sql("documents", "doc_id", "text", k=k))
        .df()
        .sort_values(["doc_key", "rank"])
        .reset_index(drop=True)
    )
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    assert a.shape == b.shape
    assert (a.astype(str).values == b.astype(str).values).all()


def test_bpe_pair_counts_vocab_weighted(spark):
    import pytest as _pytest

    from meilisearch_thai_spark.pipeline.textstats import bpe_pair_counts

    docs = spark.createDataFrame(
        [("d1", "aba aba ab"), ("d2", "aba x")], ["doc_key", "text"]
    )
    out = [(r.pair, r.n) for r in bpe_pair_counts(docs, "text", k=10).collect()]
    # vocab: aba×3, ab×1, x×1 → pairs: ab = 3(aba)+1(ab) = 4, ba = 3;
    # single-char 'x' contributes nothing
    assert out == [("ab", 4), ("ba", 3)]
    with _pytest.raises(Exception):
        bpe_pair_counts(docs, "missing_col", k=5).collect()
