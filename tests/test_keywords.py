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


def _bpe_python(words: dict[str, int], n_merges: int, min_count: int = 2):
    """Pure-Python twin of train_bpe's exact algorithm (argmax by count
    desc, (l, r) asc; left-to-right non-overlapping rewrite)."""
    vocab = {w: [c for c in w] for w in words}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + words[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        (l, r), _n = best
        merges.append((l, r))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_train_bpe_matches_python_twin(spark):
    from meilisearch_thai_spark.pipeline.textstats import train_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lower",
        "low newer low",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    words: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    merges, vocab = train_bpe(docs, "text", n_merges=8)
    want_merges, want_vocab = _bpe_python(words, 8)
    assert merges == want_merges and len(merges) > 3
    got_vocab = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    assert got_vocab == want_vocab


def test_train_bpe_min_count_stops_early(spark):
    from meilisearch_thai_spark.pipeline.textstats import train_bpe

    docs = spark.createDataFrame([("ab cd",)], "text string")
    merges, _ = train_bpe(docs, "text", n_merges=10, min_count=2)
    assert merges == []  # every pair occurs once
    merges1, _ = train_bpe(docs, "text", n_merges=2, min_count=1)
    assert merges1 == [("a", "b"), ("c", "d")]  # count ties -> (l, r) asc
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        train_bpe(docs, "text", 0)


def test_train_bpe_first_merge_equals_pair_counts_top(spark, sf_dir):
    """Consistency with the gated statistic: merge #1 == bpe_pair_counts'
    top pair on the same corpus."""
    from meilisearch_thai_spark.pipeline.textstats import bpe_pair_counts, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    top = bpe_pair_counts(docs, "text", k=1).collect()[0]["pair"]
    merges, _ = train_bpe(docs, "text", n_merges=1)
    assert "".join(merges[0]) == top
