"""search_prefix (MeiliSearch search-as-you-type): last-word completions as
weighted variants, exact parity with the DuckDB oracle, trailing-space and
negative-keyword semantics."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query import adhoc
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.query.ranker import PREFIX_COMPLETION_WEIGHT

# Latin corpus so the whitespace-token DuckDB oracle is exact; 'sca' is both
# a LITERAL token (doc 0005) and a prefix of scan/scanner/scanning/scatter
DOCS = [
    ("0001", "merge scan merge data table"),
    ("0002", "merge scatter data pipeline node"),
    ("0003", "merge only plain row here"),
    ("0004", "scanner scanning scan probe deep"),
    ("0005", "sca literal token merge case"),
    ("0006", "join table row value hash"),
    ("0007", "scan scan scan narrow column"),
    ("0008", "merge merge merge wide column"),
    ("0009", "data value row table join"),
    ("0010", "scatter gather shuffle exchange stage"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pfx_idx"))
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(DOCS, ["url", "text"]).withColumn(
        "lang", F.lit("en")
    )
    build_index(spark, pages, out)
    return out


@pytest.fixture(scope="module")
def eng(spark, idx):
    return SearchEngine(spark, idx, cache_postings=False)


def _oracle_rows(query_terms, k=10, max_expansions=5):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    sql = adhoc.bm25_prefix_topk_sql_oracle(
        "documents", "doc_id", "text", query_terms, k=k,
        max_expansions=max_expansions, prefix_weight=PREFIX_COMPLETION_WEIGHT,
    )
    return con.execute(sql).fetchall()


def test_prefix_search_matches_duckdb_oracle(eng):
    hits = eng.search_prefix("merge sca", k=10).collect()
    got = [(r["url"], round(r["score"], 4), r["terms_matched"]) for r in hits]
    assert got == [(d, s, m) for d, s, m in _oracle_rows(["merge", "sca"])]


def test_prefix_expands_last_word_only(eng):
    # docs with scan/scatter surface even though 'sca' is not their token;
    # the literal-'sca' doc wins over completion-only docs of equal shape
    urls = [r["url"] for r in eng.search_prefix("merge sca", k=10).collect()]
    assert "0001" in urls and "0002" in urls  # via scan / scatter completion
    assert "0005" in urls  # literal
    # merge-only doc matches variant 0 at full weight
    assert "0003" in urls


def test_trailing_space_disables_completion(eng):
    with_pfx = {r["url"] for r in eng.search_prefix("merge sca", k=10).collect()}
    plain = eng.search_prefix("merge sca ", k=10).collect()
    literal = eng.search_terms(["merge", "sca"], k=10).collect()
    assert [(r["url"], r["score"]) for r in plain] == [
        (r["url"], r["score"]) for r in literal
    ]
    assert {r["url"] for r in plain} < with_pfx  # completions add docs


def test_prefix_with_negative_keyword(eng):
    urls = {r["url"] for r in eng.search_prefix("merge sca -pipeline", k=10).collect()}
    assert "0002" not in urls  # scatter doc carries 'pipeline' → excluded
    assert "0001" in urls


def test_prefix_no_expansions_falls_back(eng):
    # 'zzz' prefixes nothing → plain search path, no crash, empty result
    assert eng.search_prefix("zzz", k=5).collect() == []
    # full word that prefixes others: literal hits AND completion hits, the
    # exact ranking deferred to the oracle (rare completions like 'scanner'
    # carry higher idf and may legitimately outrank a repeated literal)
    hits = eng.search_prefix("scan", k=10).collect()
    got = [(r["url"], round(r["score"], 4), r["terms_matched"]) for r in hits]
    assert got == [(d, s, m) for d, s, m in _oracle_rows(["scan"])]
    assert {"0004", "0007"} <= {u for u, _, _ in got}


def test_service_prefix_search_opt_in(spark, idx):
    # the facade routes completions through the SAME one-job variant fan-out
    from meilisearch_thai_spark.query.service import SearchService

    svc = SearchService(spark, idx, cache_postings=False)
    off = svc.search("merge sca", limit=10)
    on = svc.search("merge sca", limit=10, prefix_search=True)
    # the pooled fallback expansion already surfaces completion docs even
    # without prefix_search; what prefix variants add is CONJUNCTIVE pairing
    # (merge AND scan in one variant) at tokenized-level weight instead of
    # the discounted disjunctive fallback pool — doc 0001 (merge+scan) must
    # score strictly higher and win through a prefix-typed variant
    assert any(h.variant_type == "prefix" for h in on.hits)
    s_on = {h.url: h.score for h in on.hits}
    s_off = {h.url: h.score for h in off.hits}
    assert s_on["0001"] > s_off["0001"]
    h1 = next(h for h in on.hits if h.url == "0001")
    assert h1.variant_type == "prefix" and h1.terms_matched == 2
    # trailing whitespace = finished word → identical to the plain search
    done = svc.search("merge sca ", limit=10, prefix_search=True)
    assert [(h.url, h.score) for h in done.hits] == [
        (h.url, h.score) for h in off.hits
    ]
