"""S1-S4 parity: reference-format document ingest → index → search."""

from __future__ import annotations

import json

import pytest

from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources import documents as D

DOCS = [
    {"id": "1", "title": "สาหร่ายวากาเมะ", "content": "สาหร่ายวากาเมะญี่ปุ่นอร่อยมาก",
     "metadata": {"category": "food", "rank": 3}},
    {"id": "2", "title": "Thai Startup", "content": "Bangkok startup ecosystem is growing",
     "metadata": {}},
    {"id": "3", "title": "ข่าวเทคโนโลยี", "content": "ปัญญาประดิษฐ์ กับ machine learning ในไทย"},
    {"id": "", "title": "rejected", "content": "no id"},
    {"id": None, "title": "rejected2", "content": "null id"},
]


def test_validate_split(spark):
    df = D.documents_from_list(spark, DOCS)
    ok, bad = D.validate_documents(df)
    assert ok.count() == 3 and bad.count() == 2


def test_lang_detection_mapping(spark):
    df = D.documents_from_list(spark, DOCS)
    ok, _ = D.validate_documents(df)
    pages = D.documents_to_pages(ok)
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    langs = {r["url"]: r["lang"] for r in pages.collect()}
    assert langs["doc://1"] == "th"
    assert langs["doc://2"] == "en"
    assert langs["doc://3"] == "th-en"


def test_json_roundtrip(spark, tmp_path):
    p = tmp_path / "docs.json"
    p.write_text(json.dumps([d for d in DOCS if d["id"]], ensure_ascii=False))
    df = D.read_documents_json(spark, str(p))
    assert df.count() == 3
    assert {r["id"] for r in df.select("id").collect()} == {"1", "2", "3"}


def test_ingest_and_index_end_to_end(spark, tmp_path):
    df = D.documents_from_list(spark, DOCS)
    meta, n_bad = D.ingest_and_index(spark, df, str(tmp_path / "idx"))
    assert n_bad == 2
    assert meta.n_docs == 3
    eng = SearchEngine(spark, str(tmp_path / "idx"), cache_postings=False)
    hits = eng.search("สาหร่ายวากาเมะ", k=3).collect()
    assert hits and hits[0]["url"] == "doc://1"
    hits = eng.search("startup", k=3).collect()
    assert hits and hits[0]["url"] == "doc://2"
    # sub-word of a compound: the single-variant exact-term search misses
    # (the compound indexes whole — newmm contract), the multi-variant
    # pipeline's compound_split variant finds it
    hits = eng.multi_variant_search("วากาเมะ", k=3).collect()
    assert hits and hits[0]["url"] == "doc://1"
