"""S5 synonyms (reference settings_manager.py:226-249 add_synonyms, pushed
in the settings payload :171): one-way canonical -> alternates stored in
meta.json and applied at QUERY time as synonym variants — the MeiliSearch
semantics (the posting data is untouched)."""

from __future__ import annotations

import datetime

import pytest

from meilisearch_thai_spark.index.builder import build_index, load_meta
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.query.pipeline import process_query
from meilisearch_thai_spark.query.service import SearchService
from meilisearch_thai_spark.sources.pages import PAGES_SCHEMA

_TS = datetime.datetime(2024, 1, 1)

SYN = {"notebook": ["laptop", "ultrabook"], "เอไอ": ["ปัญญาประดิษฐ์"]}

DOCS = [
    ("u/laptop", "cheap laptop with long battery"),
    ("u/ultra", "ultrabook review and battery test"),
    ("u/notebook", "paper notebook for sketching"),
    ("u/thai-ai", "งานวิจัย ปัญญาประดิษฐ์ ในไทย"),
    ("u/other", "battery charger teardown"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    rows = [(u, _TS, b"", t, "en") for u, t in DOCS]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = str(tmp_path_factory.mktemp("idx_syn"))
    build_index(spark, pages, out, synonyms=SYN)
    return out


def test_meta_roundtrip_and_fingerprint(spark, idx, tmp_path_factory):
    meta = load_meta(idx)
    assert meta.synonyms == {
        "notebook": ["laptop", "ultrabook"],
        "เอไอ": ["ปัญญาประดิษฐ์"],
    }
    assert len(meta.synonyms_fingerprint) == 64
    # a synonym-free build carries no fingerprint
    pages = spark.createDataFrame([(u, _TS, b"", t, "en") for u, t in DOCS], PAGES_SCHEMA)
    plain = str(tmp_path_factory.mktemp("idx_nosyn"))
    m2 = build_index(spark, pages, plain)
    assert m2.synonyms == {} and m2.synonyms_fingerprint == ""
    # postings are identical: synonyms are query-time settings, not index data
    cols = ["term", "bucket", "block_id", "doc_bytes"]
    a = spark.read.parquet(idx + "/postings").select(cols)
    b = spark.read.parquet(plain + "/postings").select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_synonym_variant_generation():
    pq = process_query("notebook battery", synonyms=SYN)
    syn = [v for v in pq.variants if v.variant_type == "synonym"]
    assert {tuple(v.terms) for v in syn} == {
        ("laptop", "battery"),
        ("ultrabook", "battery"),
    }
    assert all(v.metadata["synonym_of"] == "notebook" for v in syn)
    # one-way: searching the alternate does not expand back to the canonical
    pq2 = process_query("laptop battery", synonyms=SYN)
    assert not [v for v in pq2.variants if v.variant_type == "synonym"]


def test_canonical_keys_are_normalized_and_multiword():
    # canonical keys pass through the same tokenizer normalization as query
    # terms: "Laptop" matches the query's lowercased base term, and a
    # multi-word canonical matches as a contiguous window of base terms
    syn = {"Laptop": ["notebook"], "hard disk": ["hdd", "disk drive"]}
    pq = process_query("laptop case", synonyms=_norm_syn(syn))
    got = {tuple(v.terms) for v in pq.variants if v.variant_type == "synonym"}
    assert ("notebook", "case") in got

    pq2 = process_query("hard disk failure", synonyms=_norm_syn(syn))
    got2 = {tuple(v.terms) for v in pq2.variants if v.variant_type == "synonym"}
    assert ("hdd", "failure") in got2
    assert ("disk", "drive", "failure") in got2


def _norm_syn(raw):
    """Round-trip raw synonyms through build_index's normalization by
    building a tiny index, mirroring how meta.synonyms reach the query side."""
    from meilisearch_thai_spark.tokenizer import extract_index_terms, tokenize_for_index

    out: dict[str, list[str]] = {}
    for k, vs in raw.items():
        key = " ".join(extract_index_terms(tokenize_for_index(k)))
        if key:
            out[key] = sorted(set(out.get(key, [])) | {v.strip() for v in vs if v.strip()})
    return out


def test_build_normalizes_canonical_keys(spark, tmp_path_factory):
    rows = [(u, _TS, b"", t, "en") for u, t in DOCS]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = str(tmp_path_factory.mktemp("idx_syn_norm"))
    meta = build_index(
        spark, pages, out, synonyms={"Laptop": ["portable"], "hard disk": ["hdd"]}
    )
    assert meta.synonyms == {"laptop": ["portable"], "hard disk": ["hdd"]}


def test_search_finds_synonym_docs(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    urls = {r["url"] for r in eng.multi_variant_search("notebook battery", k=10).collect()}
    # 'laptop'/'ultrabook' docs reachable only through the synonym variants
    assert {"u/laptop", "u/ultra", "u/notebook"} <= urls
    # without synonyms in meta the same query cannot reach them
    pq_terms = {r["url"] for r in eng.search("notebook battery", k=10).collect()}
    assert "u/laptop" not in pq_terms or "battery" in DOCS[0][1]  # via 'battery' only


def test_thai_synonym(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    urls = [r["url"] for r in eng.multi_variant_search("เอไอ", k=10).collect()]
    assert urls and urls[0] == "u/thai-ai"


def test_service_uses_index_synonyms(spark, idx):
    svc = SearchService(spark, idx, cache_postings=False)
    resp = svc.search("notebook battery", limit=10)
    urls = {h.url for h in resp.hits}
    assert {"u/laptop", "u/ultra"} <= urls
    # batch path too
    pages = svc.batch_search(["notebook battery"], limit=10)
    assert {h.url for h in pages[0].hits} >= {"u/laptop", "u/ultra"}
