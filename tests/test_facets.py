"""Facet distribution (MeiliSearch facetDistribution): counts per field
value over the FULL matching set, distributed rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.query.service import SearchService


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("facets") / "idx")
    rows = [
        ("https://t/1", "wakame salad recipe", "th"),
        ("https://t/2", "wakame soup recipe", "en"),
        ("https://t/3", "salad dressing guide", "en"),
        ("https://t/4", "unrelated document text", "fr"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string").select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    build_index(spark, pages, out)
    return out


def test_facet_counts_full_match_set(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    got = {
        (r.facet, r.value): r.n_docs
        for r in eng.facet_distribution(["wakame", "salad"], ["lang"]).collect()
    }
    # docs 1,2,3 match >=1 term (doc 4 does not)
    assert got == {("lang", "th"): 1, ("lang", "en"): 2}


def test_facet_respects_filters_and_multi_facet(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    got = {
        (r.facet, r.value): r.n_docs
        for r in eng.facet_distribution(
            ["wakame", "salad"], ["lang", "url"], filters={"lang": {"$eq": "en"}}
        ).collect()
    }
    assert got[("lang", "en")] == 2
    assert got[("url", "https://t/2")] == 1 and ("url", "https://t/1") not in got


def test_facet_unknown_field_raises(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    with pytest.raises(ValueError, match="unknown facet"):
        eng.facet_distribution(["wakame"], ["nope"])


def test_service_facet_distribution_dict(spark, idx):
    svc = SearchService(spark, idx, cache_postings=False)
    out = svc.facet_distribution("wakame salad", ["lang"])
    assert out == {"lang": {"th": 1, "en": 2}}
    assert svc.facet_distribution("", ["lang"]) == {"lang": {}}


def test_distinct_attribute_one_hit_per_value(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    hits = eng.search_terms(
        ["wakame", "salad", "recipe"], k=10, distinct="lang",
        attributes_to_retrieve=["lang"],
    ).collect()
    langs = [h["lang"] for h in hits]
    assert len(langs) == len(set(langs))  # one representative per lang
    # the kept representative is the best-scored doc of its group
    all_hits = eng.search_terms(["wakame", "salad", "recipe"], k=10,
                                attributes_to_retrieve=["lang"]).collect()
    best = {}
    for h in all_hits:
        best.setdefault(h["lang"], h["url"])
    assert {h["lang"]: h["url"] for h in hits} == best


def test_distinct_unknown_field_raises(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    with pytest.raises(ValueError, match="unknown distinct"):
        eng.search_terms(["wakame"], distinct="nope")


def test_service_facet_counts_synonym_variant_matches(spark, idx, tmp_path):
    """Facet counts must cover docs matched via synonym/compound variants —
    the hit list and the facet panel shown next to it must agree."""
    import shutil

    from meilisearch_thai_spark.index.settings import update_synonyms

    out = str(tmp_path / "idx_syn")
    shutil.copytree(idx, out)
    update_synonyms(out, {"seaweed": ["wakame"]})
    svc = SearchService(spark, out, cache_postings=False)
    # 'seaweed' itself matches nothing; the synonym variant 'wakame' matches
    # docs 1 (th) and 2 (en) — facet counts must include them
    assert svc.facet_distribution("seaweed", ["lang"]) == {
        "lang": {"th": 1, "en": 1}
    }


def test_facet_counts_drop_query_stopwords(spark, idx, tmp_path):
    """A query-side stop word never matches at search time, so it must not
    inflate facet counts either (parity with the hit set)."""
    import shutil

    from meilisearch_thai_spark.index.settings import update_stop_words

    out = str(tmp_path / "idx_stop")
    shutil.copytree(idx, out)
    update_stop_words(out, ["salad"])
    eng = SearchEngine(spark, out, cache_postings=False)
    got = {
        (r.facet, r.value): r.n_docs
        for r in eng.facet_distribution(["wakame", "salad"], ["lang"]).collect()
    }
    # only the wakame docs (1: th, 2: en) — doc 3 matches 'salad' alone and
    # can never be returned by the search, so it must not be counted
    assert got == {("lang", "th"): 1, ("lang", "en"): 1}


def test_distinct_rejects_internal_columns(spark, idx):
    """distinct= validates against the same public attribute surface as
    attributes_to_retrieve: internal index columns are not distinct-able."""
    eng = SearchEngine(spark, idx, cache_postings=False)
    with pytest.raises(ValueError, match="unknown distinct"):
        eng.search_terms(["wakame"], distinct="norm_hash")


def test_facet_stats_min_max_and_validation(spark, tmp_path):
    """facetStats: min/max of a numeric stored field over the match set;
    non-numeric fields are a request error; no-match queries return {}."""
    out = str(tmp_path / "idx_stats")
    rows = [
        ("https://t/1", "wakame salad recipe", "th", 10),
        ("https://t/2", "wakame soup recipe", "en", 50),
        ("https://t/3", "salad dressing guide", "en", 7),
        ("https://t/4", "unrelated document text", "fr", 999),
    ]
    pages = spark.createDataFrame(
        rows, "url string, text string, lang string, views long"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
        "views",
    )
    build_index(spark, pages, out, stored_fields=["views"])
    eng = SearchEngine(spark, out, cache_postings=False)
    got = {r.facet: (r.min_value, r.max_value) for r in eng.facet_stats(["wakame"], ["views"]).collect()}
    assert got == {"views": (10.0, 50.0)}  # docs 1+2 match; 999 never counted
    filtered = {
        r.facet: (r.min_value, r.max_value)
        for r in eng.facet_stats(["wakame"], ["views"], filters={"lang": {"$eq": "en"}}).collect()
    }
    assert filtered == {"views": (50.0, 50.0)}
    with pytest.raises(ValueError, match="numeric"):
        eng.facet_stats(["wakame"], ["lang"])
    svc = SearchService(spark, out, cache_postings=False)
    assert svc.facet_stats("wakame salad", ["views"]) == {"views": {"min": 7.0, "max": 50.0}}
    assert svc.facet_stats("zzzzmissing", ["views"]) == {}


def test_max_values_per_facet(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    rows = eng.facet_distribution(
        ["wakame", "salad", "recipe", "guide"], ["url"], max_values_per_facet=2
    ).collect()
    assert len(rows) == 2  # 4 matching urls capped to top 2


def test_facet_stats_all_null_facet_omitted(spark, tmp_path):
    """A numeric facet whose every matching value is NULL yields no row
    (MeiliSearch omits such facets) — not a (facet, NULL, NULL) row or a
    service-side TypeError."""
    out = str(tmp_path / "idx_nullstats")
    rows = [
        ("https://t/1", "wakame salad", "th", None),
        ("https://t/2", "wakame soup", "en", None),
        ("https://t/3", "unrelated text", "fr", 5),
    ]
    pages = spark.createDataFrame(
        rows, "url string, text string, lang string, views long"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", "lang", "views",
    )
    build_index(spark, pages, out, stored_fields=["views"])
    eng = SearchEngine(spark, out, cache_postings=False)
    assert eng.facet_stats(["wakame"], ["views"]).collect() == []
    svc = SearchService(spark, out, cache_postings=False)
    assert svc.facet_stats("wakame", ["views"]) == {}


def test_facet_search_prefix_and_counts(spark, idx):
    """MeiliSearch facet-search: prefix-matched facet VALUES with counts over
    the matching set, count-desc order, max_hits cap."""
    eng = SearchEngine(spark, idx, cache_postings=False)
    # no terms → whole corpus: th=1, en=2, fr=1
    rows = eng.facet_search("lang").collect()
    assert [(r["value"], r["count"]) for r in rows] == [("en", 2), ("fr", 1), ("th", 1)]
    # case-insensitive prefix restricts the values
    rows = eng.facet_search("lang", facet_query="E").collect()
    assert [(r["value"], r["count"]) for r in rows] == [("en", 2)]
    # query terms restrict the counted documents (doc 4 is fr and matches no term)
    rows = eng.facet_search("lang", terms=["wakame", "salad"]).collect()
    assert [(r["value"], r["count"]) for r in rows] == [("en", 2), ("th", 1)]
    # filters compose; max_hits caps
    rows = eng.facet_search(
        "lang", terms=["wakame", "salad"], filters={"lang": {"$eq": "en"}}
    ).collect()
    assert [(r["value"], r["count"]) for r in rows] == [("en", 2)]
    assert len(eng.facet_search("url", max_hits=2).collect()) == 2


def test_facet_search_validation(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    with pytest.raises(ValueError, match="unknown facet"):
        eng.facet_search("nope")


def test_service_facet_search_hits_shape(spark, idx):
    svc = SearchService(spark, idx, cache_postings=False)
    hits = svc.facet_search("lang", facet_query="e", query="wakame salad recipe")
    assert hits == [{"value": "en", "count": 2}]
    assert svc.facet_search("lang", query="ไม่มีคำนี้") == []


def test_similar_documents_more_like_this(spark, idx):
    """MeiliSearch /similar: embedding-cosine neighbors of a document, self
    excluded, tombstones excluded, public fields joined onto the hits."""
    from meilisearch_thai_spark.index.maintenance import delete_docs

    eng = SearchEngine(spark, idx, cache_postings=False)
    emb = spark.createDataFrame(
        [
            ("https://t/1", [1.0, 0.0, 0.0]),
            ("https://t/2", [0.9, 0.1, 0.0]),   # closest to t/1
            ("https://t/3", [0.5, 0.5, 0.0]),
            ("https://t/4", [0.0, 1.0, 0.0]),   # orthogonal
            ("https://t/zz", [1.0, 0.0, 0.0]),  # no such document → dropped
        ],
        "url string, embedding array<double>",
    )
    rows = eng.similar_documents(emb, "https://t/1", k=3, fields=["lang"]).collect()
    assert [r["url"] for r in rows] == ["https://t/2", "https://t/3", "https://t/4"]
    assert rows[0]["cosine"] > rows[1]["cosine"] > rows[2]["cosine"]
    assert rows[0]["lang"] == "en"
    with pytest.raises(ValueError, match="no embedding"):
        eng.similar_documents(emb, "https://t/zz")  # not a live document

    # tombstoned neighbors drop BEFORE ranking (page stays full)
    import shutil
    import tempfile

    d2 = tempfile.mkdtemp(prefix="facets_sim_")
    try:
        shutil.rmtree(d2)
        shutil.copytree(idx, d2)
        delete_docs(spark, d2, ["https://t/2"])
        eng2 = SearchEngine(spark, d2, cache_postings=False)
        rows = eng2.similar_documents(emb, "https://t/1", k=2).collect()
        assert [r["url"] for r in rows] == ["https://t/3", "https://t/4"]
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_service_similar_documents(spark, idx):
    svc = SearchService(spark, idx, cache_postings=False)
    emb = spark.createDataFrame(
        [("https://t/1", [1.0, 0.0]), ("https://t/2", [0.8, 0.2]), ("https://t/3", [0.0, 1.0])],
        "url string, embedding array<double>",
    )
    hits = svc.similar_documents(emb, "https://t/1", k=2, fields=["lang"])
    assert [h["url"] for h in hits] == ["https://t/2", "https://t/3"]
    assert set(hits[0]) == {"url", "lang", "cosine"}
