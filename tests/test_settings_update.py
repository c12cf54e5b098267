"""Settings updates without rebuild (reference settings_manager.py:
add_synonyms :226-249, update_stop_words :274-283, export_config :334-350):
meta.json is the settings store; live engines pick changes up on
refresh_index()."""

from __future__ import annotations

import datetime

import pytest

from meilisearch_thai_spark.index.builder import build_index, load_meta
from meilisearch_thai_spark.index.settings import (
    export_settings,
    update_stop_words,
    update_synonyms,
)
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import PAGES_SCHEMA

_TS = datetime.datetime(2024, 1, 1)

DOCS = [
    ("u/laptop", "cheap laptop with long battery"),
    ("u/notebook", "paper notebook for sketching"),
    ("u/the", "the filler document about batteries"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    pages = spark.createDataFrame([(u, _TS, b"", t, "en") for u, t in DOCS], PAGES_SCHEMA)
    out = str(tmp_path_factory.mktemp("idx_settings"))
    build_index(spark, pages, out, stopwords=["the"], synonyms={"notebook": ["laptop"]})
    return out


def test_add_synonyms_merges(idx):
    meta = update_synonyms(idx, {"Notebook": ["ultrabook"], "pc": ["computer"]})
    assert meta.synonyms["notebook"] == ["laptop", "ultrabook"]  # union, normalized key
    assert meta.synonyms["pc"] == ["computer"]
    assert load_meta(idx).synonyms == meta.synonyms  # persisted
    assert meta.synonyms_fingerprint != ""


def test_replace_and_reset_synonyms(idx):
    meta = update_synonyms(idx, {"pc": ["desktop"]}, merge=False)
    assert meta.synonyms == {"pc": ["desktop"]}
    meta = update_synonyms(idx, {}, merge=False)
    assert meta.synonyms == {} and meta.synonyms_fingerprint == ""
    # restore for later tests
    update_synonyms(idx, {"notebook": ["laptop"]})


def test_live_engine_picks_up_synonyms_on_refresh(spark, idx):
    eng = SearchEngine(spark, idx, cache_postings=False)
    update_synonyms(idx, {"sketchpad": ["notebook"]})
    assert "sketchpad" not in eng._synonyms  # snapshot semantics
    eng.refresh_index()
    assert eng._synonyms["sketchpad"] == ["notebook"]
    urls = {r["url"] for r in eng.multi_variant_search("sketchpad", k=5).collect()}
    assert "u/notebook" in urls


def test_add_stop_words_applies_query_side(spark, idx):
    meta = update_stop_words(idx, ["the", "paper"])
    assert meta.stopwords == ["paper", "the"]
    assert meta.stopwords_build == ["the"]
    eng = SearchEngine(spark, idx, cache_postings=False)
    # 'paper' is now ignored: conjunctive 'paper notebook' must still hit
    # u/notebook through the surviving term alone
    urls = [r["url"] for r in eng.search("paper notebook", k=5).collect()]
    assert urls and urls[0] == "u/notebook"
    # shrinking back to the build list is fine
    update_stop_words(idx, ["the"])


def test_cannot_unstop_build_time_word(idx):
    with pytest.raises(ValueError, match="rebuild"):
        update_stop_words(idx, [])


def test_export_settings(idx):
    cfg = export_settings(idx)
    assert cfg["stop_words_build"] == ["the"]
    assert cfg["k1"] == 1.2 and cfg["b"] == 0.75
    assert "notebook" in cfg["synonyms"]
    assert cfg["dictionary_fingerprint"]


def test_index_stats_field_distribution(spark, tmp_path):
    """MeiliSearch /stats parity: doc count, per-field non-null counts,
    isIndexing from the compaction marker."""
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.settings import index_stats

    out = str(tmp_path / "idx_stats")
    rows = [
        ("https://t/1", "wakame salad", "th", 5),
        ("https://t/2", "other text", None, None),
        ("https://t/3", "third doc here", "en", 7),
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
    st = index_stats(spark, out)
    assert st["numberOfDocuments"] == 3 and st["isIndexing"] is False
    assert st["fieldDistribution"] == {"lang": 2, "url": 3, "views": 2}
    # a live compaction marker flips isIndexing without touching tables
    import os
    open(os.path.join(out, "_COMPACTING"), "w").write("{}")
    st2 = index_stats(spark, out)
    assert st2["isIndexing"] is True and st2["numberOfDocuments"] is None


def test_typo_tolerance_settings(spark, tmp_path):
    """MeiliSearch typoTolerance parity: enabled flag, minWordSizeForTypos
    thresholds, and disableOnWords all gate fuzzy expansion query-side."""
    import pytest
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.settings import update_typo_tolerance
    from meilisearch_thai_spark.query.executor import SearchEngine

    out = str(tmp_path / "idx_typo")
    rows = [("https://t/1", "spark cluster shuffle partition", "en")]
    pages = spark.createDataFrame(rows, "url string, text string, lang string").select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", "lang",
    )
    build_index(spark, pages, out)
    eng = SearchEngine(spark, out, cache_postings=False)
    assert eng.expand_terms_fuzzy("spart") == ["spark"]  # default 1-edit at len 5

    update_typo_tolerance(out, one_typo=7)  # 'spart' (5) now below threshold
    eng.refresh_index()
    assert eng.expand_terms_fuzzy("spart") == []
    assert eng.expand_terms_fuzzy("partitio") == ["partition"]  # len 8 >= 7

    update_typo_tolerance(out, one_typo=5, disable_on_words=["SPART"])
    eng.refresh_index()
    assert eng.expand_terms_fuzzy("spart") == []  # disabled word, case-folded
    assert eng.expand_terms_fuzzy("shufle") == ["shuffle"]

    update_typo_tolerance(out, enabled=False)
    eng.refresh_index()
    assert eng.expand_terms_fuzzy("shufle") == []

    with pytest.raises(ValueError, match="oneTypo"):
        update_typo_tolerance(out, one_typo=9, two_typos=5)


def test_filterable_sortable_declarations(spark, tmp_path):
    """MeiliSearch filterable/sortableAttributes: undeclared mode permits all
    stored fields (drop-in default); a declared list is enforced with a
    request error on undeclared fields; None resets."""
    import pytest
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.settings import (
        update_filterable_attributes,
        update_sortable_attributes,
    )
    from meilisearch_thai_spark.query.executor import SearchEngine

    out = str(tmp_path / "idx_decl")
    rows = [
        ("https://t/1", "wakame salad here", "th"),
        ("https://t/2", "wakame soup there", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string").select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", "lang",
    )
    build_index(spark, pages, out)
    eng = SearchEngine(spark, out, cache_postings=False)
    # undeclared mode: everything works
    assert eng.search_terms(["wakame"], filters={"lang": {"$eq": "en"}}, k=5).count() == 1
    eng.search_terms(["wakame"], sort=["doc_len:desc"], k=5).collect()

    update_filterable_attributes(out, ["url"])
    update_sortable_attributes(out, ["doc_len"])
    eng.refresh_index()
    with pytest.raises(ValueError, match="filterable fields.*lang"):
        eng.search_terms(["wakame"], filters={"lang": {"$eq": "en"}}, k=5)
    with pytest.raises(ValueError, match="filterable fields"):
        eng.facet_distribution(["wakame"], ["lang"], filters={"lang": {"$eq": "en"}})
    with pytest.raises(ValueError, match="sortable fields.*lang"):
        eng.search_terms(["wakame"], sort=["lang:asc"], k=5)
    eng.search_terms(["wakame"], sort=["doc_len:desc"], k=5).collect()  # declared ok
    assert eng.search_terms(["wakame"], filters={"url": {"$eq": "https://t/2"}}, k=5).count() == 1

    with pytest.raises(ValueError, match="not stored"):
        update_filterable_attributes(out, ["nope"])

    update_filterable_attributes(out, None)  # reset to undeclared
    eng.refresh_index()
    assert eng.search_terms(["wakame"], filters={"lang": {"$eq": "en"}}, k=5).count() == 1


def test_declarations_respect_actual_columns_and_gate_facets(spark, tmp_path):
    """Declaring a field the index does not store fails at the update (not
    the first query); declared filterableAttributes also gate facet fields."""
    import pytest
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.settings import update_filterable_attributes
    from meilisearch_thai_spark.query.executor import SearchEngine

    out = str(tmp_path / "idx_cols")
    pages = spark.createDataFrame(
        [("https://t/1", "wakame salad", "th")], "url string, text string, lang string"
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", "lang",
    )
    build_index(spark, pages, out)  # no store_text_crop -> no text_crop column
    with pytest.raises(ValueError, match="text_crop"):
        update_filterable_attributes(out, ["text_crop"])
    update_filterable_attributes(out, ["url"])
    eng = SearchEngine(spark, out, cache_postings=False)
    with pytest.raises(ValueError, match="filterable fields.*lang"):
        eng.facet_distribution(["wakame"], ["lang"])


def test_pagination_faceting_and_toggles(spark, tmp_path):
    """S5 pagination.maxTotalHits / faceting.maxValuesPerFacet and the v1.12
    facetSearch/prefixSearch toggles (MeiliSearch settings surface)."""
    from meilisearch_thai_spark.index.settings import (
        update_faceting,
        update_facet_search,
        update_pagination,
        update_prefix_search,
    )
    from meilisearch_thai_spark.query.service import SearchService
    from meilisearch_thai_spark.sources.pages import generate_pages

    out = str(tmp_path / "idx_pag")
    build_index(spark, generate_pages(spark, 300, seed=21), out, bucket_span=128)
    eng = SearchEngine(spark, out, cache_postings=False)
    term = (
        eng.postings.groupBy("term").count().orderBy("count", ascending=False)
        .limit(1).collect()[0]["term"]
    )

    # permissive default: deep page reachable, settings export None/True
    s = export_settings(out)
    assert s["pagination"] is None and s["faceting"] is None
    assert s["facet_search"] is True and s["prefix_search"] is True
    svc = SearchService(spark, out)
    deep = svc.search(term, limit=5, offset=10)
    assert deep.hits and deep.total_unique_hits > 15

    # maxTotalHits: the window past the cap is unreachable, total clamps,
    # has_next honors the cap
    update_pagination(out, 8)
    svc2 = SearchService(spark, out)
    capped = svc2.search(term, limit=5, offset=0)
    assert capped.total_unique_hits <= 8 and capped.has_next is (capped.total_unique_hits > 5)
    beyond = svc2.search(term, limit=5, offset=8)
    assert beyond.hits == [] and beyond.total_unique_hits <= 8
    assert export_settings(out)["pagination"] == {"max_total_hits": 8}
    with pytest.raises(ValueError, match="maxTotalHits"):
        update_pagination(out, 0)
    update_pagination(out, None)  # reset round-trips
    assert export_settings(out)["pagination"] is None

    # maxValuesPerFacet: the setting caps facet_distribution's per-facet
    # value list when the call passes no explicit cap
    n_vals = len(eng.facet_distribution([term], ["lang"]).collect())
    assert n_vals > 1  # >1 matching language, so a cap of 1 must bite
    update_faceting(out, 1)
    eng2 = SearchEngine(spark, out, cache_postings=False)
    vals = eng2.facet_distribution([term], ["lang"]).collect()
    assert len(vals) == 1  # capped to the top value
    explicit = eng2.facet_distribution([term], ["lang"], max_values_per_facet=100).collect()
    assert len(explicit) == n_vals  # explicit arg overrides the setting
    update_faceting(out, None)
    eng3 = SearchEngine(spark, out, cache_postings=False)
    assert len(eng3.facet_distribution([term], ["lang"]).collect()) == n_vals

    # facetSearch / prefixSearch toggles: disabled -> request error
    update_facet_search(out, False)
    update_prefix_search(out, False)
    eng4 = SearchEngine(spark, out, cache_postings=False)
    with pytest.raises(ValueError, match="facet search is disabled"):
        eng4.facet_search("lang", "t")
    with pytest.raises(ValueError, match="prefix search is disabled"):
        eng4.search_prefix(term[:2], k=3)
    # the toggle governs BOTH prefix surfaces: the service's
    # search-as-you-type path must refuse identically
    svc4 = SearchService(spark, out)
    with pytest.raises(ValueError, match="prefix search is disabled"):
        svc4.search(term[:2], limit=3, prefix_search=True)
    svc4.search(term[:2], limit=3, prefix_search=False)  # plain search unaffected
    update_facet_search(out, True)
    update_prefix_search(out, True)
    eng5 = SearchEngine(spark, out, cache_postings=False)
    eng5.facet_search("lang", "t").collect()
    eng5.search_prefix(term[:2], k=3).collect()
