"""Driver-side query pipeline (Q1-Q10) + multi-variant search (X1/R1-R7).

Mirrors the reference's query-processor unit tests
(tests/unit/test_search_proxy_query_processor.py) and the search-proxy
pipeline integration test (tests/integration/test_search_proxy_pipeline.py).
"""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.query.pipeline import (
    BASE_WEIGHTS,
    MAX_QUERY_VARIANTS,
    analyze_query,
    classify_query_type,
    expand_query_terms,
    generate_variants,
    normalize_query,
    process_query,
)


class TestAnalysis:
    def test_thai_query(self):
        a = analyze_query("ปัญญาประดิษฐ์")
        assert a.primary_language == "thai"
        assert a.thai_char_count == len("ปัญญาประดิษฐ์")
        assert a.english_word_count == 0

    def test_english_query(self):
        a = analyze_query("machine learning")
        assert a.primary_language == "english"
        assert a.english_word_count == 2

    def test_mixed_query(self):
        a = analyze_query("Startup ไทย")
        assert a.primary_language == "mixed"
        assert a.thai_char_count == 3
        assert a.english_word_count == 1

    def test_normalize_collapses_whitespace(self):
        assert normalize_query("  a \t b\n c ") == "a b c"


class TestVariants:
    def test_thai_variants_structure(self):
        pq = process_query("ปัญญาประดิษฐ์และการเรียนรู้")
        assert 1 <= len(pq.variants) <= MAX_QUERY_VARIANTS
        types = {v.variant_type for v in pq.variants}
        assert "tokenized" in types or "original" in types
        for v in pq.variants:
            assert 0.1 <= v.weight <= 1.0
            assert v.terms, "every variant must carry index terms"

    def test_tokenized_outweighs_fallback(self):
        pq = process_query("การเรียนรู้ของเครื่อง")
        wt = {v.variant_type: v.weight for v in pq.variants}
        if "tokenized" in wt and "fallback" in wt:
            assert wt["tokenized"] > wt["fallback"]

    def test_variant_texts_unique(self):
        pq = process_query("สาหร่ายวากาเมะ japanese seaweed")
        keys = [(v.query_text.lower(), v.matching) for v in pq.variants]
        assert len(keys) == len(set(keys))

    def test_empty_query_no_variants(self):
        assert process_query("   ").variants == []

    def test_mixed_language_variant_for_mixed(self):
        a = analyze_query("Startup ไทย เทคโนโลยี")
        vs = generate_variants("Startup ไทย เทคโนโลยี", a)
        # mixed variant may dedup into tokenized (same text) — but weights obey base order
        for v in vs:
            assert v.weight <= BASE_WEIGHTS["tokenized"]

    def test_original_variant_conjunctive(self):
        pq = process_query("อาหารไทย")
        orig = [v for v in pq.variants if v.variant_type == "original"]
        for v in orig:
            assert v.matching == "all"


class TestClassification:
    @pytest.mark.parametrize(
        "q,expected",
        [
            ("ก", "partial"),
            ("Startup ไทย", "mixed"),
            ("ปัญญาประดิษฐ์", "compound"),
            ("อาหารไทยอร่อยมากที่สุดในโลก", "phrase"),
        ],
    )
    def test_types(self, q, expected):
        assert classify_query_type(q) == expected

    def test_expansion_includes_parts(self):
        terms = expand_query_terms("ปัญญาประดิษฐ์")
        assert "ปัญญาประดิษฐ์" in terms or len(terms) >= 1


class TestMultiVariantSearch:
    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        from meilisearch_thai_spark.index.builder import build_index
        from meilisearch_thai_spark.query.executor import SearchEngine
        from meilisearch_thai_spark.sources.pages import generate_pages

        out = str(tmp_path_factory.mktemp("idx_mv"))
        build_index(spark, generate_pages(spark, 600, seed=11), out)
        return SearchEngine(spark, out)

    def test_returns_ranked_hits(self, engine):
        rows = engine.multi_variant_search("ปัญญาประดิษฐ์", k=10).collect()
        assert 0 < len(rows) <= 10
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert len({r["doc_id"] for r in rows}) == len(rows), "X4 dedup by doc"

    def test_superset_of_single_variant(self, engine):
        """Multi-variant recall >= plain disjunctive recall on the same terms."""
        single = {r["doc_id"] for r in engine.search("สาหร่ายวากาเมะ", k=10).collect()}
        multi = {r["doc_id"] for r in engine.multi_variant_search("สาหร่ายวากาเมะ", k=50).collect()}
        assert single <= multi

    def test_empty_query_returns_empty(self, engine):
        assert engine.multi_variant_search("", k=5).collect() == []

    def test_normalized_scores_le_one(self, engine):
        rows = engine.multi_variant_search("อาหารไทย", k=10, normalize=True).collect()
        assert rows and max(r["score"] for r in rows) <= 1.0 + 1e-9


class TestTypoTolerance:
    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        from meilisearch_thai_spark.index.builder import build_index
        from meilisearch_thai_spark.query.executor import SearchEngine
        from meilisearch_thai_spark.sources.pages import generate_pages

        out = str(tmp_path_factory.mktemp("idx_typo"))
        build_index(spark, generate_pages(spark, 600, seed=11), out)
        return SearchEngine(spark, out)

    def test_edit_distance_bounds(self):
        from meilisearch_thai_spark.query.executor import _edit_distance_within

        assert _edit_distance_within("startup", "startups", 1)
        assert _edit_distance_within("startup", "strtup", 1)  # deletion
        assert _edit_distance_within("startup", "stortup", 1)  # substitution
        assert not _edit_distance_within("startup", "strtp", 1)  # distance 2
        assert _edit_distance_within("startup", "startpu", 1)  # transposition = 1 typo
        assert _edit_distance_within("technology", "technolgoy", 2)
        assert not _edit_distance_within("abc", "xyz", 2)
        assert _edit_distance_within("same", "same", 0)

    def test_fuzzy_search_finds_typo(self, engine):
        # 'startup' is in the corpus; a misspelling should still hit via the
        # typo fallback variant (weight 0.5 < exact variants)
        good = engine.multi_variant_search("startup", k=5).collect()
        typo = engine.multi_variant_search("startpu", k=5).collect()
        assert good
        assert typo, "typo query should match via fuzzy vocabulary expansion"
        assert {r["url"] for r in typo} & {r["url"] for r in good}

    def test_short_and_thai_tokens_skip_fuzzy(self, engine):
        assert engine.expand_terms_fuzzy("abc") == []
        assert engine.expand_terms_fuzzy("ปัญญาประดิษฐ์") == []
