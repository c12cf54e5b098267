"""Q10 tail parity: Latin suffix-wildcard completions and Thai typo
tolerance (VERDICT r2 item 6; reference tokenizer/query_processor.py:328-471
and the script-agnostic MeiliSearch typo rule)."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def latin_engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_suffix"))
    texts = [
        "the notebook sat on the desk near another notebook",
        "a cookbook full of recipes and a second cookbook",
        "the handbook explains the rules of the handbook",
        "plain words without the target pattern at all",
        "guidebook and textbook share a shelf",
    ]
    pages = spark.createDataFrame(
        [(f"{i:04d}", t, "en") for i, t in enumerate(texts)],
        "url string, text string, lang string",
    )
    build_index(spark, pages, out)
    return SearchEngine(spark, out, cache_postings=False)


@pytest.fixture(scope="module")
def thai_engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_thaifuzzy"))
    build_index(spark, generate_pages(spark, 300, seed=31), out)
    return SearchEngine(spark, out, cache_postings=False)


def test_suffix_expansion_finds_endswith_terms(latin_engine):
    got = set(latin_engine.expand_terms_suffix("book"))
    assert {"notebook", "cookbook", "handbook", "guidebook", "textbook"} <= got


def test_suffix_expansion_excludes_exact_and_nonmatching(latin_engine):
    assert "notebook" not in latin_engine.expand_terms_suffix("notebook")
    assert latin_engine.expand_terms_suffix("zzz") == []
    assert latin_engine.expand_terms_suffix("a") == []  # too short


def test_suffix_query_hits_end_to_end(latin_engine):
    # 'book' itself is NOT an index term; hits must come via the suffix
    # fallback variant
    hits = latin_engine.multi_variant_search("book", k=10).collect()
    assert hits, "suffix expansion produced no hits"
    urls = {r["url"] for r in hits}
    assert "0003" not in urls  # the no-pattern doc never matches


def test_thai_fuzzy_one_edit(thai_engine):
    vocab = [t for t in thai_engine.vocabulary() if not t.isascii() and len(t) >= 7]
    assert vocab, "no long Thai terms in test corpus"
    word = max(vocab, key=len)
    typo = word[:3] + ("ก" if word[3] != "ก" else "ข") + word[4:]
    assert typo != word and len(typo) == len(word)
    got = thai_engine.expand_terms_fuzzy(typo, max_expansions=10)
    assert word in got


def test_fuzzy_never_crosses_scripts(thai_engine):
    # a Latin token must not pull Thai neighbors and vice versa
    for tok in ("startup", "technology"):
        assert all(t.isascii() for t in thai_engine.expand_terms_fuzzy(tok))
    thai_tok = next(t for t in thai_engine.vocabulary() if not t.isascii() and len(t) >= 5)
    assert all(not t.isascii() for t in thai_engine.expand_terms_fuzzy(thai_tok))


def test_fuzzy_thai_feeds_fallback_variant(thai_engine):
    vocab = [t for t in thai_engine.vocabulary() if not t.isascii() and len(t) >= 7]
    word = max(vocab, key=len)
    typo = word[:3] + ("ก" if word[3] != "ก" else "ข") + word[4:]
    variants = thai_engine._expansion_variants([typo], {typo})
    fuzzy_sets = [terms for terms, _w in variants if word in terms]
    assert fuzzy_sets, "typo token did not produce a fuzzy fallback variant"


def test_typo_search_end_to_end(latin_engine):
    # 'cookbok' (1 deletion from 'cookbook') misses the vocabulary; the
    # expanded set scored through search_terms must equal searching the
    # corrected term directly — same docs, same BM25 scores
    assert "cookbok" not in latin_engine.vocabulary()
    terms = latin_engine.expand_terms_fuzzy("cookbok", max_expansions=100)
    assert "cookbook" in terms
    via_typo = latin_engine.search_terms(sorted(terms), k=10).collect()
    direct = latin_engine.search_terms(["cookbook"], k=10).collect()
    typo_hits = {r["url"]: r["score"] for r in via_typo}
    # every direct hit survives the expanded search (k=10 > corpus size, so
    # nothing can fall off the page) with at least its direct score —
    # matching="best" only ADDS terms to a doc's sum
    for r in direct:
        assert r["url"] in typo_hits
        assert typo_hits[r["url"]] >= r["score"]


def test_typo_search_full_path_finds_corrected_docs(latin_engine):
    # the public search() path: a typo'd query still lands on the cookbook
    # doc via the fuzzy fallback variant (weight 0.5, fires only on OOV)
    hits = latin_engine.multi_variant_search("cookbok", k=10).collect()
    assert any(r["url"] == "0001" for r in hits)
