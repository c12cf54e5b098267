"""Q7 matching strategies 'last' and 'frequency' (VERDICT r1 item 3).

Reference mapping (query_processor.py:954-981, search_executor.py:735-742):
tokenized/compound/mixed → 'last' (drop trailing terms until hits),
fallback → 'frequency' (require rarest terms, relax Zipf-head terms first).
Expressed as conjunctive prefix sub-variants scored in one job
(executor.matching_prefixes); a doc's longest matched prefix wins dedup.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine, matching_prefixes

DOCS = [
    ("u1", "เทคโนโลยีอาหาร"),  # both TECH and FOOD
    ("u2", "เทคโนโลยี"),  # TECH only
    ("u3", "อาหาร"),  # FOOD only
    ("u4", "อาหารอาหารไทย"),  # FOOD + compound (pushes df(FOOD) above df(TECH))
]
TECH, FOOD, MISSING = "เทคโนโลยี", "อาหาร", "zzzmissing"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_q7"))
    rows = [
        (u, datetime(2024, 1, 1), b"", t, "th")
        for u, t in DOCS
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    build_index(spark, pages, out)
    return SearchEngine(spark, out, cache_postings=False)


def test_prefix_expansion_shapes():
    assert matching_prefixes(["a", "b", "c"], "last") == [["a", "b", "c"], ["a", "b"], ["a"]]
    assert matching_prefixes(["a", "b"], "best") == [["a", "b"]]
    assert matching_prefixes(["a"], "last") == [["a"]]
    # frequency: rarest first, ties keep query order
    dfs = {"common": 100, "rare": 2, "mid": 10}
    assert matching_prefixes(["common", "rare", "mid"], "frequency", dfs) == [
        ["rare", "mid", "common"],
        ["rare", "mid"],
        ["rare"],
    ]
    # cap: at most max_levels prefixes, longest kept
    out = matching_prefixes(list("abcdefgh"), "last", max_levels=3)
    assert len(out) == 3 and out[0] == list("abcdefgh") and out[-1] == list("abcdef")


def test_all_misses_where_last_hits(eng):
    terms = [TECH, FOOD, MISSING]
    assert eng.search_terms(terms, k=10, matching="all").collect() == []
    hits = {r["url"]: r for r in eng.search_terms(terms, k=10, matching="last").collect()}
    # u1 matches the 2-term prefix, u2 the 1-term prefix; u3/u4 lack the
    # LEADING term so no prefix admits them
    assert set(hits) == {"u1", "u2"}
    assert hits["u1"]["terms_matched"] == 2
    assert hits["u2"]["terms_matched"] == 1
    assert hits["u1"]["score"] > hits["u2"]["score"]  # longer prefix dominates


def test_frequency_requires_rarest_first(eng):
    # df(FOOD)=3 (u1,u3,u4) > df(TECH)=2 (u1,u2), so 'frequency' reorders to
    # [TECH, FOOD]: TECH-only docs survive the relaxation, FOOD-only docs do
    # not — the mirror image of 'last' on the same term order
    terms = [FOOD, TECH]
    assert eng.term_dfs(terms) == {FOOD: 3, TECH: 2}
    freq = {r["url"] for r in eng.search_terms(terms, k=10, matching="frequency").collect()}
    last = {r["url"] for r in eng.search_terms(terms, k=10, matching="last").collect()}
    assert freq == {"u1", "u2"}
    assert last == {"u1", "u3", "u4"}


def test_multi_variant_long_query_recovers(eng):
    # original variant is conjunctive and the trailing token is absent from
    # the index: without 'last' this query returns nothing
    hits = eng.multi_variant_search(f"เทคโนโลยีอาหาร {MISSING}", k=10).collect()
    assert hits, "'last' matching should recover the 2-term prefix"
    assert {r["url"] for r in hits} >= {"u1"}


def test_single_term_unaffected(eng):
    for m in ("last", "frequency", "best", "all"):
        hits = {r["url"] for r in eng.search_terms([TECH], k=10, matching=m).collect()}
        assert hits == {"u1", "u2"}, m


def test_strategy_override_dedups_variants():
    # the request-level override collapses original/all + tokenized/last
    # (identical text) into one variant — no double-scoring
    from meilisearch_thai_spark.query.pipeline import process_query

    pq = process_query("สวัสดี ครับ", matching_strategy="all")
    keys = [(v.query_text.lower(), v.matching) for v in pq.variants]
    assert len(keys) == len(set(keys))
    assert all(m == "all" for _, m in keys if m != "phrase")
