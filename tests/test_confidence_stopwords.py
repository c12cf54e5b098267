"""Q3 tokenization confidence + T12 stop-word hook (VERDICT r1 item 6 —
previously claimed in COVERAGE.md without code; now real).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from meilisearch_thai_spark.query.pipeline import (
    CHAR_FALLBACK_CONFIDENCE,
    process_query,
    tokenization_confidence,
)
from meilisearch_thai_spark.tokenizer import default_segmenter


# ---------------------------------------------------------------- Q3
def test_confidence_bands():
    # a well-segmented Thai compound: few tokens over many chars, token
    # lengths in the preferred 2-6 band -> high confidence
    good = tokenization_confidence("ปัญญาประดิษฐ์", ["ปัญญา", "ประดิษฐ์"])
    assert good > 0.85
    # degenerate char-soup segmentation: tokens-per-char = 1 -> penalized
    bad = tokenization_confidence("กขค", ["ก", "ข", "ค"])
    assert bad < good
    assert tokenization_confidence("x", []) == 0.0


def test_confidence_monotone_in_token_quality():
    q = "ปัญญาประดิษฐ์และหุ่นยนต์"
    whole = tokenization_confidence(q, ["ปัญญาประดิษฐ์และหุ่นยนต์"])  # avg len 24
    normal = tokenization_confidence(q, ["ปัญญาประดิษฐ์", "และ", "หุ่นยนต์"])
    assert normal > whole  # over-long tokens are down-weighted


def test_confidence_feeds_variant_weights():
    pq = process_query("ปัญญาประดิษฐ์")
    by_type = {v.variant_type: v for v in pq.variants}
    assert "tokenized" in by_type
    conf = by_type["tokenized"].metadata["tokenization_confidence"]
    assert 0.0 < conf <= 1.0
    # fallback variants carry the pinned char-level confidence
    for v in pq.variants:
        if v.variant_type == "fallback":
            assert v.metadata["tokenization_confidence"] == CHAR_FALLBACK_CONFIDENCE


def test_per_token_confidence_scores_populated():
    seg = default_segmenter()
    res = seg.segment_text("ปัญญาประดิษฐ์ abc ฿")
    assert res.confidence_scores is not None
    assert len(res.confidence_scores) == len(res.tokens)
    by_tok = dict(zip(res.tokens, res.confidence_scores))
    assert by_tok.get("abc") == 0.9
    # dictionary Thai words are fully confident
    assert all(
        c == 1.0
        for t, c in by_tok.items()
        if t in seg.trie and not t.isascii()
    )


# ---------------------------------------------------------------- T12
STOP = "อาหาร"


def test_stopwords_removed_from_postings(spark, tmp_path):
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index, load_meta
    from meilisearch_thai_spark.query.executor import SearchEngine

    rows = [
        ("u1", datetime(2024, 1, 1), b"", "อาหารเทคโนโลยี", "th"),
        ("u2", datetime(2024, 1, 1), b"", "เทคโนโลยี", "th"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = str(tmp_path / "idx_stop")
    meta = build_index(spark, pages, out, stopwords=[STOP])
    assert meta.stopwords_fingerprint != ""
    assert load_meta(out).stopwords_fingerprint == meta.stopwords_fingerprint
    eng = SearchEngine(spark, out, cache_postings=False)
    terms = {r["term"] for r in eng.postings.select("term").distinct().collect()}
    assert STOP not in terms and "เทคโนโลยี" in terms
    assert eng.search_terms([STOP], k=5).collect() == []
    # doc_len counts indexed terms only: u1 = [อาหาร(dropped), เทคโนโลยี] -> 1
    dls = {r["url"]: r["doc_len"] for r in eng.doc_stats.select("url", "doc_len").collect()}
    assert dls == {"u1": 1, "u2": 1}


def test_stopword_query_terms_dropped_not_required(spark, tmp_path):
    """A query mixing a stop-word with a real term must match on the real
    term — conjunctive strategies must NOT require the (unindexed, df=0)
    stop-word (code-review r2 finding)."""
    from datetime import datetime

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.executor import SearchEngine

    pages = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 1), b"", "อาหารเทคโนโลยี", "th"),
            ("u2", datetime(2024, 1, 1), b"", "เทคโนโลยี", "th"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = str(tmp_path / "idx_stopq")
    build_index(spark, pages, out, stopwords=[STOP])
    eng = SearchEngine(spark, out, cache_postings=False)
    for matching in ("all", "last", "frequency", "best"):
        hits = {r["url"] for r in eng.search_terms([STOP, "เทคโนโลยี"], k=5, matching=matching).collect()}
        assert hits == {"u1", "u2"}, matching
    # full proxy path too (original variant is conjunctive)
    mv = {r["url"] for r in eng.multi_variant_search(f"{STOP}เทคโนโลยี", k=5).collect()}
    assert mv == {"u1", "u2"}


def test_phrase_across_stopword_matches(spark, tmp_path):
    """Quoted phrases drop stop-words on BOTH sides: the build strips them
    before position numbering, so surviving terms become adjacent — the
    query-side phrase chain must match that renumbering (review r2.2)."""
    from datetime import datetime

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.executor import SearchEngine

    pages = spark.createDataFrame(
        [
            # terms: [เทคโนโลยี, อาหาร(stop), โรงเรียน] -> adjacent after strip
            ("u1", datetime(2024, 1, 1), b"", "เทคโนโลยีอาหารโรงเรียน", "th"),
            # terms: [เทคโนโลยี, ไทย, โรงเรียน] -> NOT adjacent (ไทย kept)
            ("u2", datetime(2024, 1, 1), b"", "เทคโนโลยีไทยโรงเรียน", "th"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = str(tmp_path / "idx_stop_phrase")
    build_index(spark, pages, out, stopwords=[STOP], positional=True)
    eng = SearchEngine(spark, out, cache_postings=False)
    hits = {r["url"] for r in eng.search_phrase(["เทคโนโลยี", STOP, "โรงเรียน"], k=5).collect()}
    assert hits == {"u1"}
    mv = {r["url"] for r in eng.multi_variant_search('"เทคโนโลยี อาหาร โรงเรียน"', k=5).collect()}
    assert "u1" in mv
    phrase_rows = [
        r for r in eng.multi_variant_search('"เทคโนโลยี อาหาร โรงเรียน"', k=5).collect()
        if r["variant_type"] == "phrase"
    ]
    assert {r["url"] for r in phrase_rows} == {"u1"}


def test_no_stopwords_default_unchanged(spark, tmp_path):
    from meilisearch_thai_spark.index.builder import build_index

    pages = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1), b"", "อาหารเทคโนโลยี", "th")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    meta = build_index(spark, pages, str(tmp_path / "idx_nostop"))
    assert meta.stopwords_fingerprint == ""
