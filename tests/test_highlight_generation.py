"""E1b: search-time highlight generation + crop (VERDICT r1 item 4).

The reference returns `_formatted` hits with <em> markers inserted around
matches and cropLength-bounded context (search_executor.py:705-723), doubling
the crop window for Thai text capped at 400 (:874-878).
"""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.query.enhancer import (
    CROP_MARKER,
    crop_and_highlight,
    extract_highlights,
)


def test_marks_inserted_around_terms():
    out, hl = crop_and_highlight("the quick brown fox", ["quick", "fox"], crop_length=200)
    assert out == "the <em>quick</em> brown <em>fox</em>"
    assert hl == ["quick", "fox"]


def test_longest_term_wins_alternation():
    out, hl = crop_and_highlight("อาหารไทยอร่อย", ["อาหาร", "อาหารไทย"], crop_length=200)
    assert "<em>อาหารไทย</em>" in out
    assert "<em>อาหาร</em>ไทย" not in out


def test_zwsp_tolerant_thai_match():
    # stored text with a ZWSP inside the compound still highlights
    text = "ปัญญา​ประดิษฐ์ คือ"
    out, hl = crop_and_highlight(text, ["ปัญญาประดิษฐ์"], crop_length=200)
    assert out.startswith("<em>")
    assert hl and "ปัญญา" in hl[0]


def test_crop_centers_on_first_match():
    text = "x" * 500 + " needle " + "y" * 500
    out, hl = crop_and_highlight(text, ["needle"], crop_length=100, thai_crop_double=False)
    assert "<em>needle</em>" in out
    assert out.startswith(CROP_MARKER) and out.endswith(CROP_MARKER)
    # window bounded: crop_length chars + markers + tags
    assert len(out) <= 100 + 2 * len(CROP_MARKER) + len("<em></em>")


def test_no_match_head_crop():
    text = "z" * 300
    out, hl = crop_and_highlight(text, ["missing"], crop_length=50, thai_crop_double=False)
    assert out == "z" * 50 + CROP_MARKER
    assert hl == []


def test_thai_crop_doubles_capped():
    thai = "ก" * 600
    out, _ = crop_and_highlight(thai, [], crop_length=300)
    # 300 doubles to min(600, 400) = 400
    assert out == "ก" * 400 + CROP_MARKER
    out2, _ = crop_and_highlight(thai, [], crop_length=300, thai_crop_double=False)
    assert out2 == "ก" * 300 + CROP_MARKER


def test_round_trip_with_extractor():
    out, _ = crop_and_highlight("alpha beta gamma", ["beta"], crop_length=200)
    assert extract_highlights(out) == ["beta"]


def test_service_hits_carry_formatted(spark, tmp_path_factory):
    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.service import SearchService
    from meilisearch_thai_spark.sources.pages import generate_pages

    out = str(tmp_path_factory.mktemp("svc_idx_hl"))
    # store enough content that matched terms fall inside the stored crop
    # (the reference highlights the full attribute; we highlight what's stored)
    build_index(spark, generate_pages(spark, 400, seed=17), out, store_text_crop=1500)
    svc = SearchService(spark, out, cache_postings=False)
    r = svc.search("ปัญญาประดิษฐ์", limit=10)
    assert r.hits
    marked = [h for h in r.hits if "<em>" in h.formatted]
    assert marked, "no hit carries generated <em> markers"
    assert all(h.highlights for h in marked)
    # crop respected (crop_length default 200, Thai doubling cap 400)
    assert all(len(h.formatted) <= 400 + 40 for h in r.hits)


def test_match_positions_exact_offsets():
    """_matchesPosition: character offsets and lengths of every term
    occurrence in the unmodified value, text order, non-overlapping."""
    from meilisearch_thai_spark.query.enhancer import match_positions

    text = "wakame salad with wakame dressing"
    got = match_positions(text, ["wakame", "dressing"])
    assert got == [
        {"start": 0, "length": 6},
        {"start": 18, "length": 6},
        {"start": 25, "length": 8},
    ]
    for p in got:
        assert text[p["start"] : p["start"] + p["length"]] in ("wakame", "dressing")
    assert match_positions("", ["wakame"]) == []
    assert match_positions(text, []) == []


def test_service_show_matches_position(spark, tmp_path):
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.service import SearchService

    out = str(tmp_path / "idx_mp")
    rows = [("https://t/1", "wakame salad with wakame", "en")]
    pages = spark.createDataFrame(rows, "url string, text string, lang string").select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    build_index(spark, pages, out, store_text_crop=200)
    svc = SearchService(spark, out, cache_postings=False)
    r = svc.search("wakame", limit=5, show_matches_position=True)
    assert r.hits and r.hits[0].matches_position["text"] == [
        {"start": 0, "length": 6},
        {"start": 18, "length": 6},
    ]
    r2 = svc.search("wakame", limit=5)  # off by default
    assert r2.hits[0].matches_position == {}
