"""Runtime custom-dictionary management (reference config.py:389-535
add_dictionary_words / remove_dictionary_words / get_custom_dictionary):
adding a compound word changes QUERY tokenization immediately, documents
pick it up after the add_documents reprocess path, export round-trips the
word, and removal restores the pinned dictionary.

The probe word ควอนตัมคอมพิวเตอร์ ("quantum computer") is NOT in the packaged
dictionary — newmm splits it into the two packaged words ควอนตัม +
คอมพิวเตอร์ until the overlay registers the compound (the wakame story with
a word the data files don't already carry).
"""

from __future__ import annotations

import os

import pytest

from meilisearch_thai_spark import dictionary as D
from meilisearch_thai_spark.index.settings import (
    export_settings,
    get_custom_dictionary,
    reprocess_documents,
    update_dictionary,
)
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.streaming.ingest import add_documents
from meilisearch_thai_spark.tokenizer import tokenize_for_index

WORD = "ควอนตัมคอมพิวเตอร์"
PARTS = ["ควอนตัม", "คอมพิวเตอร์"]


@pytest.fixture(autouse=True)
def _clean_overlay():
    """The overlay is process-global by design (one effective dictionary per
    tokenizing process) — always restore the pinned dictionary."""
    D.set_custom_words([])
    yield
    D.set_custom_words([])


def _pages(spark):
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (f"https://ex.com/{i}", t, "th", ts, None)
        for i, t in enumerate(
            [
                f"งานวิจัย{WORD}ล่าสุด",  # carries the compound
                f"ข่าว{WORD}ประจำวัน",  # carries the compound
                "ร้านอาหารไทยอร่อยมาก",
                "คอมพิวเตอร์ราคาถูก",  # second part alone
            ]
        )
    ]
    return spark.createDataFrame(
        rows, "url string, text string, lang string, warc_ts timestamp, html binary"
    )


def test_query_tokens_change_immediately(tmp_path, spark):
    out = str(tmp_path / "idx")
    add_documents(spark, _pages(spark), out, n_shards=2)
    assert tokenize_for_index(WORD) == PARTS

    update_dictionary(out, add=[WORD])
    # query-side effect is immediate in this process
    assert tokenize_for_index(WORD) == [WORD]
    assert get_custom_dictionary(out) == [WORD]
    exp = export_settings(out)
    assert exp["custom_dictionary"] == [WORD]
    # effective fingerprint diverges from the build fingerprint until docs
    # are reprocessed
    assert exp["effective_dictionary_fingerprint"] != exp["dictionary_fingerprint"]


def test_documents_pick_up_word_after_reprocess(tmp_path, spark):
    out = str(tmp_path / "idx")
    pages = _pages(spark)
    add_documents(spark, pages, out, n_shards=2)

    update_dictionary(out, add=[WORD])
    eng = SearchEngine(spark, out)
    # stale postings: the compound term does not exist yet (docs were
    # tokenized pre-update), but the split parts do
    assert eng.term_dfs([WORD])[WORD] == 0
    assert eng.term_dfs([PARTS[1]])[PARTS[1]] > 0

    # route the affected documents through the existing add_documents
    # retokenize path (re-add == overwrite by primary key)
    affected = pages.filter(pages.text.contains(WORD))
    meta = reprocess_documents(spark, affected, out)
    assert meta.custom_dictionary == [WORD]
    # the finalize re-stamped the build fingerprint with the overlay applied
    assert export_settings(out)["effective_dictionary_fingerprint"] == (
        export_settings(out)["dictionary_fingerprint"]
    )

    eng.refresh_index()
    assert eng.term_dfs([WORD])[WORD] == 2
    urls = {r["url"] for r in eng.search(WORD, k=5).collect()}
    assert urls == {"https://ex.com/0", "https://ex.com/1"}


def test_removal_round_trips(tmp_path, spark):
    out = str(tmp_path / "idx")
    add_documents(spark, _pages(spark), out, n_shards=2)
    update_dictionary(out, add=[WORD])
    assert tokenize_for_index(WORD) == [WORD]
    update_dictionary(out, remove=[WORD])
    assert get_custom_dictionary(out) == []
    assert tokenize_for_index(WORD) == PARTS
    exp = export_settings(out)
    assert exp["effective_dictionary_fingerprint"] == exp["dictionary_fingerprint"]
    # removing an absent word is an idempotent no-op
    update_dictionary(out, remove=[WORD])


def test_packaged_words_are_pinned(tmp_path, spark):
    out = str(tmp_path / "idx")
    add_documents(spark, _pages(spark), out, n_shards=2)
    with pytest.raises(ValueError, match="packaged dictionary"):
        update_dictionary(out, remove=["วากาเมะ"])
    with pytest.raises(ValueError, match="both add= and remove="):
        update_dictionary(out, add=[WORD], remove=[WORD])


def test_classic_layout_reprocess_raises_with_rebuild_guidance(tmp_path, spark):
    from meilisearch_thai_spark.index.builder import build_index

    out = str(tmp_path / "classic")
    pages = _pages(spark)
    build_index(spark, pages, out)
    update_dictionary(out, add=[WORD])
    with pytest.raises(ValueError, match="[Rr]ebuild"):
        reprocess_documents(spark, pages, out)


def test_overlay_reaches_executor_workers(tmp_path, spark):
    """The build tokenizes in executor Python workers (separate processes);
    the overlay must ride the closure, not ambient module state."""
    from meilisearch_thai_spark.index.builder import build_index

    out = str(tmp_path / "fresh")
    D.set_custom_words([WORD])
    build_index(spark, _pages(spark), out)
    eng = SearchEngine(spark, out)
    assert eng.term_dfs([WORD])[WORD] == 2
    # and the meta records the effective dictionary it was built with
    from meilisearch_thai_spark.index.builder import load_meta

    assert load_meta(out).dictionary_fingerprint == D.dictionary_fingerprint()


def test_settings_survive_unrelated_delta_add(tmp_path, spark):
    out = str(tmp_path / "idx")
    pages = _pages(spark)
    add_documents(spark, pages, out, n_shards=2)
    update_dictionary(out, add=[WORD])
    import datetime

    extra = spark.createDataFrame(
        [("https://ex.com/9", "หนังสือเล่มใหม่", "th", datetime.datetime(2026, 1, 2), None)],
        "url string, text string, lang string, warc_ts timestamp, html binary",
    )
    add_documents(spark, extra, out, n_shards=2)
    assert get_custom_dictionary(out) == [WORD]
