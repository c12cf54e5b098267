"""MeiliSearch dumps (POST /dumps): portable logical export + re-indexing
import — distinct from snapshots (binary copies).  Round-trip parity,
completeness refusal, marker contracts, settings drift preservation."""
from __future__ import annotations

import json
import os

import pytest

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.index.maintenance import (
    delete_docs,
    dump_index,
    import_dump,
)
from meilisearch_thai_spark.index.settings import (
    export_settings,
    update_filterable_attributes,
    update_stop_words,
    update_typo_tolerance,
)
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages

QUERIES = ["ปัญญาประดิษฐ์", "สาหร่ายวากาเมะ", "Startup ไทย"]


def _top(spark, idx, k=8):
    eng = SearchEngine(spark, idx, cache_postings=False)
    return {
        q: [(r["url"], round(r["score"], 9)) for r in eng.search(q, k=k).collect()]
        for q in QUERIES
    }


def test_dump_import_round_trip_after_deletes(spark, tmp_path):
    pages = generate_pages(spark, 80, seed=7)
    d = str(tmp_path / "idx")
    build_index(spark, pages, d, synonyms={"ai": ["ปัญญาประดิษฐ์"]})

    # tombstone a few docs: the dump must export only LIVE documents
    victims = [r["url"] for r in pages.limit(5).collect()]
    assert delete_docs(spark, d, victims) == 5

    dump = str(tmp_path / "dump")
    manifest = dump_index(spark, d, dump, pages)
    assert manifest["format"] == "mst-dump-v1" and manifest["n_documents"] == 75
    assert os.path.exists(os.path.join(dump, "settings.json"))
    assert not os.path.exists(dump + ".tmp")

    # import retokenizes: scores equal a FRESH build over the live corpus
    # (NOT the tombstoned original, whose stats still count deleted docs)
    live_pages = pages.where(~pages.url.isin(victims))
    fresh = str(tmp_path / "fresh")
    build_index(spark, live_pages, fresh, synonyms={"ai": ["ปัญญาประดิษฐ์"]})
    imported = str(tmp_path / "imported")
    import_dump(spark, dump, imported)
    assert _top(spark, imported) == _top(spark, fresh)

    # settings round-trip field-for-field (fingerprints included)
    assert export_settings(imported) == export_settings(d)

    # deleted urls stay gone
    got_urls = {u for hits in _top(spark, imported).values() for u, _ in hits}
    assert not (got_urls & set(victims))


def test_dump_refusals(spark, tmp_path):
    pages = generate_pages(spark, 30, seed=11)
    d = str(tmp_path / "idx")
    build_index(spark, pages, d)

    # incomplete corpus: refuse rather than silently dump a subset
    with pytest.raises(ValueError, match="must be complete"):
        dump_index(spark, d, str(tmp_path / "dump0"), pages.limit(10))
    with pytest.raises(ValueError, match="url, text"):
        dump_index(spark, d, str(tmp_path / "dump0"), pages.select("url"))

    dump = str(tmp_path / "dump")
    dump_index(spark, d, dump, pages)
    with pytest.raises(ValueError, match="already exists"):
        dump_index(spark, d, dump, pages)

    marker = os.path.join(d, "_COMPACTING")
    with open(marker, "w") as fh:
        json.dump({}, fh)
    with pytest.raises(RuntimeError, match="compaction"):
        dump_index(spark, d, str(tmp_path / "dump2"), pages)
    os.remove(marker)

    # import refuses an existing target unless overwrite
    with pytest.raises(ValueError, match="overwrite"):
        import_dump(spark, dump, d)
    before = _top(spark, d)
    import_dump(spark, dump, d, overwrite=True)
    assert _top(spark, d) == before  # same corpus + settings -> same results
    assert not os.path.exists(d + ".import_tmp")
    assert not os.path.exists(d + ".import_replaced")
    with pytest.raises(ValueError, match="not a dump"):
        import_dump(spark, str(tmp_path), str(tmp_path / "nope"))


def test_dump_preserves_query_time_settings_drift(spark, tmp_path):
    pages = generate_pages(spark, 30, seed=13)
    d = str(tmp_path / "idx")
    build_index(spark, pages, d, stored_fields=["warc_ts"])
    # drift every query-time setting away from build-time state
    update_typo_tolerance(d, one_typo=6, two_typos=11, disable_on_words=["Spark"])
    update_filterable_attributes(d, ["warc_ts"])
    update_stop_words(d, ["ขณะที่"])
    from meilisearch_thai_spark.index.settings import (
        update_faceting,
        update_pagination,
        update_prefix_search,
    )

    update_pagination(d, 50)
    update_faceting(d, 7)
    update_prefix_search(d, False)

    dump = str(tmp_path / "dump")
    dump_index(spark, d, dump, pages)
    imported = str(tmp_path / "imported")
    import_dump(spark, dump, imported)

    a, b = export_settings(d), export_settings(imported)
    assert a == b
    assert b["typo_tolerance"]["one_typo"] == 6
    assert b["filterable_attributes"] == ["warc_ts"]
    assert b["stop_words"] == ["ขณะที่"]
    assert b["stored_fields"] == ["warc_ts"]
    assert b["pagination"] == {"max_total_hits": 50}
    assert b["faceting"] == {"max_values_per_facet": 7}
    assert b["prefix_search"] is False and b["facet_search"] is True
