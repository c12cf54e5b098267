"""Document deletion (tombstones) + compaction (reference
meilisearch_integration/client.py:251-268 delete_document[s])."""

from __future__ import annotations

import os

import pytest

from meilisearch_thai_spark.index.builder import build_index, load_meta
from meilisearch_thai_spark.index.maintenance import compact_index, delete_docs, tombstoned_ids
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages

N = 500


def _common_term(eng):
    """Highest-df index term — guarantees enough matches to refill pages."""
    from pyspark.sql import functions as F

    return eng.postings.groupBy("term").agg(F.max("df").alias("df")).orderBy(
        F.desc("df"), F.asc("term")
    ).limit(1).collect()[0]["term"]


@pytest.fixture()
def built(spark, tmp_path):
    out = str(tmp_path / "idx_del")
    pages = generate_pages(spark, N, seed=33).persist()
    build_index(spark, pages, out, bucket_span=128)
    return out, pages


def test_delete_excludes_from_all_paths(spark, built):
    out, pages = built
    base = SearchEngine(spark, out, cache_postings=False)
    term = _common_term(base)
    victims = [r["url"] for r in base.search_terms([term], k=3).collect()]
    assert delete_docs(spark, out, victims) == len(victims) == 3
    assert delete_docs(spark, out, ["https://no.such/url"]) == 0

    cold = SearchEngine(spark, out, cache_postings=False)
    hits_cold = [r["url"] for r in cold.search_terms([term], k=10).collect()]
    assert not set(victims) & set(hits_cold) and len(hits_cold) == 10  # page refilled
    # conjunctive + filtered + sort paths exclude too
    assert not set(victims) & {
        r["url"] for r in cold.search_terms([term], k=10, filters={"lang": {"$in": ["th", "th-en", "en"]}}).collect()
    }
    assert not set(victims) & {
        r["url"] for r in cold.search_terms([term], k=10, sort=["doc_len:desc", "doc_id:asc"]).collect()
    }
    # warm serving tier
    warm = SearchEngine(spark, out)
    assert not set(victims) & {r["url"] for r in warm.search_page(term, k=10)}
    warm.postings.unpersist()
    warm.doc_stats.unpersist()
    if warm._warm is not None:
        warm._warm.unpersist()


def test_compact_matches_fresh_build(spark, built, tmp_path):
    out, pages = built
    base = SearchEngine(spark, out, cache_postings=False)
    term = _common_term(base)
    victims = [r["url"] for r in base.search_terms([term], k=2).collect()]
    delete_docs(spark, out, victims)
    meta = compact_index(spark, out)
    assert meta.n_docs == N - 2
    assert tombstoned_ids(spark, out) == []
    assert load_meta(out).n_postings == meta.n_postings

    # scores per url equal a FRESH build over the surviving corpus
    fresh_dir = str(tmp_path / "idx_fresh")
    from pyspark.sql import functions as F

    build_index(spark, pages.filter(~F.col("url").isin(victims)), fresh_dir, bucket_span=128)
    compacted = SearchEngine(spark, out, cache_postings=False)
    fresh = SearchEngine(spark, fresh_dir, cache_postings=False)
    for q in (term, "อาหารไทย", "ปัญญาประดิษฐ์"):
        a = [(r["url"], round(r["score"], 9)) for r in compacted.search(q, k=10).collect()]
        b = [(r["url"], round(r["score"], 9)) for r in fresh.search(q, k=10).collect()]
        assert a == b, q
    # idempotent no-op when nothing is tombstoned
    again = compact_index(spark, out)
    assert again.n_docs == meta.n_docs


def test_rebuild_clears_tombstones_and_live_refresh(spark, built):
    """Tombstones are url-keyed but a FRESH build defines a new document set:
    stale tombstones must not dangle onto reassigned doc ids (review r2.3).
    Live engines pick up deletes via refresh_deletes()."""
    out, pages = built
    live = SearchEngine(spark, out, cache_postings=False)
    term = _common_term(live)
    victim = live.search_terms([term], k=1).collect()[0]["url"]
    delete_docs(spark, out, [victim])
    # snapshot semantics: the live engine still serves it until refreshed
    assert victim in {r["url"] for r in live.search_terms([term], k=5).collect()}
    assert live.refresh_deletes() == 1
    assert victim not in {r["url"] for r in live.search_terms([term], k=5).collect()}
    # rebuilding over the same dir resets the delete (re-add semantics)
    build_index(spark, pages, out, bucket_span=128)
    assert tombstoned_ids(spark, out) == []
    fresh = SearchEngine(spark, out, cache_postings=False)
    assert victim in {r["url"] for r in fresh.search_terms([term], k=5).collect()}


def test_compact_positional_keeps_phrases(spark, tmp_path):
    out = str(tmp_path / "idx_del_pos")
    pages = generate_pages(spark, 300, seed=35)
    build_index(spark, pages, out, bucket_span=128, positional=True)
    eng = SearchEngine(spark, out, cache_postings=False)
    # pick a doc and a 2-term phrase from its indexed terms
    from meilisearch_thai_spark.tokenizer import extract_index_terms, tokenize_for_index

    row = eng.doc_stats.orderBy("doc_id").limit(1).collect()[0]
    text = pages.filter(pages.url == row["url"]).collect()[0]["text"]
    terms = extract_index_terms(tokenize_for_index(text))
    phrase = terms[:2]
    assert eng.search_phrase(phrase, k=5).collect()
    # delete a different doc and compact; phrase search still works
    other = eng.doc_stats.orderBy(eng.doc_stats.doc_id.desc()).limit(1).collect()[0]["url"]
    delete_docs(spark, out, [other])
    meta = compact_index(spark, out)
    assert meta.positional
    eng2 = SearchEngine(spark, out, cache_postings=False)
    hits = {r["url"] for r in eng2.search_phrase(phrase, k=5).collect()}
    assert row["url"] in hits and other not in hits


def test_repeat_delete_counts_zero_and_refresh_index(spark, built):
    """delete_docs returns NEWLY deleted urls only (repeat delete -> 0), and
    refresh_index() rebinds a live engine after compaction (the maintenance
    single-writer contract: stale DataFrames over swapped dirs otherwise)."""
    out, pages = built
    live = SearchEngine(spark, out)  # warm engine held ACROSS the compaction
    term = _common_term(live)
    victim = live.search_page(term, k=1)[0]["url"]
    assert delete_docs(spark, out, [victim]) == 1
    assert delete_docs(spark, out, [victim]) == 0  # repeat: nothing new
    assert delete_docs(spark, out, [victim, "https://no.such/url"]) == 0
    compact_index(spark, out)
    live.refresh_index()
    assert live.meta.n_docs == N - 1
    hits = {r["url"] for r in live.search_page(term, k=10)}
    assert victim not in hits and len(hits) == 10
    live.refresh_index()  # idempotent on an already-fresh engine
    assert victim not in {r["url"] for r in live.search_page(term, k=5)}
    live.postings.unpersist()
    live.doc_stats.unpersist()
    if live._warm is not None:
        live._warm.unpersist()


def test_swap_indexes_exchanges_content(spark, tmp_path):
    """swapIndexes: the zero-downtime deploy primitive — after the swap each
    directory serves the other's corpus; guards refuse non-indexes and
    self-swaps."""
    import pytest
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.maintenance import swap_indexes
    from meilisearch_thai_spark.query.executor import SearchEngine

    def mk(name, word):
        out = str(tmp_path / name)
        pages = spark.createDataFrame(
            [(f"https://{name}/1", f"{word} content body", "en")],
            "url string, text string, lang string",
        ).select(
            "url",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text", "lang",
        )
        build_index(spark, pages, out)
        return out

    a, b = mk("prod", "wakame"), mk("staging", "quinoa")
    swap_indexes(a, b)
    hits_a = SearchEngine(spark, a, cache_postings=False).search_terms(["quinoa"], k=5).collect()
    hits_b = SearchEngine(spark, b, cache_postings=False).search_terms(["wakame"], k=5).collect()
    assert hits_a and hits_b  # contents exchanged
    assert not list((tmp_path).glob("*.swapping"))  # marker cleaned up
    with pytest.raises(ValueError, match="itself"):
        swap_indexes(a, a)
    with pytest.raises(ValueError, match="not a built index"):
        swap_indexes(a, str(tmp_path / "nope"))


def test_list_documents_pagination_and_deletes(spark, tmp_path):
    """GET /documents parity: deterministic doc_id-ordered pages, tombstoned
    docs excluded, field selection validated against the public surface."""
    import pytest
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.maintenance import delete_docs
    from meilisearch_thai_spark.query.executor import SearchEngine

    out = str(tmp_path / "idx_list")
    rows = [(f"https://t/{i:02d}", f"document body number {i}", "en") for i in range(10)]
    pages = spark.createDataFrame(rows, "url string, text string, lang string").select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", "lang",
    )
    build_index(spark, pages, out)
    eng = SearchEngine(spark, out, cache_postings=False)
    p1 = [r["url"] for r in eng.list_documents(limit=4).collect()]
    p2 = [r["url"] for r in eng.list_documents(offset=4, limit=4).collect()]
    p3 = [r["url"] for r in eng.list_documents(offset=8, limit=4).collect()]
    assert p1 + p2 + p3 == [f"https://t/{i:02d}" for i in range(10)]  # stable full sweep
    assert delete_docs(spark, out, ["https://t/02"]) == 1
    eng.refresh_deletes()
    urls = [r["url"] for r in eng.list_documents(limit=20).collect()]
    assert "https://t/02" not in urls and len(urls) == 9
    got = eng.list_documents(limit=1, fields=["lang"]).columns
    assert got == ["doc_id", "lang"]
    with pytest.raises(ValueError, match="attributes_to_retrieve"):
        eng.list_documents(fields=["norm_hash"])
    with pytest.raises(ValueError, match="offset"):
        eng.list_documents(offset=-1)
    # GET /documents/:id — single fetch by external key, 404 on absent or
    # tombstoned keys, field selection like the listing
    doc = eng.get_document("https://t/05")
    assert doc["url"] == "https://t/05" and doc["lang"] == "en"
    assert set(eng.get_document("https://t/05", fields=["lang"])) == {"doc_id", "lang"}
    with pytest.raises(ValueError, match="not found"):
        eng.get_document("https://t/02")  # deleted above
    with pytest.raises(ValueError, match="not found"):
        eng.get_document("https://no.such/url")
    with pytest.raises(ValueError, match="attributes_to_retrieve"):
        eng.get_document("https://t/05", fields=["norm_hash"])


def test_index_exists_and_delete_index(spark, tmp_path):
    """Index lifecycle completion (reference client.py:125-150, 330-344):
    exists round-trips across build and delete; delete refuses mid-swap /
    mid-compaction."""
    import json

    from meilisearch_thai_spark.index.maintenance import delete_index, index_exists

    d = str(tmp_path / "idx_life")
    assert not index_exists(d)
    with pytest.raises(ValueError, match="not an index"):
        delete_index(d)
    assert delete_index(d, missing_ok=True) is False

    build_index(spark, generate_pages(spark, 60, seed=5), d)
    assert index_exists(d)

    # refuses while a compaction marker is present
    marker = os.path.join(d, "_COMPACTING")
    with open(marker, "w") as fh:
        json.dump({}, fh)
    with pytest.raises(RuntimeError, match="compaction"):
        delete_index(d)
    os.remove(marker)

    # refuses while a swap marker sits beside the directory
    swap_marker = d + ".swapping"
    with open(swap_marker, "w") as fh:
        json.dump({}, fh)
    with pytest.raises(RuntimeError, match="mid-swap"):
        delete_index(d)
    os.remove(swap_marker)

    assert delete_index(d) is True
    assert not index_exists(d)
    assert not os.path.exists(d)


def test_index_exists_staged_layout(spark, tmp_path):
    """A staged-but-unfinalized add_documents dir EXISTS (MeiliSearch creates
    the index on the first document task) and deletes cleanly."""
    from meilisearch_thai_spark.index.maintenance import delete_index, index_exists
    from meilisearch_thai_spark.streaming.ingest import add_documents

    d = str(tmp_path / "idx_staged")
    add_documents(spark, generate_pages(spark, 40, seed=6), d, finalize=False)
    assert index_exists(d)
    assert delete_index(d) is True
    assert not index_exists(d)


def test_snapshot_and_restore_round_trip(spark, tmp_path):
    """MeiliSearch snapshots: copy-out, delete, restore, search again —
    results identical; marker contracts enforced; staged-copy atomicity."""
    import json

    from meilisearch_thai_spark.index.maintenance import (
        delete_index,
        restore_index,
        snapshot_index,
    )

    d = str(tmp_path / "idx")
    build_index(spark, generate_pages(spark, 80, seed=7), d)
    eng = SearchEngine(spark, d, cache_postings=False)
    before = [(r["url"], round(r["score"], 6)) for r in eng.search("ปัญญาประดิษฐ์", k=5).collect()]

    snap = str(tmp_path / "snap")
    assert snapshot_index(d, snap) == snap
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(d, snap)
    marker = os.path.join(d, "_COMPACTING")
    with open(marker, "w") as fh:
        json.dump({}, fh)
    with pytest.raises(RuntimeError, match="compaction"):
        snapshot_index(d, str(tmp_path / "snap2"))
    os.remove(marker)

    delete_index(d)
    with pytest.raises(ValueError, match="exists"):
        restore_index(snap, snap)  # target exists (the snapshot itself)
    restore_index(snap, d)
    eng2 = SearchEngine(spark, d, cache_postings=False)
    after = [(r["url"], round(r["score"], 6)) for r in eng2.search("ปัญญาประดิษฐ์", k=5).collect()]
    assert after == before

    # overwrite mode replaces an existing index
    build_index(spark, generate_pages(spark, 40, seed=8), d)
    restore_index(snap, d, overwrite=True)
    eng3 = SearchEngine(spark, d, cache_postings=False)
    assert [(r["url"], round(r["score"], 6)) for r in eng3.search("ปัญญาประดิษฐ์", k=5).collect()] == before
    assert not os.path.exists(d + ".restore_replaced")


def test_interrupted_swap_protects_both_sides(spark, tmp_path):
    """Review regression: swap markers must sit beside BOTH directories so
    delete/snapshot of EITHER side of an interrupted swap refuses."""
    import json

    from meilisearch_thai_spark.index.maintenance import (
        delete_index,
        snapshot_index,
        swap_indexes,
    )

    a = str(tmp_path / "swp_a")
    b = str(tmp_path / "swp_b")
    build_index(spark, generate_pages(spark, 30, seed=1), a)
    build_index(spark, generate_pages(spark, 30, seed=2), b)
    # simulate the mid-dance state: markers written, first rename done
    for m in (a + ".swapping", b + ".swapping"):
        with open(m, "w") as fh:
            json.dump({"a": a, "b": b}, fh)
    with pytest.raises(RuntimeError, match="mid-swap"):
        delete_index(b)
    with pytest.raises(RuntimeError, match="mid-swap"):
        snapshot_index(b, str(tmp_path / "s"))
    with pytest.raises(RuntimeError, match="interrupted"):
        swap_indexes(a, b)  # a fresh swap refuses too
    for m in (a + ".swapping", b + ".swapping"):
        os.remove(m)
    swap_indexes(a, b)  # clean swap succeeds and clears both markers
    assert not os.path.exists(a + ".swapping") and not os.path.exists(b + ".swapping")


def test_list_indexes_states(spark, tmp_path):
    """GET /indexes over a root dir: built, staged, compacting, and
    non-index children are classified; no Spark jobs run."""
    import json

    from meilisearch_thai_spark.index.maintenance import list_indexes
    from meilisearch_thai_spark.streaming.ingest import add_documents

    root = str(tmp_path / "indexes")
    os.makedirs(root)
    build_index(spark, generate_pages(spark, 30, seed=11), os.path.join(root, "idx_a"))
    add_documents(
        spark, generate_pages(spark, 20, seed=12), os.path.join(root, "idx_b"),
        finalize=False,
    )
    os.makedirs(os.path.join(root, "not_an_index"))
    build_index(spark, generate_pages(spark, 10, seed=13), os.path.join(root, "idx_c"))
    with open(os.path.join(root, "idx_c", "_COMPACTING"), "w") as fh:
        json.dump({}, fh)

    got = {e["uid"]: e for e in list_indexes(root)}
    assert set(got) == {"idx_a", "idx_b", "idx_c"}
    assert got["idx_a"]["state"] == "available" and got["idx_a"]["n_docs"] == 30
    assert got["idx_b"]["state"] == "staging" and got["idx_b"]["n_docs"] == -1
    assert got["idx_c"]["state"] == "compacting"
    assert list_indexes(str(tmp_path / "missing")) == []


def test_delete_by_filter_counts_excludes_and_repeats(spark, built):
    from meilisearch_thai_spark.index.maintenance import delete_by_filter

    out, pages = built
    n_en = pages.filter("lang = 'en'").count()
    assert n_en > 0
    # predicate delete: count == matching docs, queries exclude them
    assert delete_by_filter(spark, out, {"lang": {"$eq": "en"}}) == n_en
    # repeat is a no-op (already tombstoned)
    assert delete_by_filter(spark, out, {"lang": {"$eq": "en"}}) == 0
    eng = SearchEngine(spark, out, cache_postings=False)
    term = _common_term(eng)
    hits = eng.search_terms([term], k=50, attributes_to_retrieve=["lang"]).collect()
    assert hits and all(r["lang"] != "en" for r in hits)
    # overlapping predicate recounts only the NEW victims
    n_th = pages.filter("lang = 'th'").count()
    assert (
        delete_by_filter(spark, out, {"lang": {"$in": ["en", "th"]}}) == n_th
    )


def test_delete_by_filter_equals_delete_docs(spark, tmp_path):
    from meilisearch_thai_spark.index.maintenance import delete_by_filter

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    pages = generate_pages(spark, 200, seed=7).persist()
    build_index(spark, pages, a, bucket_span=128)
    build_index(spark, pages, b, bucket_span=128)
    victims = [r["url"] for r in pages.filter("lang = 'th-en'").collect()]
    assert delete_by_filter(spark, a, {"lang": {"$eq": "th-en"}}) == len(victims)
    assert delete_docs(spark, b, victims) == len(victims)
    assert sorted(tombstoned_ids(spark, a)) == sorted(tombstoned_ids(spark, b))
    pages.unpersist()


def test_delete_by_filter_respects_declarations(spark, built):
    from meilisearch_thai_spark.index.maintenance import delete_by_filter
    from meilisearch_thai_spark.index.settings import update_filterable_attributes

    out, _ = built
    update_filterable_attributes(out, ["lang"])
    with pytest.raises(ValueError, match="not declared"):
        delete_by_filter(spark, out, {"doc_len": {"$gt": 10}})


def test_delete_by_filter_rejects_empty_and_unpublished_staged(spark, tmp_path):
    from meilisearch_thai_spark.index.maintenance import delete_by_filter
    from meilisearch_thai_spark.streaming.ingest import (
        add_documents,
        finalize_streamed_index,
    )

    out = str(tmp_path / "idx_staged")
    pages = generate_pages(spark, 120, seed=11).persist()
    add_documents(spark, pages.filter("lang != 'en'"), out)
    # an empty filter would translate to lit(True) — must 400, not wipe
    with pytest.raises(ValueError, match="non-empty filter"):
        delete_by_filter(spark, out, {})
    # stage a second batch WITHOUT finalize: predicate deletes must refuse
    # (they cannot see the unpublished docs)
    add_documents(spark, pages.filter("lang = 'en'"), out, finalize=False)
    with pytest.raises(ValueError, match="unpublished"):
        delete_by_filter(spark, out, {"lang": {"$eq": "en"}})
    # after finalize the same predicate works and counts the en docs
    finalize_streamed_index(spark, out)
    n_en = pages.filter("lang = 'en'").count()
    assert delete_by_filter(spark, out, {"lang": {"$eq": "en"}}) == n_en
    pages.unpersist()


def test_list_tasks_over_lineage_and_markers(spark, tmp_path):
    """MeiliSearch GET /tasks analogue: every durable mutation surfaces as
    a succeeded task, in-flight markers as processing, newest first."""
    import datetime
    import os as _os

    from meilisearch_thai_spark.index.maintenance import delete_docs, list_tasks
    from meilisearch_thai_spark.streaming.ingest import add_documents, update_documents

    ts = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [(f"https://t.ex/{i}", f"merge join doc {i}", "en", ts, None) for i in range(6)],
        "url string, text string, lang string, warc_ts timestamp, html binary",
    )
    idx = str(tmp_path / "tasksidx")
    add_documents(spark, pages, idx, n_shards=2)
    update_documents(
        spark,
        spark.createDataFrame(
            [("https://t.ex/0", "patched text merge", None)],
            "url string, text string, lang string",
        ),
        idx,
    )
    delete_docs(spark, idx, ["https://t.ex/5"])

    tasks = list_tasks(idx)
    types = [t["type"] for t in tasks]
    assert "documentAdditionOrUpdate" in types
    assert "documentPartialUpdate" in types
    assert "documentDeletion" in types
    assert "indexFinalize" in types
    assert all(t["status"] == "succeeded" for t in tasks)
    # uid 0 = oldest; list returned newest-first
    assert tasks[-1]["uid"] == 0
    assert [t["uid"] for t in tasks] == sorted(
        (t["uid"] for t in tasks), reverse=True
    )
    upd = next(t for t in tasks if t["type"] == "documentPartialUpdate")
    assert upd["details"]["n_retokenized"] == 1

    # an interrupted compaction surfaces as processing
    open(_os.path.join(idx, "_COMPACTING"), "w").close()
    tasks2 = list_tasks(idx)
    comp = next(t for t in tasks2 if t["type"] == "indexCompaction")
    assert comp["status"] == "processing"
    _os.remove(_os.path.join(idx, "_COMPACTING"))
