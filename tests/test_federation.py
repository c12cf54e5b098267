"""Federated multi-index search (MeiliSearch v1.10 federation): one query
across several indexes, merged by max-normalized weighted score — all
branches in ONE lazy Spark plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.query.federation import federated_search


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fed")

    def mk(name, rows):
        out = str(base / name)
        pages = spark.createDataFrame(rows, "url string, text string, lang string").select(
            "url",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            "lang",
        )
        build_index(spark, pages, out)
        return SearchEngine(spark, out, cache_postings=False)

    a = mk("a", [
        ("a1", "wakame salad recipe", "en"),
        ("a2", "wakame soup", "en"),
        ("a3", "filler words entirely", "en"),
    ])
    b = mk("b", [
        ("b1", "wakame wakame wakame central", "en"),
        ("b2", "unrelated text", "en"),
    ])
    return {"a": a, "b": b}


def test_each_index_best_hit_normalizes_to_its_weight(spark, two_indexes):
    hits = federated_search(two_indexes, ["wakame"], k=10).collect()
    uids = {h["index_uid"] for h in hits}
    assert uids == {"a", "b"}
    best = {}
    for h in hits:
        best.setdefault(h["index_uid"], h["federated_score"])
    # default weight 1.0: each index's top hit normalizes to exactly 1.0,
    # making cross-index scores comparable despite different BM25 stats
    assert best == {"a": 1.0, "b": 1.0}


def test_weights_scale_whole_indexes(spark, two_indexes):
    hits = federated_search(
        two_indexes, ["wakame"], k=10, weights={"b": 0.5}
    ).collect()
    for h in hits:
        if h["index_uid"] == "b":
            assert h["federated_score"] <= 0.5
    # a's hits (weight 1.0) outrank b's best now
    assert hits[0]["index_uid"] == "a"


def test_single_job_plan_and_validation(spark, two_indexes):
    df = federated_search(two_indexes, ["wakame"], k=5)
    # one lazy plan — a union, not N sequential collects
    assert "Union" in df._jdf.queryExecution().logical().toString()
    with pytest.raises(ValueError, match="unknown indexes"):
        federated_search(two_indexes, ["wakame"], weights={"zzz": 2.0})
    with pytest.raises(ValueError, match="at least one"):
        federated_search({}, ["wakame"])


def test_warm_sql_fast_path_matches_classic_and_falls_back(spark, tmp_path_factory):
    """Round 5: with warm engines the federation composes as ONE spark.sql
    plan (fast path) — values must equal the classic per-branch plan, and
    any engine that cannot serve warm must route the whole call back to
    the classic path (results identical either way)."""
    from meilisearch_thai_spark.query.federation import _warm_sql_federated

    base = tmp_path_factory.mktemp("fedwarm")

    def mk(name, rows, **kw):
        out = str(base / name)
        pages = spark.createDataFrame(
            rows, "url string, text string, lang string"
        ).select(
            "url",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text",
            "lang",
        )
        build_index(spark, pages, out)
        return SearchEngine(spark, out, **kw)

    rows_a = [
        ("a1", "wakame salad recipe", "en"),
        ("a2", "wakame soup extra words", "en"),
        ("a3", "filler words entirely", "en"),
    ]
    rows_b = [
        ("b1", "wakame wakame wakame central", "en"),
        ("b2", "unrelated text", "en"),
    ]
    warm = {"a": mk("wa", rows_a), "b": mk("wb", rows_b)}
    cold = {"a": mk("ca", rows_a, cache_postings=False),
            "b": mk("cb", rows_b, cache_postings=False)}

    for normalize in (True, False):
        fast = federated_search(warm, ["wakame", "soup"], k=10, normalize=normalize)
        classic = federated_search(cold, ["wakame", "soup"], k=10, normalize=normalize)
        # the warm call really took the SQL path...
        assert _warm_sql_federated(
            warm, ["wakame", "soup"], 10, {}, 10, normalize
        ) is not None
        # ...and the cold one really cannot
        assert _warm_sql_federated(
            cold, ["wakame", "soup"], 10, {}, 10, normalize
        ) is None
        got = [(r["index_uid"], r["url"], r["score"], r["federated_score"])
               for r in fast.collect()]
        want = [(r["index_uid"], r["url"], r["score"], r["federated_score"])
                for r in classic.collect()]
        assert got == want, (normalize, got, want)
    # schema parity with the classic path
    assert fast.columns == classic.columns
