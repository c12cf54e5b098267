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
