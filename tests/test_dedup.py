"""Duplicate-cluster resolution: candidate pairs → connected components
(min-label propagation), the keep-one-per-cluster step of corpus dedup."""

from __future__ import annotations

from meilisearch_thai_spark.pipeline.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "left_key long, right_key long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_transitive_chain_collapses_to_one_cluster(spark):
    # A~B, B~C (no direct A~C pair) must land in ONE cluster labeled min id
    got = _cc(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_disjoint_clusters_stay_apart(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22), (30, 31)])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_long_path_needs_multiple_rounds(spark):
    # a 9-node path has diameter 8 — exercises the iteration loop well past
    # one round and the convergence check
    path = [(i, i + 1) for i in range(100, 108)]
    got = _cc(spark, path)
    assert got == {i: 100 for i in range(100, 109)}


def test_pair_order_and_duplicates_irrelevant(spark):
    # reversed and repeated pairs produce the same clustering
    got = _cc(spark, [(5, 4), (4, 5), (5, 4), (6, 5)])
    assert got == {4: 4, 5: 4, 6: 4}
