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


def test_deterministic_sample_nested_and_reproducible(spark):
    """Hash-based sampling: same (seed, id) decision on every run, nested
    fractions give nested samples, disjoint seeds differ."""
    from meilisearch_thai_spark.pipeline.sampling import deterministic_sample

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.10, "a").collect()}
    s10b = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.10, "a").collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.30, "a").collect()}
    other = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.10, "b").collect()}
    assert s10 == s10b
    assert s10 <= s30
    assert other != s10
    assert 0.05 < len(s10) / 2000 < 0.15 and 0.25 < len(s30) / 2000 < 0.35


def test_stratified_sample_fractions_and_default(spark):
    from meilisearch_thai_spark.pipeline.sampling import stratified_sample

    docs = spark.range(0, 3000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 3 = 0 THEN 'keep' WHEN id % 3 = 1 THEN 'half' ELSE 'drop' END AS s"
    )
    got = stratified_sample(docs, "doc_id", "s", {"keep": 1.0, "half": 0.5}).collect()
    by = {}
    for r in got:
        by.setdefault(r["s"], set()).add(r["doc_id"])
    assert len(by.get("keep", set())) == 1000       # fraction 1.0 keeps all
    assert "drop" not in by                          # default 0.0 drops all
    assert 400 < len(by["half"]) < 600


def test_sample_fraction_validation(spark):
    import pytest

    from meilisearch_thai_spark.pipeline.sampling import deterministic_sample

    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(docs, "doc_id", 1.5)


def test_cc_raises_on_nonconvergence_instead_of_wrong_labels(spark):
    import pytest

    from meilisearch_thai_spark.pipeline.dedup import connected_components

    path = spark.createDataFrame([(i, i + 1) for i in range(10, 16)],
                                 "left_key long, right_key long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=2)
