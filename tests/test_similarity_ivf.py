"""IVF ANN: probes beat random, recall vs the exact baseline is high."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_ivf_recall_vs_exact(spark, emb):
    from meilisearch_thai_spark.pipeline import similarity as sim

    exact = [r["vec_key"] for r in sim.cosine_topk_to_query(emb, "vec_id", "embedding", 0, k=10).collect()]
    approx = [r["vec_key"] for r in sim.ivf_cosine_topk(emb, "vec_id", "embedding", 0, k=10, n_cells=8, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall} ({approx} vs {exact})"


def test_ivf_assignments_partition_corpus(spark, emb):
    from meilisearch_thai_spark.pipeline import similarity as sim

    asg, cents = sim.ivf_assignments(emb, "vec_id", "embedding", n_cells=8)
    n = emb.count()
    assert asg.count() == n
    cells = {r["cell"] for r in asg.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1
    assert cents.shape[0] == 8


def test_ivf_missing_query_returns_empty(spark, emb):
    from meilisearch_thai_spark.pipeline import similarity as sim

    out = sim.ivf_cosine_topk(emb, "vec_id", "embedding", query_id=10**9, k=5)
    assert out.count() == 0


def test_embedding_near_dup_lsh_subset_of_exact(spark, emb):
    from meilisearch_thai_spark.pipeline import similarity as sim

    exact = {
        (r["left_key"], r["right_key"]): r["cosine"]
        for r in sim.embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.8).collect()
    }
    lsh = {
        (r["left_key"], r["right_key"]): r["cosine"]
        for r in sim.embedding_near_dup_pairs_lsh(
            emb, "vec_id", "embedding", dim=64, threshold=0.8, n_planes=4
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    if exact:  # LSH with few planes should keep decent recall
        assert len(lsh) / len(exact) >= 0.3


def test_hybrid_topk_ratio_extremes(spark):
    """semanticRatio=1 ranks purely by cosine; =0 purely by keyword score;
    out-of-range ratios are a request error."""
    import pytest
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.pipeline.similarity import hybrid_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    terms = ["merge", "join", "table", "scan"]
    sem_only = hybrid_topk(docs, emb, "doc_id", "text", "vec_id", "embedding",
                           terms, 3, k=10, semantic_ratio=1.0).collect()
    cosines = [r["cosine"] for r in sem_only]
    assert cosines == sorted(cosines, reverse=True)
    kw_only = hybrid_topk(docs, emb, "doc_id", "text", "vec_id", "embedding",
                          terms, 3, k=10, semantic_ratio=0.0).collect()
    bm25s = [r["bm25"] for r in kw_only]
    assert bm25s == sorted(bm25s, reverse=True) and bm25s[0] > 0
    # blend components recompose to the reported hybrid score
    mid = hybrid_topk(docs, emb, "doc_id", "text", "vec_id", "embedding",
                      terms, 3, k=5, semantic_ratio=0.4).collect()
    mx = max(r["bm25"] for r in hybrid_topk(
        docs, emb, "doc_id", "text", "vec_id", "embedding",
        terms, 3, k=1_000_000, semantic_ratio=0.0).collect())
    for r in mid:
        expect = 0.4 * (r["cosine"] + 1) / 2 + 0.6 * r["bm25"] / mx
        assert abs(r["hybrid_score"] - expect) < 5e-4
    with pytest.raises(ValueError, match="semantic_ratio"):
        hybrid_topk(docs, emb, "doc_id", "text", "vec_id", "embedding",
                    terms, 3, semantic_ratio=1.5)


def test_pool_embeddings_mean_and_max(spark):
    from meilisearch_thai_spark.pipeline.similarity import pool_embeddings

    chunks = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (1, [3.0, 0.0, 1.0]),
            (2, [5.0, 5.0, 5.0]),
        ],
        "doc_id long, vec array<double>",
    )
    mean = {r["doc_id"]: (r["embedding"], r["n_chunks"])
            for r in pool_embeddings(chunks, "doc_id", "vec", "mean").collect()}
    assert mean[1] == ([2.0, 1.0, 2.0], 2) and mean[2] == ([5.0, 5.0, 5.0], 1)
    mx = {r["doc_id"]: r["embedding"]
          for r in pool_embeddings(chunks, "doc_id", "vec", "max").collect()}
    assert mx[1] == [3.0, 2.0, 3.0]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mean"):
        pool_embeddings(chunks, "doc_id", "vec", "median")


def test_pool_embeddings_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.similarity import (
        pool_embeddings,
        pool_embeddings_sql,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "vec_id % 50 AS gid", "embedding"
    )
    a = (
        pool_embeddings(emb, "gid", "embedding", "mean")
        .toPandas().sort_values("gid").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    b = con.execute(
        pool_embeddings_sql(
            "SELECT vec_id % 50 AS gid, embedding FROM embeddings", "gid", "embedding"
        )
    ).df().sort_values("gid").reset_index(drop=True)
    assert list(a["gid"]) == list(b["gid"])
    assert list(a["n_chunks"]) == list(b["n_chunks"])
    for va, vb in zip(a["embedding"], b["embedding"]):
        assert len(va) == len(vb)
        assert all(abs(x - y) < 1e-9 for x, y in zip(va, vb))


def test_pool_embeddings_null_and_empty_chunks(spark):
    from meilisearch_thai_spark.pipeline.similarity import pool_embeddings

    chunks = spark.createDataFrame(
        [
            (1, [2.0, 4.0]),
            (1, []),            # empty: excluded from pool AND count
            (1, None),          # null: same
            (2, []),            # all-empty group: absent from output
        ],
        "doc_id long, vec array<double>",
    )
    rows = pool_embeddings(chunks, "doc_id", "vec", "mean").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["embedding"], r["n_chunks"]) == (1, [2.0, 4.0], 1)


def test_quantize_embeddings_parity_and_recall(spark, sf_dir):
    """int8 symmetric quantization: DuckDB bit-parity on codes+scales,
    dequantization error bounded by the step size, and quantized-cosine
    top-k recall vs the exact path on the real embeddings table."""
    import duckdb
    import os

    from meilisearch_thai_spark.pipeline.similarity import (
        cosine_topk_to_query,
        quantize_embeddings,
        quantized_cosine_topk_to_query,
        quantize_embeddings_sql,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    id_col, vec_col = emb.columns[0], emb.columns[1]
    qt = quantize_embeddings(emb, id_col, vec_col)
    rows = qt.collect()
    # codes in range; scale reconstructs within half a quantization step
    src = {r[id_col]: list(r[vec_col]) for r in emb.collect()}
    for r in rows:
        assert all(-127 <= int(c) <= 127 for c in r["qv"])
        v = src[r["vec_key"]]
        if r["scale"] > 0:
            err = max(abs(float(c) * r["scale"] - float(x))
                      for c, x in zip(r["qv"], v))
            assert err <= r["scale"] / 2 + 1e-12

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW e AS SELECT * FROM read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
    )
    oracle = {
        k: (round(s, 9), [int(c) for c in q])
        for k, s, q in con.execute(
            quantize_embeddings_sql("e", id_col, vec_col)
        ).fetchall()
    }
    got = {r["vec_key"]: (round(r["scale"], 9), [int(c) for c in r["qv"]])
           for r in rows}
    assert got == oracle

    # recall: quantized top-10 overlaps exact top-10 >= 80% for 5 queries
    qids = sorted(src)[:5]
    for qid in qids:
        exact = {r["vec_key"] for r in
                 cosine_topk_to_query(emb, id_col, vec_col, qid, k=10).collect()}
        approx = {r["vec_key"] for r in
                  quantized_cosine_topk_to_query(qt, qid, k=10).collect()}
        assert len(exact & approx) >= 8, (qid, exact, approx)
