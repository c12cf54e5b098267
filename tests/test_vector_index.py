"""Persisted IVF vector index (build_vector_index / VectorIndex): the
MeiliSearch vector-store analogue of the text index — centroids + cell
assignments built once, queries probe only their cells' FILES (partition
pruning, the physical form of the documented 100 TB claim)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.pipeline import similarity as sim
from meilisearch_thai_spark.pipeline.similarity import VectorIndex, build_vector_index


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def vidx(spark, emb, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vecidx") / "vidx")
    meta = build_vector_index(spark, emb, "vec_id", "embedding", out, n_cells=8)
    return out, meta


def test_build_writes_cell_partitioned_layout(spark, emb, vidx):
    out, meta = vidx
    assert meta["format"] == "mst-vec-v1" and meta["n_cells"] == 8
    assert meta["n_vectors"] == emb.count() and meta["dim"] == 64
    assert len(meta["centroids"]) == 8
    # parquet layout is partitioned by cell — one directory per cell
    cells = {d for d in os.listdir(os.path.join(out, "vectors")) if d.startswith("cell=")}
    assert len(cells) > 1
    # refuse to clobber an existing index
    with pytest.raises(ValueError, match="already exists"):
        build_vector_index(spark, emb, "vec_id", "embedding", out, n_cells=8)


def test_persisted_query_matches_adhoc_ivf(spark, emb, vidx):
    out, _ = vidx
    vi = VectorIndex(spark, out)
    for qid in (0, 7):
        persisted = [
            (r["vec_key"], r["cosine"])
            for r in vi.query_by_id(qid, k=20, n_probe=4).collect()
        ]
        adhoc = [
            (r["vec_key"], r["cosine"])
            for r in sim.ivf_cosine_topk(
                emb, "vec_id", "embedding", qid, k=20, n_cells=8, n_probe=4
            ).collect()
        ]
        assert persisted == adhoc and len(persisted) == 20


def test_probe_reads_only_probed_cell_files(spark, vidx):
    out, meta = vidx
    vi = VectorIndex(spark, out)
    qv = meta["centroids"][3]
    probes = vi.probe_cells(qv, n_probe=2)
    assert len(probes) == 2 and 3 in probes  # a centroid's own cell is nearest
    touched = {
        r["f"]
        for r in vi._vectors()
        .filter(F.col("cell").isin(probes))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert touched  # scanned files all come from the two probed cells' dirs
    for f in touched:
        assert any(f"cell={c}/" in f for c in probes), f
    # and the unfiltered layout has more cell dirs than the probe touched
    all_cells = {d for d in os.listdir(os.path.join(out, "vectors")) if d.startswith("cell=")}
    assert len(all_cells) > 2


def test_kmeans_quantizer_recall(spark, emb, tmp_path):
    out = str(tmp_path / "vidx_km")
    build_vector_index(spark, emb, "vec_id", "embedding", out, n_cells=8, quantizer="kmeans")
    vi = VectorIndex(spark, out)
    exact = [
        r["vec_key"]
        for r in sim.cosine_topk_to_query(emb, "vec_id", "embedding", 0, k=10).collect()
    ]
    approx = [r["vec_key"] for r in vi.query_by_id(0, k=10, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.5, f"kmeans IVF recall too low: {recall}"


def test_query_errors(spark, vidx):
    out, _ = vidx
    vi = VectorIndex(spark, out)
    with pytest.raises(ValueError, match="dim"):
        vi.query_by_vector([0.0, 1.0], k=5)
    with pytest.raises(ValueError, match="not in the vector index"):
        vi.query_by_id(10**9, k=5)
    with pytest.raises(ValueError, match="quantizer"):
        build_vector_index(spark, vi._vectors(), "vec_key", "v", out + "_x", quantizer="nope")


def test_hybrid_pools_blend_matches_python_twin(spark, emb, vidx, sf_dir):
    """Pool-union hybrid (hybrid_pools_topk) vs an independent pure-Python
    twin computed from the collected pools + exact backfilled cosines, and
    high agreement with the all-docs blend (hybrid_topk) when pools are
    deep enough to cover its winners."""
    import math

    from meilisearch_thai_spark.query import adhoc

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out, _ = vidx
    vi = sim.VectorIndex(spark, out)
    terms, qid, ratio, k = ["merge", "join", "table", "scan"], 0, 0.6, 10

    kw_pool = adhoc.bm25_topk(docs, "doc_id", "text", terms, k=30).select(
        F.col("doc_key"), F.col("score").alias("bm25")
    )
    sem_pool = vi.query_by_id(qid, k=30, n_probe=4).select(
        F.col("vec_key").alias("doc_key"), "cosine"
    )
    got = [
        (r["doc_key"], r["hybrid_score"], r["cosine"])
        for r in sim.hybrid_pools_topk(
            kw_pool, sem_pool, emb, "vec_id", "embedding", qid, k=k, semantic_ratio=ratio
        ).collect()
    ]

    # pure-Python twin over the same pools
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    qv = vecs[qid]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 4)

    kwp = {r["doc_key"]: round(r["bm25"], 4) for r in kw_pool.collect() if r["doc_key"] != qid}
    semp = {r["doc_key"]: r["cosine"] for r in sem_pool.collect() if r["doc_key"] != qid}
    mx = max(kwp.values()) if kwp else None
    rows = []
    for key in set(kwp) | set(semp):
        if key not in vecs:
            continue
        c = semp.get(key, None)
        if c is None:
            c = cos(vecs[key], qv)
        b = kwp.get(key, 0.0)
        h = round(ratio * (c + 1.0) / 2.0 + (1 - ratio) * (b / mx if mx else 0.0), 4)
        rows.append((key, h, c))
    rows.sort(key=lambda t: (-t[1], t[0]))
    assert got == rows[:k]

    # deep pools (all cells probed, corpus-wide keyword pool) ≈ the
    # all-docs blend: top-k sets overlap heavily (rounding of pooled bm25
    # is the only difference by construction)
    kw_all = adhoc.bm25_topk(docs, "doc_id", "text", terms, k=10**6).select(
        F.col("doc_key"), F.col("score").alias("bm25")
    )
    sem_all = vi.query_by_id(qid, k=10**6, n_probe=8).select(
        F.col("vec_key").alias("doc_key"), "cosine"
    )
    pooled = {
        r["doc_key"]
        for r in sim.hybrid_pools_topk(
            kw_all, sem_all, emb, "vec_id", "embedding", qid, k=k, semantic_ratio=ratio
        ).collect()
    }
    alldocs = {
        r["doc_key"]
        for r in sim.hybrid_topk(
            docs, emb, "doc_id", "text", "vec_id", "embedding", terms, qid,
            k=k, semantic_ratio=ratio,
        ).collect()
    }
    assert len(pooled & alldocs) >= int(0.8 * k)
