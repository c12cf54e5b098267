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
