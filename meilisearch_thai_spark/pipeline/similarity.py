"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed path.

Brute force is the correctness baseline (one broadcast of the query vector,
one pass, TakeOrderedAndProject).  The random-hyperplane LSH variant is the
100 TB path: bucket on sign bits so the scan touches only matching buckets.
All arithmetic in float64 with sequential summation so external oracles
reproduce values bit-for-bit before rounding."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread as _spread


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _seq_dot(a, b) -> float:
    """Sequential left-fold dot product — bit-identical to ``_dot``'s Spark
    fold and to DuckDB's list_dot_product, so driver-side probe selection
    makes the SAME floating-point decisions as the cluster/oracle side."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _md5_unit(s: str) -> float:
    """md5-derived uniform value in [-1, 1): first 60 bits of md5(s)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / float(1 << 59) - 1.0


def md5_planes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic hyperplane matrix: plane[i][j] = md5-unit(f"{seed}|{i}|{j}").

    No RNG state — any engine (the DuckDB oracle included) re-derives the
    exact same planes from (seed, dim, n_planes), so LSH bucketing is
    reproducible bit-for-bit outside Spark."""
    return [[_md5_unit(f"{seed}|{i}|{j}") for j in range(dim)] for i in range(n_planes)]


def _vec_sql(x: float) -> str:
    return repr(float(x))  # shortest exact repr — round-trips to the same double


def _plane_list_sql(plane: list[float]) -> str:
    return "[" + ", ".join(_vec_sql(x) for x in plane) + "]"


def cosine_topk_to_query(
    emb: DataFrame, id_col: str, vec_col: str, query_id: int, k: int = 20
) -> DataFrame:
    """Top-k most-similar vectors to the row ``id_col == query_id``.

    The query vector never leaves the cluster: a 1-row broadcast crossJoin.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _spread(emb).select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
    q = base.filter(F.col("vec_key") == query_id).select(
        F.col("v").alias("qv"), F.col("vec_key").alias("qid")
    )
    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_key") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
                4,
            ),
        )
        .select("vec_key", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_key"))
        .limit(k)
    )


def cosine_topk_sql(table: str, id_col: str, vec_col: str, query_id: int, k: int = 20) -> str:
    return f"""
WITH q AS (
  SELECT {vec_col} AS qv FROM {table} WHERE {id_col} = {query_id}
)
SELECT {id_col} AS vec_key,
       ROUND(list_dot_product({vec_col}, qv)
             / (sqrt(list_dot_product({vec_col}, {vec_col})) * sqrt(list_dot_product(qv, qv))), 4) AS cosine
FROM {table}, q
WHERE {id_col} <> {query_id}
ORDER BY cosine DESC, vec_key ASC
LIMIT {k}
"""


def quantize_embeddings(
    emb: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric int8 quantization per vector → (vec_key, scale, qv):
    ``q_i = floor(127 * v_i / max|v| + 0.5)`` (round-half-up — identical
    arithmetic in Spark and DuckDB, unlike each engine's ``round``),
    ``scale = max|v| / 127`` dequantizes.  The 4× memory cut every
    serving-scale ANN deployment takes on the vector side: a 768-dim
    float32 corpus at 10^9 docs is ~3 TB of vectors; int8 fits the warm
    tier where float does not, and IVF/LSH candidate scoring tolerates
    the <1% cosine error (verified in tests) before the float re-rank.

    Zero shuffle — two pure-Column folds per row.  All-zero vectors keep
    scale 0 and an all-zero qv (cosine undefined for them anyway).
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _spread(emb).select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
    maxabs = F.aggregate(
        "v", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    return base.select(
        "vec_key",
        (maxabs / F.lit(127.0)).alias("scale"),
        F.when(maxabs == 0, F.transform("v", lambda _x: F.lit(0).cast("tinyint")))
        .otherwise(
            F.transform(
                "v",
                lambda x: F.floor(x * F.lit(127.0) / maxabs + F.lit(0.5)).cast(
                    "tinyint"
                ),
            )
        )
        .alias("qv"),
    )


def quantize_embeddings_sql(table: str, id_col: str, vec_col: str) -> str:
    """DuckDB twin of :func:`quantize_embeddings` (same floor(x+0.5)
    rounding; TINYINT cast)."""
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_key,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v,
         COALESCE(list_max(list_transform({vec_col},
                  x -> abs(CAST(x AS DOUBLE)))), 0) AS maxabs
  FROM {table}
)
SELECT vec_key,
       maxabs / 127.0 AS scale,
       CASE WHEN maxabs = 0
            THEN list_transform(v, x -> CAST(0 AS TINYINT))
            ELSE list_transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS TINYINT))
       END AS qv
FROM base
"""


def quantized_cosine_topk_to_query(
    qemb: DataFrame, query_id: int, k: int = 20
) -> DataFrame:
    """Approximate cosine top-k over a :func:`quantize_embeddings` table —
    the candidate-scoring arithmetic a quantized serving tier runs (the
    exact path re-ranks the few winners with float vectors).

    ``cos(a,b)`` over int8 codes: per-vector scales cancel in the ratio,
    so the computation is pure integer dot products in longs (exact, no
    float accumulation error beyond the quantization itself) with one
    final float division.  Same broadcast 1-row crossJoin shape as
    :func:`cosine_topk_to_query`.
    """
    base = qemb.select("vec_key", F.col("qv").alias("v"))
    q = base.filter(F.col("vec_key") == query_id).select(
        F.col("v").alias("qv2"), F.col("vec_key").alias("qid")
    )
    lv = F.transform(F.col("v"), lambda x: x.cast("long"))
    lq = F.transform(F.col("qv2"), lambda x: x.cast("long"))

    def ldot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_key") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(
                ldot(lv, lq)
                / (F.sqrt(ldot(lv, lv).cast("double")) * F.sqrt(ldot(lq, lq).cast("double"))),
                4,
            ),
        )
        .select("vec_key", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_key"))
        .limit(k)
    )


def hyperplane_lsh_buckets(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit signature).

    The plane matrix is md5-derived (:func:`md5_planes`) and folded in as
    literals — deterministic with NO RNG state, so an external SQL oracle
    reproduces the bucketing exactly.  At query time only vectors in the
    query's bucket (and Hamming-adjacent buckets if recall demands) are
    scored: the IVF-style scale path."""
    planes = md5_planes(dim, n_planes, seed)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = _spread(emb).select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot_i = _dot(F.col("v"), plane)
        bucket = bucket + F.when(dot_i > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out.withColumn("bucket", bucket).select("vec_key", "bucket")


def _bucket_expr_sql(vec_expr: str, dim: int, n_planes: int, seed: int = 7) -> str:
    """DuckDB twin of the bucket computation in :func:`hyperplane_lsh_buckets`."""
    planes = md5_planes(dim, n_planes, seed)
    parts = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_list_sql(planes[i])}) > 0"
        f" THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(n_planes)
    ]
    return " + ".join(parts)


def lsh_cosine_topk_sql(
    table: str, id_col: str, vec_col: str, dim: int, query_id: int, k: int = 20, n_planes: int = 6,
    seed: int = 7,
) -> str:
    """DuckDB twin of :func:`lsh_cosine_topk` — planes are md5-derived pure
    constants embedded as literals, and every dot product is a sequential
    double fold on both engines, so bucket bits (and therefore the
    multi-probe candidate set) match bit-for-bit."""
    bucket = _bucket_expr_sql("v", dim, n_planes, seed)
    probes = ", ".join(f"xor(qb, {1 << i}::BIGINT)" for i in range(n_planes))
    return f"""
WITH v AS (
  SELECT {id_col} AS vec_key, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
),
b AS (
  SELECT vec_key, v, {bucket} AS bucket FROM v
),
q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_key = {query_id}),
probes AS (SELECT qv, unnest([qb, {probes}]) AS pb FROM q)
SELECT b.vec_key AS vec_key,
       ROUND(list_dot_product(b.v, p.qv)
             / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(p.qv, p.qv))), 4) AS cosine
FROM b JOIN probes p ON b.bucket = p.pb
WHERE b.vec_key <> {query_id}
ORDER BY cosine DESC, vec_key ASC
LIMIT {k}
"""


def lsh_cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, query_id: int, k: int = 20, n_planes: int = 6
) -> DataFrame:
    """ANN top-k via multi-probe hyperplane LSH (recall < 1 by design; brute
    force above is the exactness baseline).

    Probes the query's bucket plus all Hamming-distance-1 buckets (vectors
    near a hyperplane land on either side, so flipping one sign bit recovers
    most misses).  Scans (n_planes+1)/2**n_planes of the corpus — ~11% at the
    default 6 planes — while the broadcast keeps it one shuffle-free pass."""
    emb = _spread(emb)
    bucketed = hyperplane_lsh_buckets(emb, id_col, vec_col, dim, n_planes)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v")).join(bucketed, "vec_key")
    qb = F.col("bucket")
    probes = F.array(qb, *[qb.bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(n_planes)])
    q = (
        base.filter(F.col("vec_key") == query_id)
        .select(
            F.col("v").alias("qv"),
            F.explode(probes).alias("qb"),
            F.col("vec_key").alias("qid"),
        )
    )
    return (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .filter(F.col("vec_key") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
                4,
            ),
        )
        .select("vec_key", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_key"))
        .limit(k)
    )


def ivf_assignments(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int = 16, seed: int = 42
):
    """IVF coarse quantizer: k-means cells over the corpus (Spark ML).

    Returns ``(assignments DataFrame (vec_key, cell), centroids ndarray)``.
    The classic ANN scale path: the corpus partitions into cells once (an
    index build); queries then probe only the nearest ``n_probe`` cells.
    At 100 TB the assignments table is written back to storage partitioned by
    cell so a probe reads only its cells' files (partition pruning)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
    feat = base.withColumn("fv", array_to_vector(F.col("v")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell").fit(feat)
    assignments = model.transform(feat).select("vec_key", "cell")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assignments, centroids


def seeded_centroids(emb: DataFrame, id_col: str, vec_col: str, n_cells: int) -> list[list[float]]:
    """Deterministic coarse-quantizer seeds: the ``n_cells`` corpus vectors
    whose md5(id) sorts first — a reproducible pseudo-random medoid sample.

    No RNG and no iterative training, so ANY engine (the DuckDB oracle
    included) re-derives the identical centroid set from the table alone.
    Cell j = the j-th seed in (md5(id), id) order."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = (
        emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
        .orderBy(F.md5(F.col("vec_key").cast("string")), F.col("vec_key"))
        .limit(n_cells)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def _cell_cos_expr(vcol, centroid: list[float]):
    clit = F.array(*[F.lit(float(x)) for x in centroid])
    return _dot(vcol, clit) / (F.sqrt(_dot(vcol, vcol)) * F.sqrt(_dot(clit, clit)))


def ivf_cosine_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 20,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    quantizer: str = "seeded",
) -> DataFrame:
    """ANN top-k via IVF: probe the ``n_probe`` cells nearest the query.

    Recall < 1 by design (the brute-force ``cosine_topk_to_query`` is the
    exactness baseline); scans ~n_probe/n_cells of the corpus.  Cell choice
    happens driver-side against the (tiny) centroid matrix; scoring within
    probed cells is the same vectorized cosine as the exact path.

    ``quantizer='seeded'`` (default) uses md5-seeded medoids
    (:func:`seeded_centroids`): fully deterministic, reproducible by the
    DuckDB oracle (:func:`ivf_cosine_topk_sql`).  ``quantizer='kmeans'``
    trains Spark-ML k-means cells (:func:`ivf_assignments`) — better cell
    balance, but only pytest-verifiable (recall vs exact).  At 100 TB the
    assignment table is written back partitioned by cell so probes prune
    at the file level either way."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if quantizer == "kmeans":
        assignments, centroids = ivf_assignments(emb, id_col, vec_col, n_cells, seed)
        base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v")).join(assignments, "vec_key")
        qrow = base.filter(F.col("vec_key") == query_id).select("v").collect()
        if not qrow:
            return base.filter(F.lit(False)).select("vec_key", F.lit(0.0).alias("cosine"))
        qv = np.asarray(qrow[0]["v"], dtype=np.float64)
        sims = centroids @ qv / (np.linalg.norm(centroids, axis=1) * np.linalg.norm(qv) + 1e-12)
        probe_cells = [int(c) for c in np.argsort(-sims)[:n_probe]]
        qv_list = [float(x) for x in qv]
    else:
        cents = seeded_centroids(emb, id_col, vec_col, n_cells)
        base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
        # cell = argmax_j cosine(v, c_j), first (smallest j) on ties — the
        # same decision the oracle's ROW_NUMBER(ORDER BY cos DESC, cell ASC)
        # makes, with bit-identical sequential-fold dot products
        cos_arr = F.array(*[_cell_cos_expr(F.col("v"), c) for c in cents])
        base = base.withColumn("cell", (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int"))
        qrow = base.filter(F.col("vec_key") == query_id).select("v").collect()
        if not qrow:
            return base.filter(F.lit(False)).select("vec_key", F.lit(0.0).alias("cosine"))
        qv_list = [float(x) for x in qrow[0]["v"]]
        qnorm = np.sqrt(_seq_dot(qv_list, qv_list))
        sims = [
            (_seq_dot(qv_list, c) / (qnorm * np.sqrt(_seq_dot(c, c))), j)
            for j, c in enumerate(cents)
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        probe_cells = [j for _s, j in sims[:n_probe]]

    qlit = F.array(*[F.lit(float(x)) for x in qv_list])
    return (
        base.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_key") != query_id)
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), qlit)
                / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(qlit, qlit))),
                4,
            ),
        )
        .select("vec_key", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_key"))
        .limit(k)
    )


def ivf_cosine_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 20,
    n_cells: int = 16,
    n_probe: int = 4,
) -> str:
    """DuckDB twin of :func:`ivf_cosine_topk` (seeded quantizer): re-derives
    the md5-seeded centroids, the argmax-cosine cell assignment, and the
    probe-cell choice entirely in SQL — the full IVF structure under the
    driver's exact-match gate."""
    return f"""
WITH v AS (
  SELECT {id_col} AS vec_key, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_key AS VARCHAR)), vec_key) - 1 AS cell, v AS c
  FROM v ORDER BY md5(CAST(vec_key AS VARCHAR)), vec_key LIMIT {n_cells}
),
scored AS (
  SELECT v.vec_key, v.v, s.cell,
         list_dot_product(v.v, s.c)
           / (sqrt(list_dot_product(v.v, v.v)) * sqrt(list_dot_product(s.c, s.c))) AS cos_c
  FROM v CROSS JOIN seeds s
),
assign AS (
  SELECT vec_key, v, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_key ORDER BY cos_c DESC, cell ASC) AS rn
  FROM scored
),
cells AS (SELECT vec_key, v, cell FROM assign WHERE rn = 1),
q AS (SELECT v AS qv FROM v WHERE vec_key = {query_id}),
probes AS (
  SELECT s.cell
  FROM seeds s CROSS JOIN q
  ORDER BY list_dot_product(q.qv, s.c)
             / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(s.c, s.c))) DESC,
           s.cell ASC
  LIMIT {n_probe}
)
SELECT c.vec_key AS vec_key,
       ROUND(list_dot_product(c.v, q.qv)
             / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
FROM cells c JOIN probes USING (cell) CROSS JOIN q
WHERE c.vec_key <> {query_id}
ORDER BY cosine DESC, vec_key ASC
LIMIT {k}
"""


def build_vector_index(
    spark,
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    out_dir: str,
    n_cells: int = 16,
    quantizer: str = "seeded",
    seed: int = 42,
) -> dict:
    """Persist an IVF vector index: the MeiliSearch vector-store analogue of
    ``index.builder.build_index`` — centroids + cell assignments written once
    at build time, reused by every query, instead of :func:`ivf_cosine_topk`
    recomputing the coarse quantizer per call.

    Layout: ``{out_dir}/vectors`` — parquet PARTITIONED BY ``cell``, so a
    probe of ``n_probe`` cells reads ONLY those cells' files (partition
    pruning; this is the documented 100 TB claim of ``ivf_assignments``,
    made physical — verified by ``tests/test_vector_index.py`` via
    ``input_file_name``) — plus ``vector_meta.json`` carrying the centroid
    matrix (n_cells × dim doubles: driver-sized, the IVF equivalent of
    meta.json).  Staged write + atomic rename like snapshots/dumps.

    ``quantizer='seeded'`` (md5-seeded medoids) keeps the whole structure
    reproducible by the DuckDB oracle; ``'kmeans'`` trains Spark-ML cells
    (better balance, pytest-verified by recall only)."""
    import json
    import os
    import shutil

    out = os.path.abspath(out_dir)
    if os.path.exists(out):
        raise ValueError(f"vector index target {out_dir} already exists")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
    if quantizer == "kmeans":
        assignments, centroids = ivf_assignments(emb, id_col, vec_col, n_cells, seed)
        cents = [[float(x) for x in c] for c in centroids]
        table = base.join(assignments, "vec_key")
    elif quantizer == "seeded":
        cents = seeded_centroids(emb, id_col, vec_col, n_cells)
        cos_arr = F.array(*[_cell_cos_expr(F.col("v"), c) for c in cents])
        table = base.withColumn(
            "cell", (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")
        )
    else:
        raise ValueError(f"quantizer must be 'seeded' or 'kmeans', got {quantizer!r}")
    tmp = out + ".build_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    table.write.partitionBy("cell").parquet(os.path.join(tmp, "vectors"))
    n_vectors = spark.read.parquet(os.path.join(tmp, "vectors")).count()
    meta = {
        "format": "mst-vec-v1",
        "n_cells": int(n_cells),
        "quantizer": quantizer,
        "seed": int(seed),
        "dim": len(cents[0]) if cents else 0,
        "n_vectors": int(n_vectors),
        "centroids": cents,
    }
    with open(os.path.join(tmp, "vector_meta.json"), "w") as f:
        json.dump(meta, f)
    os.replace(tmp, out)
    return meta


class VectorIndex:
    """Query side of :func:`build_vector_index`: driver-side probe choice
    against the persisted centroid matrix, then one cell-pruned scan.

    Probe selection uses the same sequential-fold cosine (and the seeded
    quantizer's same smallest-index tie-break) as :func:`ivf_cosine_topk`,
    so a persisted-index query is bit-identical to the ad-hoc path and to
    the DuckDB oracle :func:`ivf_cosine_topk_sql`."""

    def __init__(self, spark, index_dir: str):
        import json
        import os

        self.spark = spark
        self.dir = os.path.abspath(index_dir)
        with open(os.path.join(self.dir, "vector_meta.json")) as f:
            self.meta = json.load(f)
        self._vectors_path = os.path.join(self.dir, "vectors")

    def _vectors(self) -> DataFrame:
        return self.spark.read.parquet(self._vectors_path)

    def probe_cells(self, qv: list[float], n_probe: int) -> list[int]:
        """The ``n_probe`` cells nearest the query vector (cosine desc,
        cell index asc on ties — the seeded quantizer's ordering)."""
        qnorm = float(np.sqrt(_seq_dot(qv, qv)))
        sims = [
            (_seq_dot(qv, c) / (qnorm * float(np.sqrt(_seq_dot(c, c)))), j)
            for j, c in enumerate(self.meta["centroids"])
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        return [j for _s, j in sims[:n_probe]]

    def query_by_vector(
        self, qv, k: int = 10, n_probe: int = 4, exclude_key=None
    ) -> DataFrame:
        """Top-k by cosine among the probed cells' vectors → (vec_key,
        cosine).  The ``cell`` filter is a PARTITION filter: only the probed
        cells' parquet files are read."""
        qv = [float(x) for x in qv]
        if len(qv) != self.meta["dim"]:
            raise ValueError(f"query dim {len(qv)} != index dim {self.meta['dim']}")
        probes = self.probe_cells(qv, n_probe)
        qlit = F.array(*[F.lit(x) for x in qv])
        df = self._vectors().filter(F.col("cell").isin(probes))
        if exclude_key is not None:
            df = df.filter(F.col("vec_key") != exclude_key)
        return (
            df.withColumn(
                "cosine",
                F.round(
                    _dot(F.col("v"), qlit)
                    / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(qlit, qlit))),
                    4,
                ),
            )
            .select("vec_key", "cosine")
            .orderBy(F.desc("cosine"), F.asc("vec_key"))
            .limit(k)
        )

    def query_by_id(self, vec_key, k: int = 10, n_probe: int = 4) -> DataFrame:
        """Similar-vectors serving by stored key (the similar-documents
        shape): fetch the key's vector, then :meth:`query_by_vector`
        excluding the key itself.

        Scale note: only the PROBE scan is cell-pruned; this key→vector
        point lookup pushes ``vec_key`` down to parquet row-group min/max
        stats but still consults every cell's footers (keys hash across
        cells, so no cell can be ruled out).  At 100 TB serve the lookup
        from the primary key-partitioned store (exactly what
        ``x17_similar_documents`` does for documents) and call
        :meth:`query_by_vector` directly — the persisted structure's claim
        is about the probe, not the lookup."""
        rows = self._vectors().filter(F.col("vec_key") == vec_key).select("v").collect()
        if not rows:
            raise ValueError(f"vec_key {vec_key!r} not in the vector index")
        return self.query_by_vector(
            list(rows[0]["v"]), k=k, n_probe=n_probe, exclude_key=vec_key
        )


def embedding_near_dup_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cosine ≥ threshold).

    The correctness baseline: id-ordered self-join with vectorized dot
    products.  Quadratic in corpus size — use the LSH variant below at scale.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _spread(emb).select(F.col(id_col).alias("k"), vec_d.alias("v"))
    a = base.select(F.col("k").alias("left_key"), F.col("v").alias("va"))
    b = base.select(F.col("k").alias("right_key"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("left_key") < F.col("right_key"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("left_key", "right_key", "cosine")
    )


def embedding_near_dup_pairs_sql(table: str, id_col: str, vec_col: str, threshold: float = 0.95) -> str:
    return f"""
SELECT a.{id_col} AS left_key, b.{id_col} AS right_key,
       ROUND(list_dot_product(a.{vec_col}, b.{vec_col})
             / (sqrt(list_dot_product(a.{vec_col}, a.{vec_col}))
                * sqrt(list_dot_product(b.{vec_col}, b.{vec_col}))), 4) AS cosine
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE ROUND(list_dot_product(a.{vec_col}, b.{vec_col})
            / (sqrt(list_dot_product(a.{vec_col}, a.{vec_col}))
               * sqrt(list_dot_product(b.{vec_col}, b.{vec_col}))), 4) >= {threshold}
"""


def embedding_near_dup_pairs_lsh_sql(
    table: str,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
) -> str:
    """DuckDB twin of :func:`embedding_near_dup_pairs_lsh` — md5-derived
    planes make even the LSH bucketing (and therefore the candidate pair set)
    exactly reproducible outside Spark."""
    bucket = _bucket_expr_sql("v", dim, n_planes, seed)
    cos = (
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
WITH v AS (
  SELECT {id_col} AS vec_key, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
),
b AS (
  SELECT vec_key, v, {bucket} AS bucket FROM v
)
SELECT a.vec_key AS left_key, b.vec_key AS right_key, ROUND({cos}, 4) AS cosine
FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_key < b.vec_key
WHERE ROUND({cos}, 4) >= {threshold}
"""


def embedding_near_dup_pairs_lsh(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Scale path: hyperplane-LSH bucket self-join → exact cosine filter.

    Pairs must share a sign-bucket to be compared (high-cosine pairs almost
    always do: P[same side of one plane] = 1 - θ/π), so the join touches
    per-bucket groups instead of the full cross product.  Output ⊆ the exact
    pairs above; recall rises with fewer planes or multi-probe."""
    bucketed = hyperplane_lsh_buckets(emb, id_col, vec_col, dim, n_planes, seed)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = (
        emb.select(F.col(id_col).alias("k"), vec_d.alias("v"))
        .join(bucketed.withColumnRenamed("vec_key", "k"), "k")
    )
    a = base.select(F.col("k").alias("left_key"), F.col("v").alias("va"), "bucket")
    b = base.select(F.col("k").alias("right_key"), F.col("v").alias("vb"), F.col("bucket").alias("b2"))
    return (
        a.join(b, (F.col("bucket") == F.col("b2")) & (F.col("left_key") < F.col("right_key")))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("left_key", "right_key", "cosine")
    )


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    id_col: str,
    text_col: str,
    emb_id_col: str,
    vec_col: str,
    query_terms: list,
    query_vec_id: int,
    k: int = 10,
    semantic_ratio: float = 0.5,
) -> DataFrame:
    """Hybrid keyword+semantic search (MeiliSearch v1.6 hybrid search with
    ``semanticRatio``): blend the BM25 keyword score and the embedding
    cosine into one ranking —

        hybrid = ratio * (cosine + 1)/2  +  (1 - ratio) * bm25 / max_bm25

    over every embedded document (bm25 = 0 when the doc matches no query
    term; the query vector is the embedding row ``query_vec_id``, same
    proxy-query convention as :func:`cosine_topk_to_query`, which is
    excluded from results).  ratio=0 is pure keyword order, ratio=1 pure
    semantic.

    Scale shape: the semantic side here is the labeled brute-force baseline
    (one narrow pass over the embeddings); at 100 TB swap in the IVF/LSH
    top-k for the semantic pool and the block-max engine top-k for the
    keyword pool and blend the UNION of the two pools with these same
    formulas — pool merge is exactly how MeiliSearch's hybrid executes.
    Components and the blend are rounded to 4 decimals (engine-stable).
    """
    from ..query.adhoc import bm25_scores

    if not 0.0 <= semantic_ratio <= 1.0:
        raise ValueError(f"semantic_ratio must be in [0, 1], got {semantic_ratio}")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _spread(emb).select(F.col(emb_id_col).alias("doc_key"), vec_d.alias("v"))
    q = base.filter(F.col("doc_key") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("doc_key").alias("qid")
    )
    sem = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("doc_key") != F.col("qid"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
                4,
            ),
        )
        .select("doc_key", "cosine")
    )
    # unordered scoring subplan — no global sort of the whole matching set
    # (only the max and the per-doc values are consumed)
    kw = bm25_scores(docs, id_col, text_col, query_terms).select(
        F.col("doc_key"), F.col("score").alias("bm25")
    )
    mx = kw.agg(F.max("bm25").alias("mx"))
    r = float(semantic_ratio)
    return (
        sem.join(kw, "doc_key", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_key",
            F.round(
                F.lit(r) * (F.col("cosine") + 1.0) / 2.0
                + F.lit(1.0 - r) * F.coalesce(F.col("bm25") / F.col("mx"), F.lit(0.0)),
                4,
            ).alias("hybrid_score"),
            "cosine",
            F.coalesce(F.col("bm25"), F.lit(0.0)).alias("bm25"),
        )
        .orderBy(F.desc("hybrid_score"), F.asc("doc_key"))
        .limit(k)
    )


def hybrid_topk_sql(
    docs_table: str,
    emb_table: str,
    id_col: str,
    text_col: str,
    emb_id_col: str,
    vec_col: str,
    query_terms: list,
    query_vec_id: int,
    k: int = 10,
    semantic_ratio: float = 0.5,
) -> str:
    """DuckDB twin of :func:`hybrid_topk`."""
    from ..query.adhoc import bm25_topk_sql_oracle

    r = float(semantic_ratio)
    bm25_sql = bm25_topk_sql_oracle(
        docs_table, id_col, text_col, query_terms, k=1 << 30
    )
    return f"""
WITH q AS (
  SELECT {vec_col} AS qv FROM {emb_table} WHERE {emb_id_col} = {query_vec_id}
),
sem AS (
  SELECT {emb_id_col} AS doc_key,
         ROUND(list_dot_product({vec_col}, qv)
               / (sqrt(list_dot_product({vec_col}, {vec_col})) * sqrt(list_dot_product(qv, qv))), 4) AS cosine
  FROM {emb_table}, q
  WHERE {emb_id_col} <> {query_vec_id}
),
kw AS (SELECT doc_key, score AS bm25 FROM ({bm25_sql})),
mx AS (SELECT MAX(bm25) AS mx FROM kw)
SELECT sem.doc_key,
       ROUND({r} * (sem.cosine + 1.0) / 2.0
             + {1.0 - r} * COALESCE(kw.bm25 / mx.mx, 0.0), 4) AS hybrid_score,
       sem.cosine,
       COALESCE(kw.bm25, 0.0) AS bm25
FROM sem LEFT JOIN kw USING (doc_key) CROSS JOIN mx
ORDER BY hybrid_score DESC, doc_key ASC
LIMIT {k}
"""


def hybrid_pools_topk(
    keyword_pool: DataFrame,
    semantic_pool: DataFrame,
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec_id: int,
    k: int = 10,
    semantic_ratio: float = 0.5,
) -> DataFrame:
    """Pool-union hybrid — the 100 TB path :func:`hybrid_topk` documents,
    made real over the ACTUAL index structures: ``keyword_pool`` is the BM25
    engine's top-k ``(doc_key, bm25)`` (block-max path), ``semantic_pool``
    the vector index's top-k ``(doc_key, cosine)`` (cell-pruned IVF probe,
    cosine already at 4 decimals).  Candidates = the UNION of the two pools
    (pool merge is exactly how MeiliSearch's hybrid executes); each
    candidate's MISSING side is backfilled exactly — a pool-sized lookup:
    keyword-only docs get their true cosine from ``emb``, semantic-only docs
    get bm25 = 0 (they matched no query term or fell below the keyword
    pool, where their normalized contribution is ~0 anyway).

    Blend = ``ratio * (cosine+1)/2 + (1-ratio) * bm25 / max_pool_bm25``
    (same formula and 4-decimal rounding as :func:`hybrid_topk`, max over
    the keyword pool).  The query vector's own row is excluded BEFORE the
    max.  Only embedded docs rank (inner join on ``emb``), like
    :func:`hybrid_topk`.  Recall vs the all-docs blend is bounded by pool
    truncation — that is the scale trade, and the ONLY difference: on pools
    covering the union's support the two paths agree bit-for-bit.

    Returns (doc_key, hybrid_score, cosine) — DuckDB twin:
    :func:`hybrid_pools_topk_sql`."""
    if not 0.0 <= semantic_ratio <= 1.0:
        raise ValueError(f"semantic_ratio must be in [0, 1], got {semantic_ratio}")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _spread(emb).select(F.col(id_col).alias("doc_key"), vec_d.alias("v"))
    q = base.filter(F.col("doc_key") == query_vec_id).select(F.col("v").alias("qv"))
    kw = (
        keyword_pool.select("doc_key", F.round("bm25", 4).alias("bm25"))
        .filter(F.col("doc_key") != query_vec_id)
    )
    sem = semantic_pool.select("doc_key", "cosine").filter(
        F.col("doc_key") != query_vec_id
    )
    keys = kw.select("doc_key").union(sem.select("doc_key")).distinct()
    mx = kw.agg(F.max("bm25").alias("mx"))
    joined = (
        keys.join(sem, "doc_key", "left")
        .join(kw, "doc_key", "left")
        .join(base, "doc_key")  # inner: only embedded docs rank
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.coalesce(
                F.col("cosine"),
                F.round(
                    _dot(F.col("v"), F.col("qv"))
                    / (
                        F.sqrt(_dot(F.col("v"), F.col("v")))
                        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    ),
                    4,
                ),
            ),
        )
        .crossJoin(F.broadcast(mx))
    )
    r = float(semantic_ratio)
    return (
        joined.select(
            "doc_key",
            F.round(
                F.lit(r) * (F.col("cosine") + 1.0) / 2.0
                + F.lit(1.0 - r) * F.coalesce(F.col("bm25") / F.col("mx"), F.lit(0.0)),
                4,
            ).alias("hybrid_score"),
            "cosine",
        )
        .orderBy(F.desc("hybrid_score"), F.asc("doc_key"))
        .limit(k)
    )


def hybrid_pools_topk_sql(
    keyword_pool_sql: str,
    semantic_pool_sql: str,
    table: str,
    id_col: str,
    vec_col: str,
    query_vec_id: int,
    k: int = 10,
    semantic_ratio: float = 0.5,
) -> str:
    """DuckDB twin of :func:`hybrid_pools_topk`: ``keyword_pool_sql`` yields
    (doc_key, score[, ...]) — e.g. ``bm25_topk_sql_oracle`` — and
    ``semantic_pool_sql`` yields (vec_key, cosine) — e.g.
    ``ivf_cosine_topk_sql``."""
    r = float(semantic_ratio)
    return f"""
WITH kw AS (
  SELECT doc_key, ROUND(score, 4) AS bm25 FROM ({keyword_pool_sql})
  WHERE doc_key <> {query_vec_id}
),
sem AS (
  SELECT vec_key AS doc_key, cosine FROM ({semantic_pool_sql})
  WHERE vec_key <> {query_vec_id}
),
v AS (
  SELECT {id_col} AS doc_key, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
),
q AS (SELECT v AS qv FROM v WHERE doc_key = {query_vec_id}),
keys AS (SELECT doc_key FROM kw UNION SELECT doc_key FROM sem),
m AS (SELECT MAX(bm25) AS mx FROM kw),
j AS (
  SELECT keys.doc_key,
         COALESCE(sem.cosine,
                  ROUND(list_dot_product(v.v, q.qv)
                        / (sqrt(list_dot_product(v.v, v.v))
                           * sqrt(list_dot_product(q.qv, q.qv))), 4)) AS cosine,
         kw.bm25 AS bm25
  FROM keys LEFT JOIN sem USING (doc_key) LEFT JOIN kw USING (doc_key)
  JOIN v ON v.doc_key = keys.doc_key CROSS JOIN q
)
SELECT j.doc_key AS doc_key,
       ROUND({r!r} * (j.cosine + 1.0) / 2.0
             + {1.0 - r!r} * COALESCE(j.bm25 / m.mx, 0.0), 4) AS hybrid_score,
       j.cosine AS cosine
FROM j CROSS JOIN m
ORDER BY hybrid_score DESC, doc_key ASC
LIMIT {k}
"""


def pool_embeddings(
    chunks: DataFrame,
    group_col: str,
    vec_col: str,
    mode: str = "mean",
) -> DataFrame:
    """Roll chunk embeddings up to one vector per ``group_col`` (the
    chunk→document step every retrieval pipeline runs after
    ``chunk_documents`` + embed: a document's embedding = the mean (or
    element-wise max) of its chunks').

    Shape: posexplode the vectors once, ONE groupBy (group, dim) with
    map-side combine — the dimension fan-out multiplies rows by dim but
    every row is 20 bytes, and the aggregate collapses them before any
    further movement — then one groupBy(group) reassembles the vector via
    sort_array over (dim, value) structs (exact: dims are distinct ints,
    so the struct sort is a total order and never compares floats).
    Mean uses SUM/COUNT in double precision; engines agree to float
    tolerance, not bitwise (float addition order varies with
    partitioning), so the oracle compare rounds — same contract as every
    cosine entry.

    NULL/empty vectors carry no signal: they are dropped BEFORE both the
    pool and the ``n_chunks`` count (so the pair stays consistent — a mean
    over 3 vectors always reports n_chunks=3), and a group whose chunks
    are ALL null/empty is absent from the output (there is no embedding to
    report; callers wanting those groups left-join this result back).

    Returns (``group_col``, embedding array<double>, n_chunks).
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode!r}")
    agg = F.avg("v") if mode == "mean" else F.max("v")
    vec = chunks.filter(F.size(F.col(vec_col)) > 0)  # size(NULL) = -1
    per_dim = (
        vec.select(
            F.col(group_col),
            F.posexplode(F.col(vec_col)).alias("dim", "v"),
        )
        .groupBy(group_col, "dim")
        .agg(agg.alias("pv"))
    )
    n = vec.groupBy(group_col).agg(F.count("*").cast("long").alias("n_chunks"))
    return (
        per_dim.groupBy(group_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "pv"))), lambda s: s["pv"]
            ).alias("embedding")
        )
        .join(n, group_col)
    )


def pool_embeddings_sql(
    chunks_sql: str, group_col: str, vec_col: str, mode: str = "mean"
) -> str:
    """DuckDB twin of :func:`pool_embeddings` (parallel unnests zip value
    with position — DuckDB has no WITH ORDINALITY — then per-dim aggregate
    + ordered array_agg)."""
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode!r}")
    agg = "AVG(v)" if mode == "mean" else "MAX(v)"
    return f"""
WITH c AS (SELECT * FROM ({chunks_sql}) WHERE len({vec_col}) > 0),
expl AS (
  SELECT {group_col},
         unnest({vec_col}) AS v,
         unnest(generate_series(1, len({vec_col}))) AS dim
  FROM c
),
per_dim AS (
  SELECT {group_col}, dim, {agg} AS pv FROM expl GROUP BY 1, 2
),
n AS (
  SELECT {group_col}, COUNT(*)::BIGINT AS n_chunks FROM c GROUP BY 1
)
SELECT p.{group_col}, array_agg(p.pv ORDER BY p.dim) AS embedding, ANY_VALUE(n.n_chunks) AS n_chunks
FROM per_dim p JOIN n USING ({group_col})
GROUP BY 1
"""
