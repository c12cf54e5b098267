"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed path.

Brute force is the correctness baseline (one broadcast of the query vector,
one pass, TakeOrderedAndProject).  The random-hyperplane LSH variant is the
100 TB path: bucket on sign bits so the scan touches only matching buckets.
All arithmetic in float64 with sequential summation so external oracles
reproduce values bit-for-bit before rounding."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk_to_query(
    emb: DataFrame, id_col: str, vec_col: str, query_id: int, k: int = 20
) -> DataFrame:
    """Top-k most-similar vectors to the row ``id_col == query_id``.

    The query vector never leaves the cluster: a 1-row broadcast crossJoin.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
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


def hyperplane_lsh_buckets(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit signature).

    The plane matrix is deterministic (seeded) and broadcast as literals —
    at query time only vectors in the query's bucket (and Hamming-adjacent
    buckets if recall demands) are scored: the IVF-style scale path."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v"))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot_i = _dot(F.col("v"), plane)
        bucket = bucket + F.when(dot_i > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out.withColumn("bucket", bucket).select("vec_key", "bucket")


def lsh_cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, query_id: int, k: int = 20, n_planes: int = 6
) -> DataFrame:
    """ANN top-k via multi-probe hyperplane LSH (recall < 1 by design; brute
    force above is the exactness baseline).

    Probes the query's bucket plus all Hamming-distance-1 buckets (vectors
    near a hyperplane land on either side, so flipping one sign bit recovers
    most misses).  Scans (n_planes+1)/2**n_planes of the corpus — ~11% at the
    default 6 planes — while the broadcast keeps it one shuffle-free pass."""
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


def ivf_cosine_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 20,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k via IVF: probe the ``n_probe`` cells nearest the query.

    Recall < 1 by design (the brute-force ``cosine_topk_to_query`` is the
    exactness baseline); scans ~n_probe/n_cells of the corpus.  Cell choice
    happens driver-side against the (tiny) centroid matrix; scoring within
    probed cells is the same vectorized cosine as the exact path."""
    assignments, centroids = ivf_assignments(emb, id_col, vec_col, n_cells, seed)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("vec_key"), vec_d.alias("v")).join(assignments, "vec_key")

    qrow = base.filter(F.col("vec_key") == query_id).select("v").collect()
    if not qrow:
        return base.filter(F.lit(False)).select("vec_key", F.lit(0.0).alias("cosine"))
    qv = np.asarray(qrow[0]["v"], dtype=np.float64)
    sims = centroids @ qv / (np.linalg.norm(centroids, axis=1) * np.linalg.norm(qv) + 1e-12)
    probe_cells = [int(c) for c in np.argsort(-sims)[:n_probe]]

    qlit = F.array(*[F.lit(float(x)) for x in qv])
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


def embedding_near_dup_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cosine ≥ threshold).

    The correctness baseline: id-ordered self-join with vectorized dot
    products.  Quadratic in corpus size — use the LSH variant below at scale.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("k"), vec_d.alias("v"))
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
