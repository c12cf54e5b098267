"""Federated multi-index search (MeiliSearch v1.10 ``/multi-search`` with
``federation``): one query across several indexes, merged into a single
ranked hit list.

The reference proxies one MeiliSearch node; real deployments shard corpora
into many indexes (per-site, per-language, per-tenant) and federate at query
time.  Spark-first shape: each engine contributes its (lazy) top-k DataFrame
and the federation is a UNION of those plans + one TakeOrderedAndProject —
N indexes are searched in ONE Spark job, not N sequential requests with a
driver-side merge.  At 100× each index is its own partition set; the union
keeps per-index pruning (block-max, INSET pushdown) fully intact because
Catalyst plans each branch independently.

Score comparability: raw BM25 is corpus-dependent (df/avgdl differ per
index), so cross-index ranking uses each index's MAX-normalized score times
the caller's per-index federation weight — the same normalization MeiliSearch
applies via its 0-1 ranking score, expressed with deterministic arithmetic
the DuckDB oracle reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def federated_search(
    engines: dict,
    terms: list[str],
    k: int = 10,
    weights: dict[str, float] | None = None,
    pool_k: int | None = None,
    normalize: bool = True,
) -> DataFrame:
    """One ranked hit list across many indexes →
    (index_uid, url, doc_id, score, federated_score).

    ``engines`` maps index uid → :class:`~.executor.SearchEngine`;
    ``weights`` is MeiliSearch's ``federationOptions.weight`` (default 1.0).
    Each index contributes its top-``pool_k`` (default ``k``) candidates;
    ``federated_score = weight * score / max_score_within_index`` over the
    contributed pool, merged and cut to ``k`` (ties: index uid, then doc id).

    The per-index max is a window over the pooled candidates (the pool's
    best IS the index's best: per-index top-k is score-ordered), so the
    whole federation stays one lazy plan — no eager per-index collect.

    ``normalize=False`` merges RAW scores (``federated_score = weight *
    score``) — the sharded-serving mode: shards built by
    ``index.sharded.build_sharded_index`` score with GLOBAL corpus
    statistics, so raw scores are already cross-shard comparable and the
    merged top-k reproduces the monolithic index's ranking exactly;
    max-normalizing would DESTROY that parity.  Keep the default for
    federating unrelated corpora, whose raw BM25 ranges differ."""
    if not engines:
        raise ValueError("federated_search needs at least one engine")
    weights = weights or {}
    bad = sorted(set(weights) - set(engines))
    if bad:
        raise ValueError(f"weights name unknown indexes {bad}")
    pool_k = pool_k or k
    # Per-branch url resolution (search_terms' broadcast join) is the FASTER
    # shape here, measured: a pooled single-join alternative (bare
    # scored_topk branches + one broadcast join against uid-tagged unioned
    # doc_stats) was tried and is ~35% slower interleaved-min A/B — the
    # winners' broadcast stage serializes BEFORE the stats scan stage,
    # while per-branch joins overlap their tiny broadcasts with branch
    # execution.  Fewer exchanges lost to stage serialization.
    pools = []
    for uid in sorted(engines):
        w = float(weights.get(uid, 1.0))
        pool = (
            engines[uid]
            .search_terms(terms, k=pool_k)
            .select(
                F.lit(uid).alias("index_uid"),
                "url",
                "doc_id",
                # presentation-precision (4-decimal) scores BEFORE the
                # normalization ratio: both the ratio's inputs are then
                # engine-stable doubles, so any external oracle normalizing
                # the same rounded pool agrees bit-for-bit
                F.round("score", 4).alias("score"),
                F.lit(w).alias("_w"),
            )
        )
        pools.append(pool)
    allp = pools[0]
    for p in pools[1:]:
        allp = allp.unionByName(p)
    if normalize:
        mx = Window.partitionBy("index_uid")
        fed = F.round(F.col("_w") * F.col("score") / F.max("score").over(mx), 4)
        # ties group by index first: normalized scores are per-index scales
        order = [F.desc("federated_score"), F.asc("index_uid"), F.asc("doc_id")]
    else:
        fed = F.round(F.col("_w") * F.col("score"), 4)
        # raw sharded mode: doc ids are GLOBAL (one corpus), so the
        # monolithic engine's tie-break (doc id asc) must win over shard uid
        # for exact rank parity
        order = [F.desc("federated_score"), F.asc("doc_id"), F.asc("index_uid")]
    return (
        allp.withColumn("federated_score", fed)
        .drop("_w")
        .orderBy(*order)
        .limit(k)
    )
