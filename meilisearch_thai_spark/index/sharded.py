"""Sharded index build — the horizontal-scale serving layout.

One corpus, ``n_shards`` self-contained index directories, each holding the
postings of its document subset but scored with GLOBAL corpus statistics:
the expensive tokenize pass runs ONCE, document frequency / n_docs / avgdl
are computed over the FULL corpus, and every shard's meta.json + postings
``df`` column carry those global values.  Consequently a query federated
across the shards returns top-k hits with BM25 scores IDENTICAL to the
single monolithic index (tested bit-for-bit) — the distributed-IDF design
real sharded engines approximate, exact here because the stats job is just
another Spark aggregate over the same corpus.

Why this is THE 100 TB serving shape: a single index directory serializes
query-time posting reads through one table; N shards put each query's
per-shard top-k scan on disjoint, smaller posting sets that
``query.federation.federated_search`` unions into ONE Spark job (per-shard
block-max and INSET pruning intact, branches planned independently).
Shard count scales with corpus, query cost per shard stays flat.

Block-max exactness: per-shard blocks are encoded with the global
(n_docs, avgdl, df), so each block's max-score bound equals what the
monolithic encoder would produce for the same rows — pruning stays exact,
not merely safe.

Scale note: shards are encoded in a loop (N encode jobs over disjoint
1/N-size row sets — total work equal to the monolithic encode plus N-1 job
overheads).  At very large N, fold the shard id into the encoder's
repartition key ((shard, term, bucket)) and write all shards in one job;
the per-shard loop keeps the encoder untouched and is the honest shape for
the N <= 32 this module targets.

Reference parity: MeiliSearch scales by index-per-tenant + multi-search
federation (v1.10); the reference proxy fronts one node
(src/meilisearch_integration/client.py).  This module is the Spark-native
extension of that federation model to one logical corpus.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# doc_stats column types (matches build_index's stat_cols selection from
# tokenized_docs) — used to write a well-formed EMPTY table for shards that
# received no documents
_EMPTY_STATS_SCHEMA = (
    "doc_id long, url string, lang string, doc_len int, norm_hash string"
)

from ..dictionary import dictionary_fingerprint, get_custom_dictionary
from .builder import (
    DEFAULT_BLOCK_SIZE,
    DEFAULT_BUCKET_SPAN,
    BM25Params,
    IndexMeta,
    encode_postings,
    tokenized_docs,
)


def shard_dir(out_root: str, shard: int) -> str:
    """The directory of one shard index (a fully self-contained index dir)."""
    return os.path.join(out_root, f"shard-{shard:04d}")


def build_sharded_index(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    n_shards: int,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    params: BM25Params = BM25Params(),
    postings_partitions: int | None = None,
) -> list[IndexMeta]:
    """Build ``n_shards`` index directories under ``out_root`` whose union
    is exactly the monolithic ``build_index`` over ``pages``.

    Documents are assigned to shards by ``doc_id % n_shards`` (doc ids are
    the global url rank, so the assignment is deterministic and independent
    of parallelism, and consecutive doc ids spread round-robin — no shard
    inherits a contiguous crawl's hot slice).  Each shard directory holds
    ``postings`` (only its docs' blocks), ``doc_stats`` (only its docs) and
    a ``meta.json`` whose n_docs/avgdl are the GLOBAL corpus values with a
    ``sharding`` record; postings rows carry GLOBAL df.

    Serve with ``query.federation.federated_search(engines, terms,
    normalize=False)`` — raw scores are corpus-wide comparable by
    construction, so cross-shard merge needs no per-index normalization and
    reproduces the single-index ranking bit-for-bit.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    postings_partitions = postings_partitions or spark.sparkContext.defaultParallelism

    caches: list[DataFrame] = []
    docs = tokenized_docs(pages, _caches=caches).persist()

    stat_cols = ["doc_id", "url", "lang", "doc_len", "norm_hash"]
    shard_col = F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    # one job writes every shard's doc_stats (dynamic partition dirs), then
    # the dirs are adopted as each shard's doc_stats table
    stats_stage = os.path.join(out_root, "_doc_stats_by_shard")
    (
        docs.select(shard_col.alias("shard"), *stat_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(stats_stage)
    )
    g = docs.agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 1.0)
    for c in caches:
        c.unpersist()

    tf = docs.select("doc_id", "doc_len", F.explode("tcounts").alias("term", "tf"))
    # GLOBAL document frequency — the whole point of the sharded build:
    # every shard scores with the corpus-wide idf, not its local one
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    posting_rows = (
        tf.join(df_tbl, "term")
        .withColumn("bucket", (F.col("doc_id") / F.lit(bucket_span)).cast("long"))
        .persist()
    )
    posting_rows.count()  # materialize once; every shard encode reuses it
    docs.unpersist()

    metas: list[IndexMeta] = []
    for s in range(n_shards):
        d = shard_dir(out_root, s)
        os.makedirs(d, exist_ok=True)
        staged = os.path.join(stats_stage, f"shard={s}")
        target = os.path.join(d, "doc_stats")
        shutil.rmtree(target, ignore_errors=True)  # idempotent re-build into out_root
        if os.path.isdir(staged):
            os.replace(staged, target)
        else:
            # an empty shard (n_shards > matching docs) gets an empty but
            # well-formed doc_stats table — the shard is servable, returns
            # nothing, and the federation union stays total
            spark.createDataFrame([], _EMPTY_STATS_SCHEMA).write.mode(
                "overwrite"
            ).parquet(target)
        rows_s = posting_rows.filter(F.pmod(F.col("doc_id"), F.lit(n_shards)) == s)
        postings = encode_postings(
            rows_s, n_docs, avgdl, params, block_size,
            max(postings_partitions // n_shards, 1),
        )
        (
            postings.repartition(max(postings_partitions // n_shards, 1), "term")
            .sortWithinPartitions("term", "bucket", "block_id")
            .write.mode("overwrite")
            .parquet(os.path.join(d, "postings"))
        )
        meta = IndexMeta(
            n_docs=n_docs,  # GLOBAL: scoring parity with the monolithic index
            avgdl=avgdl,
            block_size=block_size,
            bucket_span=bucket_span,
            k1=params.k1,
            b=params.b,
            dictionary_fingerprint=dictionary_fingerprint(),
            custom_dictionary=get_custom_dictionary(),
            sharding={"n_shards": n_shards, "shard": s},
        )
        agg = (
            spark.read.parquet(os.path.join(d, "postings"))
            .agg(F.countDistinct("term").alias("nt"), F.sum("n_docs").alias("np"))
            .collect()[0]
        )
        meta.n_terms, meta.n_postings = int(agg["nt"]), int(agg["np"] or 0)
        with open(os.path.join(d, "meta.json"), "w") as fh:
            json.dump(asdict(meta), fh, indent=1)
        metas.append(meta)
    posting_rows.unpersist()
    shutil.rmtree(stats_stage, ignore_errors=True)  # only _SUCCESS remains
    return metas
