"""Distributed inverted-index build (the engine MeiliSearch hides).

Pipeline (SURVEY §3.2 Spark equivalent):

    pages → assign dense doc ids (range-partition + two-pass offsets)
          → index_terms_udf (newmm segmentation, Arrow-batched)
          → explode → groupBy(doc_id, term) tf           [map-side combine]
          → bucket = doc_id // bucket_span               [salted merge: bounds
            every (term, bucket) group, defeating Zipf head-term skew — AQE
            does not cover hot aggregation keys, SURVEY §4.1]
          → applyInPandas: delta+varbyte blocks + per-block BM25 max score
          → postings parquet sorted by term (row-group pruning at query time)

Also writes ``doc_stats`` (url ↔ doc_id, doc_len, norm-text hash = the per-url
byte-identity lineage) and ``meta.json`` (N, avgdl, BM25 params, dictionary
fingerprint).  Checkpoint/lineage for resumable builds lives in
``lineage.py``.

Scale notes: every stage is a narrow map or a combiner-friendly aggregation;
the only wide shuffles are the two groupBys and the range partition for id
assignment.  No collect() touches row data — driver only sees partition
counts and scalar stats.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import varbyte_encode

DEFAULT_BLOCK_SIZE = 128
DEFAULT_BUCKET_SPAN = 8192  # docs per (term, bucket) group == block_size * 64


@dataclass(frozen=True)
class BM25Params:
    """Pinned scoring parameters (SURVEY §7 risk 2)."""

    k1: float = 1.2
    b: float = 0.75


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    block_size: int
    bucket_span: int
    k1: float
    b: float
    dictionary_fingerprint: str
    n_terms: int = -1
    n_postings: int = -1


POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("dl_bytes", T.BinaryType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("block_max_score", T.DoubleType(), False),
    ]
)


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Lucene-style non-negative BM25 idf."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def assign_doc_ids(
    pages: DataFrame, partitions: int | None = None, _caches: list[DataFrame] | None = None
) -> DataFrame:
    """Dense, deterministic doc ids without a single-partition window.

    Range-partition by url, sort within partitions, then a two-pass offset
    assignment (per-partition counts → cumulative offsets → local row number).
    This is the 10^12-scale pattern: the driver only ever sees one count per
    partition.  The partitioned frame is persisted so both passes observe the
    same layout; the input is persisted too because repartitionByRange's
    boundary sampling is a second full scan of the source.

    Doc ids equal the global url rank regardless of partition count (range
    partitions are contiguous and ordered), so output is identical at any
    parallelism — the property the scaling bench relies on.
    """
    spark = pages.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    pages = pages.persist()
    parted = (
        pages.repartitionByRange(partitions, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if _caches is not None:
        _caches.append(parted)
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    pages.unpersist()
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(parted.schema.fields + [T.StructField("doc_id", T.LongType(), False)])

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(doc_id=pd.Series(dtype="int64"))
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = boff.value[pid] + local
            local += len(pdf)
            yield pdf.assign(doc_id=np.arange(start, start + len(pdf), dtype=np.int64))

    tagged = parted.mapInPandas(tag, out_schema).drop("_pid")
    return tagged


def _make_block_encoder(n_docs: int, avgdl: float, params: BM25Params, block_size: int):
    k1, b = params.k1, params.b

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # one (term, bucket) group; bounded by bucket_span rows
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        dfreq = int(pdf["df"].iloc[0])
        ids = pdf["doc_id"].to_numpy(np.uint64)
        tfs = pdf["tf"].to_numpy(np.uint64)
        dls = pdf["doc_len"].to_numpy(np.uint64)
        term_idf = idf(float(dfreq), n_docs)
        rows = []
        for s in range(0, len(ids), block_size):
            e = min(s + block_size, len(ids))
            bi, bt, bd = ids[s:e], tfs[s:e], dls[s:e]
            tfs_f = bt.astype(np.float64)
            scores = term_idf * (tfs_f * (k1 + 1.0)) / (tfs_f + k1 * (1.0 - b + b * bd.astype(np.float64) / avgdl))
            deltas = np.empty_like(bi)
            deltas[0] = bi[0]
            np.subtract(bi[1:], bi[:-1], out=deltas[1:])
            rows.append(
                (
                    term,
                    bucket,
                    s // block_size,
                    int(bi[0]),
                    int(e - s),
                    varbyte_encode(deltas),
                    varbyte_encode(bt),
                    varbyte_encode(bd),
                    dfreq,
                    float(scores.max()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "bucket", "block_id", "first_doc", "n_docs",
                "doc_bytes", "tf_bytes", "dl_bytes", "df", "block_max_score",
            ],
        )

    return encode_group


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    params: BM25Params = BM25Params(),
    postings_partitions: int | None = None,
) -> IndexMeta:
    """Build the full inverted index under ``out_dir``.

    Layout: ``{out_dir}/postings`` (parquet, term-sorted), ``{out_dir}/doc_stats``,
    ``{out_dir}/meta.json``.
    """
    from ..dictionary import dictionary_fingerprint
    from ..tokenizer.udfs import index_terms_udf, zwsp_norm_udf

    postings_partitions = postings_partitions or spark.sparkContext.defaultParallelism

    caches: list[DataFrame] = []
    docs = assign_doc_ids(pages, _caches=caches)
    docs = (
        docs.withColumn("terms", index_terms_udf("text"))
        .withColumn("norm_text", zwsp_norm_udf("text"))
        .withColumn("doc_len", F.size("terms"))
        .persist()
    )

    # doc_stats: id mapping + byte-identity lineage hash (north-rule invariant)
    doc_stats = docs.select(
        "doc_id",
        "url",
        "lang",
        "doc_len",
        F.sha2("norm_text", 256).alias("norm_hash"),
    )
    doc_stats.repartition(max(postings_partitions // 4, 1), "doc_id").write.mode("overwrite").parquet(
        os.path.join(out_dir, "doc_stats")
    )
    for c in caches:  # docs cache is materialized now; upstream caches can go
        c.unpersist()

    stats = docs.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 1.0)

    # token -> tf  (key includes doc_id: partial aggregation handles volume,
    # no single hot key because every (doc, term) pair is unique-ish)
    tf = (
        docs.select("doc_id", "doc_len", F.explode("terms").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("doc_len").alias("doc_len"))
    )

    # document frequency per term — combiner-friendly count, skew-safe
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    # salted merge: (term, bucket) bounds every group to <= bucket_span docs
    posting_rows = (
        tf.join(df_tbl, "term")
        .withColumn("bucket", (F.col("doc_id") / F.lit(bucket_span)).cast("long"))
    )

    encoder = _make_block_encoder(n_docs, avgdl, params, block_size)
    postings = posting_rows.groupBy("term", "bucket").applyInPandas(encoder, POSTINGS_SCHEMA)

    (
        postings.repartition(postings_partitions, "term")
        .sortWithinPartitions("term", "bucket", "block_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "postings"))
    )

    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        block_size=block_size,
        bucket_span=bucket_span,
        k1=params.k1,
        b=params.b,
        dictionary_fingerprint=dictionary_fingerprint(),
    )
    pst = spark.read.parquet(os.path.join(out_dir, "postings"))
    agg = pst.agg(
        F.countDistinct("term").alias("nt"), F.sum("n_docs").alias("np")
    ).collect()[0]
    meta.n_terms, meta.n_postings = int(agg["nt"]), int(agg["np"])
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(asdict(meta), fh, indent=1)
    docs.unpersist()
    return meta


def load_meta(index_dir: str) -> IndexMeta:
    with open(os.path.join(index_dir, "meta.json")) as fh:
        return IndexMeta(**json.load(fh))
