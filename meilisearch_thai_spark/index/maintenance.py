"""Index maintenance: document deletion (tombstones) + compaction.

The reference deletes documents through MeiliSearch
(src/meilisearch_integration/client.py:251-268 delete_document[s]); the
Spark-native equivalent is the standard search-engine/LSM shape:

- ``delete_docs`` writes TOMBSTONES (doc ids) — O(deleted) work, no index
  rewrite.  Query paths exclude tombstoned ids exactly (inside the top-k
  heaps, so result pages stay full); the warm serving tier excludes them at
  load.  Corpus stats (df, n_docs, avgdl) intentionally still count
  tombstoned docs until compaction — exactly how Lucene treats deletes.
- ``compact_index`` rewrites the index WITHOUT the deleted docs by decoding
  the posting blocks themselves (no original text needed): blocks → tf rows
  (+ positions for positional indexes) → recomputed df/n_docs/avgdl →
  re-encode through the same salted (term, bucket) merge as the build.
  After compaction, scores per url are IDENTICAL to a fresh build over the
  surviving corpus (tested) and the tombstone set resets.

Re-adding a url (re-crawl) goes through the streaming/resumable upsert path
(latest-crawl-wins); deletion + upsert together give the reference's full
document CRUD surface.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .builder import BM25Params, IndexMeta, encode_postings, load_meta
from .codec import varbyte_decode

TOMBSTONES = "tombstones"


def delete_docs(spark: SparkSession, index_dir: str, urls: list[str]) -> int:
    """Tombstone the documents with the given urls; returns how many matched.

    Append-only parquet of doc ids — repeated deletes accumulate and are
    deduplicated at read time.  Unknown urls are ignored (MeiliSearch's
    delete semantics: deleting a missing id is a no-op)."""
    if not urls:
        return 0
    ds = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    doomed = ds.filter(F.col("url").isin(list(urls))).select("doc_id")
    n = doomed.count()
    if n:
        doomed.write.mode("append").parquet(os.path.join(index_dir, TOMBSTONES))
    return n


def tombstoned_ids(spark: SparkSession, index_dir: str) -> list[int]:
    """Distinct tombstoned doc ids ([] when none)."""
    path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.isdir(path):
        return []
    return [
        int(r["doc_id"])
        for r in spark.read.parquet(path).select("doc_id").distinct().collect()
    ]


def _tf_schema(positional: bool) -> T.StructType:
    fields = [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("doc_len", T.LongType(), False),
    ]
    if positional:
        fields.append(T.StructField("positions", T.ArrayType(T.IntegerType()), False))
    return T.StructType(fields)


def _make_block_unpacker(excluded: list[int], positional: bool):
    """posting blocks → surviving (term, doc_id, tf, doc_len[, positions])
    rows — the decode half of compaction."""
    excl = np.sort(np.asarray(excluded, dtype=np.int64)) if excluded else None

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"term": [], "doc_id": [], "tf": [], "doc_len": []}
            pos_out: list = []
            for row in pdf.itertuples(index=False):
                ids = np.cumsum(varbyte_decode(row.doc_bytes), dtype=np.uint64).astype(np.int64)
                tfs = varbyte_decode(row.tf_bytes).astype(np.int64)
                dls = varbyte_decode(row.dl_bytes).astype(np.int64)
                keep = (
                    ~np.isin(ids, excl) if excl is not None else np.ones(len(ids), dtype=bool)
                )
                if not keep.any():
                    continue
                if positional:
                    flat = varbyte_decode(row.pos_bytes)
                    cs = np.cumsum(flat)
                    offs = np.zeros(len(tfs) + 1, dtype=np.int64)
                    np.cumsum(tfs, out=offs[1:])
                    for i in np.flatnonzero(keep):
                        seg = cs[offs[i] : offs[i + 1]]
                        base = cs[offs[i] - 1] if offs[i] > 0 else 0
                        pos_out.append((seg - base).astype(np.int32).tolist())
                n = int(keep.sum())
                rows["term"].append(np.full(n, row.term, dtype=object))
                rows["doc_id"].append(ids[keep])
                rows["tf"].append(tfs[keep])
                rows["doc_len"].append(dls[keep])
            if rows["doc_id"]:
                out = pd.DataFrame(
                    {
                        "term": np.concatenate(rows["term"]),
                        "doc_id": np.concatenate(rows["doc_id"]),
                        "tf": np.concatenate(rows["tf"]),
                        "doc_len": np.concatenate(rows["doc_len"]),
                    }
                )
                if positional:
                    out["positions"] = pos_out
                yield out

    return unpack


def compact_index(
    spark: SparkSession,
    index_dir: str,
    params: BM25Params | None = None,
    sink=None,
) -> IndexMeta:
    """Rewrite the index without tombstoned docs; stats (df, n_docs, avgdl)
    refresh to the surviving corpus.  Doc ids are PRESERVED (no re-ranking),
    so external references stay valid; scores equal a fresh build over the
    surviving corpus per url (tested).  Idempotent; clears the tombstone set
    on success.  A no-op (returns current meta) when nothing is tombstoned."""
    from .sinks import ParquetSink

    meta = load_meta(index_dir)
    excluded = tombstoned_ids(spark, index_dir)
    if not excluded:
        return meta
    sink = sink or ParquetSink(index_dir)
    params = params or BM25Params(k1=meta.k1, b=meta.b)
    positional = bool(getattr(meta, "positional", False))

    # surviving doc_stats → new corpus stats (write via a temp table name so
    # the source of the running read isn't clobbered mid-plan)
    ds = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    survivors = ds.filter(~F.col("doc_id").isin(excluded)).cache()
    g = survivors.agg(F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 1.0)
    sink.write(survivors, "doc_stats_compacting")

    cols = ["term", "df", "doc_bytes", "tf_bytes", "dl_bytes"] + (
        ["pos_bytes"] if positional else []
    )
    tf = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .select(*cols)
        .mapInPandas(_make_block_unpacker(excluded, positional), _tf_schema(positional))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    posting_rows = tf.join(df_tbl, "term").withColumn(
        "bucket", (F.col("doc_id") / F.lit(meta.bucket_span)).cast("long")
    )
    parts = spark.sparkContext.defaultParallelism
    postings = encode_postings(posting_rows, n_docs, avgdl, params, meta.block_size, parts)
    sink.write(
        postings.repartition(parts, "term").sortWithinPartitions("term", "bucket", "block_id"),
        "postings_compacting",
    )
    survivors.unpersist()

    # atomic-ish swap: move compacted tables into place, then drop tombstones
    for table in ("doc_stats", "postings"):
        final, tmp = os.path.join(index_dir, table), os.path.join(index_dir, table + "_compacting")
        shutil.rmtree(final)
        os.replace(tmp, final)
    shutil.rmtree(os.path.join(index_dir, TOMBSTONES), ignore_errors=True)

    pst = sink.read(spark, "postings")
    agg = pst.agg(F.countDistinct("term").alias("nt"), F.sum("n_docs").alias("np")).collect()[0]
    meta.n_docs, meta.avgdl = n_docs, avgdl
    meta.n_terms, meta.n_postings = int(agg["nt"]), int(agg["np"])
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(asdict(meta), fh, indent=1)
    return meta
