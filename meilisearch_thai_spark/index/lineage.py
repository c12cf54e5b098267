"""Checkpoint-resumable index build with per-partition lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition lineage
+ metrics".  The reference's analogue is per-batch ProcessingMetadata and
batch stats (src/meilisearch_integration/document_processor.py:319-343) —
its FastAPI service retries whole batches; at 10^12 documents a restart must
instead skip exactly the work that already committed.

Phases (each idempotent, each with a durable completion marker):

  phase 0  doc_map       assign dense doc ids from a url-only scan (cheap:
                         column pruning reads one string column).
  phase 1  tf shards     the expensive tokenization pass, split into
                         ``n_shards`` url-hash shards processed in batches;
                         each shard commits a parquet partition + a lineage
                         JSON (doc/token/posting counts, wall time).  A crash
                         loses at most one in-flight batch.
  phase 2  finalize      global stats (N, avgdl, df), block encoding, postings
                         + doc_stats + meta.json — same artifacts as the
                         one-shot ``build_index`` (positional shards via
                         ``positional=True`` yield a phrase-capable index
                         identical to the one-shot positional build).

Shard key is ``pmod(xxhash64(url), n_shards)`` — derivable from the row alone,
so resume never depends on nondeterministic partitioning.  At cluster scale
the pages table should be bucketed by the same key (Iceberg
``bucket(n_shards, url)``) so each batch prunes to its own files instead of
re-scanning the corpus.

Determinism: the final artifacts are byte-equal to a clean one-shot run
(verified in tests/test_resume.py by killing after shard 0 and resuming).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import (
    DEFAULT_BLOCK_SIZE,
    DEFAULT_BUCKET_SPAN,
    BM25Params,
    IndexMeta,
    assign_doc_ids,
    encode_postings,
)


class ShardCommitError(RuntimeError):
    """Injected-failure hook for resume tests."""


def _marker(path: str) -> bool:
    return os.path.exists(path)


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, "tf", f"shard={shard}")


def _lineage_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, "lineage", f"shard-{shard}.json")


def completed_shards(out_dir: str, n_shards: int) -> list[int]:
    return [s for s in range(n_shards) if _marker(_lineage_path(out_dir, s))]


def read_lineage(out_dir: str) -> list[dict]:
    ldir = os.path.join(out_dir, "lineage")
    if not os.path.isdir(ldir):
        return []
    out = []
    for fn in sorted(os.listdir(ldir)):
        if fn.endswith(".json"):
            with open(os.path.join(ldir, fn)) as fh:
                out.append(json.load(fh))
    return out


def build_index_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    shard_batch_size: int = 4,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    params: BM25Params = BM25Params(),
    fail_after_batches: int | None = None,
    positional: bool = False,
) -> IndexMeta:
    """Build (or resume building) the index under ``out_dir``.

    ``fail_after_batches`` aborts after N phase-1 batch commits — the
    kill-and-resume test hook (SURVEY §5 test plan item 4).
    ``positional=True`` stores term positions in the shards (posexplode
    ordinals == the fused pass's position semantics), producing a
    phrase-capable index identical to ``build_index(positional=True)``.
    """
    from ..dictionary import dictionary_fingerprint
    from ..tokenizer.udfs import index_features_udf_with_dictionary

    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    shard_key = F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards)).cast("int")

    # ---------------------------------------------------------------- phase 0
    doc_map_dir = os.path.join(out_dir, "doc_map")
    p0_marker = os.path.join(out_dir, "_PHASE0_DONE")
    if not _marker(p0_marker):
        ids = assign_doc_ids(pages.select("url", "lang"))
        ids.write.mode("overwrite").parquet(doc_map_dir)
        with open(p0_marker, "w") as fh:
            json.dump({"phase": 0, "ts": time.time()}, fh)
    doc_map = spark.read.parquet(doc_map_dir)

    # ---------------------------------------------------------------- phase 1
    done = set(completed_shards(out_dir, n_shards))
    todo = [s for s in range(n_shards) if s not in done]
    batches = [todo[i : i + shard_batch_size] for i in range(0, len(todo), shard_batch_size)]
    committed_batches = 0
    for batch in batches:
        t0 = time.time()
        sub = (
            pages.select("url", "text")
            .filter(shard_key.isin([int(s) for s in batch]))
            .withColumn("shard", shard_key)
        )
        toks = (
            sub.withColumn("_f", index_features_udf_with_dictionary()("text"))
            .select(
                "shard",
                "url",
                F.col("_f.terms").alias("terms"),
                F.col("_f.norm_hash").alias("norm_hash"),
            )
            .withColumn("doc_len", F.size("terms"))
        )
        if positional:
            tf = (
                toks.select(
                    "shard", "url", "doc_len", "norm_hash",
                    F.posexplode_outer("terms").alias("pos", "term"),
                )
                .groupBy("shard", "url", "term")
                .agg(
                    F.count("*").alias("tf"),
                    F.first("doc_len").alias("doc_len"),
                    F.first("norm_hash").alias("norm_hash"),
                    F.sort_array(F.collect_list("pos")).alias("positions"),
                )
            )
        else:
            tf = (
                toks.select("shard", "url", "doc_len", "norm_hash", F.explode_outer("terms").alias("term"))
                .groupBy("shard", "url", "term")
                .agg(
                    F.count("*").alias("tf"),
                    F.first("doc_len").alias("doc_len"),
                    F.first("norm_hash").alias("norm_hash"),
                )
            )
        # idempotent commit: overwrite exactly the shard partitions in flight
        tf.write.mode("overwrite").partitionBy("shard").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(os.path.join(out_dir, "tf"))
        dt = time.time() - t0
        # per-shard metrics from the committed files (not the in-flight job)
        committed_dirs = [_shard_dir(out_dir, s) for s in batch if os.path.isdir(_shard_dir(out_dir, s))]
        if not committed_dirs:  # batch had no rows (tiny corpora): still mark done
            for s in batch:
                with open(_lineage_path(out_dir, s), "w") as fh:
                    json.dump({"shard": s, "batch_n_docs": 0, "batch_n_tokens": 0,
                               "batch_n_postings": 0, "wall_sec": round(dt, 3), "ts": time.time()}, fh)
            committed_batches += 1
            continue
        stats = (
            spark.read.parquet(*committed_dirs)
            .groupBy()
            .agg(
                F.countDistinct("url").alias("n_docs"),
                F.sum("tf").alias("n_tokens"),
                F.count("*").alias("n_postings"),
            )
            .collect()[0]
        )
        for s in batch:
            with open(_lineage_path(out_dir, s), "w") as fh:
                json.dump(
                    {
                        "shard": s,
                        "batch": [int(x) for x in batch],
                        "batch_n_docs": int(stats["n_docs"]),
                        "batch_n_tokens": int(stats["n_tokens"] or 0),
                        "batch_n_postings": int(stats["n_postings"]),
                        "wall_sec": round(dt, 3),
                        "ts": time.time(),
                    },
                    fh,
                )
        committed_batches += 1
        if fail_after_batches is not None and committed_batches >= fail_after_batches:
            raise ShardCommitError(f"injected failure after {committed_batches} batches")

    # ---------------------------------------------------------------- phase 2
    return finalize_index(
        spark, out_dir, block_size=block_size, bucket_span=bucket_span, params=params
    )


def finalize_index(
    spark: SparkSession,
    out_dir: str,
    tf_all: DataFrame | None = None,
    doc_map: DataFrame | None = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_span: int = DEFAULT_BUCKET_SPAN,
    params: BM25Params = BM25Params(),
    sink=None,
) -> IndexMeta:
    """Phase 2 (shared by resumable batch and streaming ingest): committed tf
    shards + doc_map → doc_stats, compressed postings, meta.json.

    ``tf_all`` defaults to ``{out_dir}/tf`` (columns shard, url, term, tf,
    doc_len, norm_hash); ``doc_map`` defaults to ``{out_dir}/doc_map``
    (url, lang, doc_id).  Idempotent: all writes are overwrite-mode.

    Final index tables go through ``sink`` (default parquet at ``out_dir``;
    see ``index.sinks`` for the Iceberg mapping).  The tf/doc_map STAGING
    area stays path-based parquet deliberately — it is the resumable
    checkpoint format (shard markers + atomic dirs), not a queryable table."""
    from ..dictionary import dictionary_fingerprint, get_custom_dictionary
    from .sinks import ParquetSink

    sink = sink or ParquetSink(out_dir)

    if tf_all is None:
        tf_all = spark.read.parquet(os.path.join(out_dir, "tf"))
    if doc_map is None:
        doc_map = spark.read.parquet(os.path.join(out_dir, "doc_map"))
    positional = "positions" in tf_all.columns
    terms_tf = tf_all.filter(F.col("term").isNotNull())
    per_doc = tf_all.select("url", "doc_len", "norm_hash").dropDuplicates(["url"])

    doc_stats = per_doc.join(doc_map, "url").select("doc_id", "url", "lang", "doc_len", "norm_hash")
    sink.write(doc_stats, "doc_stats")
    doc_stats = sink.read(spark, "doc_stats")

    g = doc_stats.agg(F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 1.0)

    from pyspark import StorageLevel

    tf_cols = ["doc_id", "term", "tf", "doc_len"] + (["positions"] if positional else [])
    with_ids = (
        terms_tf.join(doc_map.select("url", "doc_id"), "url")
        .select(*tf_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # AQE converts to broadcast at runtime when the vocabulary is small
    df_tbl = with_ids.groupBy("term").agg(F.count("*").alias("df"))
    posting_rows = with_ids.join(df_tbl, "term").withColumn(
        "bucket", (F.col("doc_id") / F.lit(bucket_span)).cast("long")
    )
    parts = spark.sparkContext.defaultParallelism
    postings = encode_postings(posting_rows, n_docs, avgdl, params, block_size, parts)
    sink.write(
        postings.repartition(parts, "term")
        .sortWithinPartitions("term", "bucket", "block_id"),
        "postings",
    )
    with_ids.unpersist()

    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        block_size=block_size,
        bucket_span=bucket_span,
        k1=params.k1,
        b=params.b,
        dictionary_fingerprint=dictionary_fingerprint(),
        custom_dictionary=get_custom_dictionary(),
        positional=positional,
    )
    pst = sink.read(spark, "postings")
    agg = pst.agg(F.countDistinct("term").alias("nt"), F.sum("n_docs").alias("np")).collect()[0]
    meta.n_terms, meta.n_postings = int(agg["nt"]), int(agg["np"])
    # adding/refreshing documents must NOT reset index settings (MeiliSearch
    # add-documents semantics, reference client.py:104-123): carry the live
    # settings surface (index/settings.py update_synonyms/update_stop_words)
    # forward from the previous meta.json
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = {}
        meta.synonyms = prev.get("synonyms", meta.synonyms)
        meta.synonyms_fingerprint = prev.get("synonyms_fingerprint", meta.synonyms_fingerprint)
        meta.stopwords = prev.get("stopwords", meta.stopwords)
        meta.stopwords_fingerprint = prev.get("stopwords_fingerprint", meta.stopwords_fingerprint)
        meta.stopwords_build = prev.get("stopwords_build", meta.stopwords_build)
        # the whole query-side settings surface rides along, not just
        # synonyms/stop-words: typoTolerance and the filterable/sortable
        # declarations are index settings too and must survive a delta
        # add_documents / re-finalize (MeiliSearch keeps settings across
        # document additions)
        meta.typo_tolerance = prev.get("typo_tolerance", meta.typo_tolerance)
        meta.filterable_attributes = prev.get(
            "filterable_attributes", meta.filterable_attributes
        )
        meta.sortable_attributes = prev.get(
            "sortable_attributes", meta.sortable_attributes
        )
        # the runtime custom-dictionary overlay survives a delta add too;
        # the finalize's dictionary_fingerprint (stamped above from the
        # live process) already reflects it when the caller applied it
        # via update_dictionary/reprocess_documents
        meta.custom_dictionary = sorted(
            set(prev.get("custom_dictionary", []))
            | set(meta.custom_dictionary or [])
        )
    with open(meta_path, "w") as fh:
        json.dump(asdict(meta), fh, indent=1)
    # fresh finalize = new document set; stale tombstones must not dangle
    from .maintenance import clear_tombstones

    clear_tombstones(out_dir)
    return meta
