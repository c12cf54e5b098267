"""Structured Streaming incremental ingest → resumable index shards.

The reference is batch-only (SURVEY §2.9): its "batch" endpoints are request
batching, not streams.  This module goes beyond it with the natural Spark
extension: a file-source stream over arriving page dumps feeds the SAME
tf-shard layout the resumable batch build uses (lineage.py phase 1), and the
shared ``finalize_index`` turns accumulated shards into the queryable index.

Design points:

- **foreachBatch, not a streaming sink**: each micro-batch tokenizes its
  pages (the fused Arrow pass), writes tf rows partitioned by url-hash shard
  (idempotent dynamic-partition overwrite per batch would clobber other
  batches' rows in the same shard, so rows carry ``batch_id`` and land in
  shard+batch partitions — replays of a batch overwrite exactly their own
  partition, which is what makes the stream checkpoint-resumable), and
  appends a lineage record with counts.
- **Re-crawl semantics**: the same url arriving again replaces its older
  tokenization at finalize time (keep max ``batch_id`` per url) — matching
  the reference's overwrite-by-primary-key indexing
  (src/meilisearch_integration/client.py:104-123, primary_key="id").
- **doc ids stay deterministic**: assigned at finalize from the sorted url
  set, so a streamed index equals the batch-built index over the same corpus
  byte-for-byte (tested in tests/test_streaming_ingest.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import DEFAULT_BLOCK_SIZE, DEFAULT_BUCKET_SPAN, BM25Params, IndexMeta
from ..index.lineage import finalize_index
from ..sources.pages import PAGES_SCHEMA

N_SHARDS_DEFAULT = 8


def _tf_rows(
    pages: DataFrame, n_shards: int, batch_id: int, positional: bool = False
) -> DataFrame:
    """pages → (shard, batch_id, url, term, tf, doc_len, norm_hash[,
    positions]) rows via the fused tokenize pass (terms pre-aggregated per
    doc, no shuffle)."""
    from ..tokenizer.udfs import index_features_udf_with_dictionary

    shard = F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards)).cast("int")
    feat = (
        pages.select("url", "text", "lang")
        .withColumn("_f", index_features_udf_with_dictionary()("text"))
        .select(
            shard.alias("shard"),
            F.lit(batch_id).alias("batch_id"),
            "url",
            "lang",
            F.col("_f.terms").alias("terms"),
            F.col("_f.norm_hash").alias("norm_hash"),
        )
        .withColumn("doc_len", F.size("terms"))
    )
    base = ["shard", "batch_id", "url", "lang", "doc_len", "norm_hash"]
    aggs = [
        F.count("*").alias("tf"),
        F.first("doc_len").alias("doc_len"),
        F.first("norm_hash").alias("norm_hash"),
        F.first("lang").alias("lang"),
    ]
    if positional:
        ex = feat.select(*base, F.posexplode_outer("terms").alias("pos", "term"))
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    else:
        ex = feat.select(*base, F.explode_outer("terms").alias("term"))
    return ex.groupBy("shard", "batch_id", "url", "term").agg(*aggs)


def _commit_pages_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    n_shards: int,
    positional: bool,
    kind: str = "stream",
) -> None:
    """Tokenize one batch of pages into shard+batch tf partitions + lineage.

    Shared by the streaming foreachBatch sink and the batch
    :func:`add_documents` API — both commit the identical layout, so a
    stream and ad-hoc additions can interleave on the same staging area."""
    t0 = time.time()
    # WITHIN-batch re-crawls: keep one row per url (latest warc_ts,
    # content-hash tie-break) BEFORE tokenization — otherwise the
    # groupBy(url, term) below would sum tf across the duplicate rows
    # and corrupt doc_len/BM25 stats.  Cross-batch re-crawls are handled
    # by latest-batch-wins at finalize; this makes the rule uniform:
    # last crawl of a url wins at every granularity.
    batch_df = (
        batch_df.groupBy("url")
        .agg(
            F.max_by(
                F.struct("warc_ts", "html", "text", "lang"),
                F.struct(F.col("warc_ts"), F.xxhash64("text")),
            ).alias("_r")
        )
        .select("url", "_r.*")
    )
    tf = _tf_rows(batch_df, n_shards, batch_id, positional=positional)
    (
        tf.write.mode("overwrite")
        .partitionBy("shard", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(out_dir, "tf"))
    )
    stats = (
        spark.read.parquet(os.path.join(out_dir, "tf"))
        .filter(F.col("batch_id") == batch_id)
        .agg(
            F.countDistinct("url").alias("n_docs"),
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_postings"),
        )
        .collect()[0]
    )
    with open(os.path.join(out_dir, "lineage", f"{kind}-batch-{batch_id}.json"), "w") as fh:
        json.dump(
            {
                "batch_id": int(batch_id),
                "batch_n_docs": int(stats["n_docs"] or 0),
                "batch_n_tokens": int(stats["n_tokens"] or 0),
                "batch_n_postings": int(stats["n_postings"] or 0),
                "wall_sec": round(time.time() - t0, 3),
                "ts": time.time(),
            },
            fh,
        )


def start_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    n_shards: int = N_SHARDS_DEFAULT,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    positional: bool = False,
    transform=None,
):
    """Stream parquet page dumps from ``input_dir`` into tf shards.

    ``available_now=True`` drains everything currently present and stops (the
    test/batch-catchup mode); ``False`` keeps running for continuous ingest.
    The stream checkpoint (offsets) + per-batch idempotent partition writes
    give end-to-end exactly-once into the shard layout.

    ``transform`` is an optional pages→pages DataFrame function applied to
    each micro-batch BEFORE staging — the seam for crawl hygiene on a live
    stream (e.g. ``lambda df: webtext.clean_corpus(df, "url", "text")``, or
    a gopher-gate filter).  It runs inside foreachBatch, so cross-document
    stages like boilerplate line-df see the micro-batch as their corpus
    (per-batch df thresholds; the batch is the hygiene window — document the
    min_df accordingly).  Rows it drops are simply never staged.
    """
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        _commit_pages_batch(spark, batch_df, int(batch_id), out_dir, n_shards, positional)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# adhoc (batch add_documents) commits use a disjoint high batch-id range so
# a stream checkpoint resuming later can never clobber an adhoc partition,
# and uniform latest-batch-wins makes an explicit API add take precedence
# over any earlier OR later stream crawl of the same url
ADHOC_BATCH_BASE = 1_000_000_000


def _next_adhoc_batch_id(out_dir: str) -> int:
    ldir = os.path.join(out_dir, "lineage")
    last = ADHOC_BATCH_BASE - 1
    if os.path.isdir(ldir):
        for fn in os.listdir(ldir):
            if fn.startswith("adhoc-batch-") and fn.endswith(".json"):
                last = max(last, int(fn[len("adhoc-batch-") : -len(".json")]))
    return last + 1


# staged-deletion registry: tombstones cover the QUERYABLE index, but the tf
# STAGING rows of a deleted url would silently resurrect it at the next
# finalize.  delete_docs pins each deletion here with the batch watermarks
# current at delete time; finalize excludes the url's rows from batches at
# or below those watermarks, so a LATER re-add (stream re-crawl or explicit
# add_documents — both get higher batch ids) legitimately resurrects the url
# while everything staged before the delete stays dead.  ONE entry per url
# (repeat deletes keep the max watermarks, which subsume the older pins), so
# the file is O(distinct deleted urls), rewritten atomically.  Entries must
# outlive finalize/compact_index — the staged tf batches they mask stay on
# disk and are re-read by every later finalize.
DELETED_REGISTRY = os.path.join("lineage", "deleted.json")


def _batch_watermarks(out_dir: str) -> tuple[int, int]:
    """(max committed stream batch id, max committed adhoc batch id);
    (-1, ADHOC_BATCH_BASE - 1) when none — from the lineage file names, so
    it is O(#batches) directory listing, no Spark job."""
    ldir = os.path.join(out_dir, "lineage")
    sw, aw = -1, ADHOC_BATCH_BASE - 1
    if os.path.isdir(ldir):
        for fn in os.listdir(ldir):
            if fn.startswith("stream-batch-") and fn.endswith(".json"):
                sw = max(sw, int(fn[len("stream-batch-") : -len(".json")]))
            elif fn.startswith("adhoc-batch-") and fn.endswith(".json"):
                aw = max(aw, int(fn[len("adhoc-batch-") : -len(".json")]))
    return sw, aw


def _load_deleted_registry(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, DELETED_REGISTRY)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)


def record_staged_deletions(
    out_dir: str, urls: list[str], watermarks: tuple[int, int] | None = None
) -> None:
    """Pin deletions into the staging layer (called by ``delete_docs`` when
    the index has a tf staging area).  One entry per url: a repeat delete
    raises that url's watermarks (later deletes always see >= watermarks, so
    the max subsumes every earlier pin).  ``watermarks`` lets the caller pass
    the ``_batch_watermarks`` it already computed instead of re-listing the
    lineage dir.  Single-writer contract, same as every other mutation on the
    directory; the rewrite is atomic (tmp + replace)."""
    if not urls:
        return
    sw, aw = watermarks if watermarks is not None else _batch_watermarks(out_dir)
    best: dict[str, tuple[int, int]] = {
        r["url"]: (int(r["stream_wm"]), int(r["adhoc_wm"]))
        for r in _load_deleted_registry(out_dir)
    }
    for u in set(urls):
        prev = best.get(u)
        best[u] = (max(prev[0], sw), max(prev[1], aw)) if prev else (sw, aw)
    reg = [
        {"url": u, "stream_wm": s, "adhoc_wm": a}
        for u, (s, a) in sorted(best.items())
    ]
    path = os.path.join(out_dir, DELETED_REGISTRY)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(reg, fh)
    os.replace(tmp, path)


def _resolve_layout(
    out_dir: str,
    block_size: int | None,
    bucket_span: int | None,
    params: BM25Params | None,
) -> tuple[int, int, BM25Params]:
    """Resolve the index layout + BM25 constants: explicit arguments win,
    otherwise the EXISTING index's meta.json values, otherwise the defaults.
    Shared by :func:`add_documents` and :func:`finalize_streamed_index` so no
    re-finalize path can silently reset the layout or scoring constants of an
    index that was bootstrapped with non-default values."""
    prev_meta: dict = {}
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            prev_meta = json.load(fh)
    if block_size is None:
        block_size = int(prev_meta.get("block_size", DEFAULT_BLOCK_SIZE))
    if bucket_span is None:
        bucket_span = int(prev_meta.get("bucket_span", DEFAULT_BUCKET_SPAN))
    if params is None:
        params = BM25Params(
            k1=float(prev_meta.get("k1", BM25Params().k1)),
            b=float(prev_meta.get("b", BM25Params().b)),
        )
    return block_size, bucket_span, params


def add_documents(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_shards: int = N_SHARDS_DEFAULT,
    positional: bool | None = None,
    finalize: bool = True,
    block_size: int | None = None,
    bucket_span: int | None = None,
    params: BM25Params | None = None,
) -> IndexMeta | None:
    """Incrementally add (or overwrite) documents in a shard-staged index —
    the reference's add/update-documents semantics
    (src/meilisearch_integration/client.py:104-123: index by primary key,
    re-adding a key overwrites the document).

    Only the NEW pages are tokenized (the expensive phase); the existing
    corpus's tf shards are reused as-is, and the shared finalize re-encodes
    postings over the union with uniform latest-batch-wins per url.  Doc ids
    stay deterministic (assigned from the sorted surviving url set), so the
    result is byte-identical to a fresh build over the merged corpus.

    On an EMPTY ``out_dir`` this is the initial build (batch staging created
    here) — the same call shape covers bootstrap and every later delta.
    ``finalize=False`` stages the tokenization only (cheap trickle adds);
    run :func:`finalize_streamed_index` when the batch of batches is in.

    Single-writer contract: do not run concurrently with a live ingest
    stream or another add on the same directory.  Adhoc batches take a
    disjoint id range above any stream batch id, so an explicit API add of
    a url permanently outranks stream crawls of that url (intended: a
    manual correction should not be silently undone by the next crawl);
    delete the url first to hand it back to the stream.

    ``block_size``/``bucket_span``/``params`` default to the EXISTING index's
    values (meta.json) so a delta add never silently changes the layout or
    BM25 constants; pass them explicitly only to override.

    Returns the new :class:`IndexMeta` (or None with ``finalize=False``)."""
    tf_dir = os.path.join(out_dir, "tf")
    meta_path = os.path.join(out_dir, "meta.json")
    if not os.path.isdir(tf_dir) and os.path.exists(meta_path):
        raise ValueError(
            "this index has meta.json but no tf/ staging area — it was built "
            "with build_index, whose layout is not incrementally updatable; "
            "add_documents here would rebuild the index from ONLY the new "
            "pages and drop every existing document. Rebuild over the merged "
            "corpus with build_index, or bootstrap a staged index by running "
            "add_documents into a fresh directory"
        )
    block_size, bucket_span, params = _resolve_layout(
        out_dir, block_size, bucket_span, params
    )
    if os.path.isdir(tf_dir):
        existing = spark.read.parquet(tf_dir)
        if "batch_id" not in existing.columns:
            raise ValueError(
                "add_documents needs the batched staging layout "
                "(streaming ingest / add_documents builds); this index's tf "
                "shards are from build_index_resumable — rebuild with "
                "add_documents or migrate the shards with a batch_id=0 rewrite"
            )
        if positional is None:
            positional = "positions" in existing.columns
        elif positional != ("positions" in existing.columns):
            raise ValueError("positional flag must match the existing staging layout")
    elif positional is None:
        positional = False
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    batch_id = _next_adhoc_batch_id(out_dir)
    _commit_pages_batch(spark, pages, batch_id, out_dir, n_shards, positional, kind="adhoc")
    if not finalize:
        return None
    return finalize_streamed_index(
        spark, out_dir, block_size=block_size, bucket_span=bucket_span, params=params
    )


def _surviving_tf(spark: SparkSession, out_dir: str) -> DataFrame:
    """The staged index's CURRENT document rows: tf shards minus
    registry-deleted urls, latest-batch-wins per url (``batch_id`` dropped).
    The single definition of "what the index holds right now", shared by
    :func:`finalize_streamed_index` and :func:`update_documents`."""
    tf = spark.read.parquet(os.path.join(out_dir, "tf"))
    # staged-deletion registry: drop each deleted url's rows from batches at
    # or below the watermarks recorded when it was deleted — batches
    # committed AFTER the delete (higher id in their range) resurrect the
    # url, matching MeiliSearch re-add semantics. Registry is tiny
    # (O(deletes)) → broadcast; partition pruning on batch_id is unaffected.
    reg = _load_deleted_registry(out_dir)
    if reg:
        reg_df = (
            spark.createDataFrame(
                [(r["url"], int(r["stream_wm"]), int(r["adhoc_wm"])) for r in reg],
                "url string, stream_wm long, adhoc_wm long",
            )
            .groupBy("url")
            .agg(F.max("stream_wm").alias("stream_wm"), F.max("adhoc_wm").alias("adhoc_wm"))
        )
        tf = (
            tf.join(F.broadcast(reg_df), "url", "left")
            .filter(
                F.col("stream_wm").isNull()
                | (
                    (F.col("batch_id") < ADHOC_BATCH_BASE)
                    & (F.col("batch_id") > F.col("stream_wm"))
                )
                | (
                    (F.col("batch_id") >= ADHOC_BATCH_BASE)
                    & (F.col("batch_id") > F.col("adhoc_wm"))
                )
            )
            .drop("stream_wm", "adhoc_wm")
        )
    latest = tf.groupBy("url").agg(F.max("batch_id").alias("batch_id"))
    return tf.join(latest, ["url", "batch_id"]).drop("batch_id")


def update_documents(
    spark: SparkSession,
    partial_docs: DataFrame,
    out_dir: str,
    n_shards: int = N_SHARDS_DEFAULT,
    finalize: bool = True,
) -> IndexMeta | None:
    """Partial document updates — MeiliSearch's update-documents semantics
    (reference src/meilisearch_integration/client.py:214-249
    ``update_documents`` → update-by-primary-key, which MERGES the supplied
    fields into the stored document; unsupplied fields keep their current
    values).  Contrast :func:`add_documents`, which REPLACES the whole
    document (reference client.py:177 add-or-replace).

    ``partial_docs`` must carry ``url`` (the primary key; unique per call)
    and any subset of the page fields (``text``, ``lang``, ``warc_ts``,
    ``html``).  An absent column — or a NULL value in a present one — means
    "keep the stored value".

    Retokenization happens ONLY for documents whose searchable ``text`` is
    supplied: metadata-only updates re-stage the url's existing term rows
    (one broadcast-joined copy into the new batch partition, zero tokenizer
    work), so a 100 TB index can re-tag language/metadata for a slice of
    documents without re-segmenting them.  A url not in the index is an
    insert with the supplied fields (MeiliSearch creates the document;
    missing ``text`` indexes as empty).

    Same single-writer contract, adhoc batch-id range, and lineage records
    as :func:`add_documents`; the lineage record additionally carries
    ``n_retokenized`` / ``n_metadata_only``.  Returns the new
    :class:`IndexMeta` (or ``None`` with ``finalize=False``)."""
    tf_dir = os.path.join(out_dir, "tf")
    if not os.path.isdir(tf_dir):
        raise ValueError(
            "update_documents needs an existing staged index (add_documents "
            "layout); bootstrap with add_documents first"
        )
    if "url" not in partial_docs.columns:
        raise ValueError("partial_docs must carry the primary key column 'url'")
    existing = spark.read.parquet(tf_dir)
    if "batch_id" not in existing.columns:
        raise ValueError(
            "update_documents needs the batched staging layout "
            "(streaming ingest / add_documents builds)"
        )
    positional = "positions" in existing.columns
    # normalize the partial frame to the full page column set (absent column
    # == all-NULL column: one merge rule for both spellings)
    p = partial_docs
    for c, t in (("warc_ts", "timestamp"), ("html", "binary"), ("text", "string"), ("lang", "string")):
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None).cast(t))
    p = p.select("url", "warc_ts", "html", "text", "lang")
    tf_cur = _surviving_tf(spark, out_dir)
    # existence is a LITERAL flag, never inferred from a stored column's
    # nullability: a document whose stored lang is NULL is still an existing
    # document (inferring from _cur_lang would misroute its metadata-only
    # update into the retokenize path with text='' and wipe its postings)
    cur_lang = (
        tf_cur.select("url", F.col("lang").alias("_cur_lang"))
        .dropDuplicates(["url"])
        .withColumn("_exists", F.lit(True))
    )
    pj = p.join(cur_lang, "url", "left").select(
        "url",
        "warc_ts",
        "html",
        "text",
        F.coalesce("lang", "_cur_lang").alias("lang"),
        F.coalesce("_exists", F.lit(False)).alias("_exists"),
    ).persist()
    # one aggregate answers size, dup-check, and the retok/meta split (the
    # partial frame is caller-supplied: evaluate its lineage ONCE)
    agg0 = pj.agg(
        F.count("*").alias("n"),
        F.countDistinct("url").alias("nu"),
        F.sum(
            (F.col("text").isNull() & F.col("_exists")).cast("long")
        ).alias("n_meta"),
    ).collect()[0]
    n_updates, n_meta = int(agg0["n"]), int(agg0["n_meta"] or 0)
    n_retok = n_updates - n_meta
    if int(agg0["nu"]) != n_updates:
        pj.unpersist()
        raise ValueError(
            "partial_docs has duplicate urls — DataFrames are unordered, so "
            "last-writer-wins within one call is undefined; merge duplicates "
            "before calling (one row per url)"
        )
    batch_id = _next_adhoc_batch_id(out_dir)
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    shard = F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards)).cast("int")

    # metadata-only updates of EXISTING docs: re-stage the current term rows
    # under the new batch id with the merged metadata — no tokenizer work
    meta_only = pj.filter(F.col("text").isNull() & F.col("_exists")).select(
        "url", F.col("lang").alias("_new_lang")
    )
    reuse_cols = ["url", "term", "tf", "doc_len", "norm_hash"] + (
        ["positions"] if positional else []
    )
    reused = (
        tf_cur.join(F.broadcast(meta_only), "url")
        .select(
            shard.alias("shard"),
            F.lit(batch_id).alias("batch_id"),
            *[F.col(c) for c in reuse_cols],
            F.col("_new_lang").alias("lang"),
        )
    )
    # supplied-text updates and inserts of new urls: the normal tokenize path
    retok_pages = pj.filter(F.col("text").isNotNull() | ~F.col("_exists")).select(
        "url", "warc_ts", "html", F.coalesce("text", F.lit("")).alias("text"), "lang"
    )
    t0 = time.time()
    new_tf = reused if n_retok == 0 else reused.unionByName(
        _tf_rows(retok_pages, n_shards, batch_id, positional=positional)
    )
    (
        new_tf.write.mode("overwrite")
        .partitionBy("shard", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(tf_dir)
    )
    pj.unpersist()
    stats = (
        spark.read.parquet(tf_dir)
        .filter(F.col("batch_id") == batch_id)
        .agg(
            F.countDistinct("url").alias("n_docs"),
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_postings"),
        )
        .collect()[0]
    )
    with open(os.path.join(out_dir, "lineage", f"adhoc-batch-{batch_id}.json"), "w") as fh:
        json.dump(
            {
                "batch_id": int(batch_id),
                "kind": "update",
                "batch_n_docs": int(stats["n_docs"] or 0),
                "batch_n_tokens": int(stats["n_tokens"] or 0),
                "batch_n_postings": int(stats["n_postings"] or 0),
                "n_retokenized": int(n_retok),
                "n_metadata_only": int(n_meta),
                "wall_sec": round(time.time() - t0, 3),
                "ts": time.time(),
            },
            fh,
        )
    if not finalize:
        return None
    return finalize_streamed_index(spark, out_dir)


def finalize_streamed_index(
    spark: SparkSession,
    out_dir: str,
    block_size: int | None = None,
    bucket_span: int | None = None,
    params: BM25Params | None = None,
) -> IndexMeta:
    """Turn accumulated stream shards into the queryable index.

    Re-crawl dedup: keep each url's rows from its LATEST batch only, then
    assign deterministic doc ids from the surviving url set and run the
    shared phase-2 finalize.  Safe to re-run any time (all writes overwrite);
    the stream can keep appending and a later finalize picks up the new docs.

    ``block_size``/``bucket_span``/``params`` default to the EXISTING index's
    meta.json values (same contract as :func:`add_documents`), so the
    documented trickle flow — ``add_documents(..., finalize=False)`` then
    ``finalize_streamed_index`` — can never silently reset a non-default
    layout or BM25 constants; pass them explicitly only to override.
    """
    from ..index.builder import url_doc_id_map

    block_size, bucket_span, params = _resolve_layout(
        out_dir, block_size, bucket_span, params
    )

    tf_latest = _surviving_tf(spark, out_dir)

    caches: list[DataFrame] = []
    urls = tf_latest.select("url", "lang").dropDuplicates(["url"])
    doc_map = url_doc_id_map(urls, _caches=caches).join(urls, "url")
    doc_map.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_map"))
    for c in caches:
        c.unpersist()
    meta = finalize_index(
        spark, out_dir, tf_all=tf_latest, block_size=block_size, bucket_span=bucket_span, params=params
    )
    return meta
