"""Training-sequence packing and RAG chunking for LLM data pipelines.

Pretraining consumes fixed-length token sequences, not documents: the corpus
is concatenated in a deterministic order and cut every ``seq_len`` tokens
("concat-and-chunk", the scheme used by GPT/LLaMA-style pipelines).  A naive
implementation needs a GLOBAL running token offset — a single-partition
window sort that dies at 100 TB.  These operators make the packing
shard-local instead: documents are assigned to ``n_shards`` deterministic
md5 shards (same keyspace trick as sampling.py), each shard concatenates its
own documents in doc-key order and cuts its own sequence stream.  Training
order across shards is arbitrary anyway (loaders shuffle sequences), so
shard-local packing loses nothing while making every window
``partitionBy(shard)`` — fully parallel, no global sort, no driver state.
At 100 TB you raise ``n_shards`` to ~#cores×4 and each shard's window fits
one task.

Token counts use the exact split-on-space / drop-empty convention of
textstats.token_stats so every operator in the repo agrees on "token".

``chunk_documents`` is the per-document dual (RAG / embedding prep): fixed
token windows WITH overlap, document-local, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meilisearch_thai_spark.pipeline.textstats import ws_tokens


def _toks(text_col: str) -> Column:
    """Non-empty split-on-space tokens — the repo-wide convention, defined
    once in textstats.ws_tokens."""
    return ws_tokens(F.col(text_col))


def _shard_expr(id_col: str, n_shards: int, seed: str) -> Column:
    """Deterministic shard in [0, n_shards): first 32 md5 bits of
    ``seed|id`` mod n_shards (engine-neutral; DuckDB twin below)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % n_shards


def pack_assignments(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int = 8,
    seed: str = "pack",
) -> DataFrame:
    """Per-document packing map: (doc_key, shard, n_tokens, offset,
    first_seq, last_seq).

    ``tok_offset`` is the document's starting token position in its shard's
    concatenated stream (docs ordered by key within the shard); the document
    occupies sequences ``first_seq..last_seq`` of that shard.  Empty
    documents (0 tokens) are dropped — they contribute nothing to any
    sequence.  One hash shuffle on ``shard``; window is shard-local.

    Keys need not be unique: the window orders by (doc_key, n_tokens), so
    duplicate keys with different lengths still get deterministic offsets,
    and exact-duplicate rows are interchangeable (either order yields the
    same multiset of assignments).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql.window import Window

    base = docs.select(
        F.col(id_col).alias("doc_key"),
        _shard_expr(id_col, n_shards, seed).alias("shard"),
        F.size(_toks(text_col)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_key", "n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    withoff = base.withColumn("tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return withoff.select(
        "doc_key",
        "shard",
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset DIV {seq_len}").alias("first_seq"),
        F.expr(f"(tok_offset + n_tokens - 1) DIV {seq_len}").alias("last_seq"),
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int = 8,
    seed: str = "pack",
) -> DataFrame:
    """Per-sequence packing stats: (shard, seq, n_docs, n_tokens).

    ``n_docs`` is how many documents contribute at least one token to the
    sequence, ``n_tokens`` how many of the sequence's ``seq_len`` slots are
    filled (== seq_len for every sequence except each shard's last).  The
    doc→sequence explode is a narrow op on top of :func:`pack_assignments`;
    the final groupBy keys on (shard, seq), which inherits the shard
    hash-partitioning, and partial aggregation makes it map-heavy.
    """
    a = pack_assignments(docs, id_col, text_col, seq_len, n_shards, seed)
    exploded = a.select(
        "shard",
        "n_tokens",
        "tok_offset",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq"),
    )
    L = F.lit(seq_len).cast("long")
    contrib = F.least((F.col("seq") + 1) * L, F.col("tok_offset") + F.col("n_tokens")) - F.greatest(
        F.col("seq") * L, F.col("tok_offset")
    )
    return (
        exploded.withColumn("tok_in_seq", contrib)
        .groupBy("shard", "seq")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok_in_seq").alias("n_tokens"),
        )
    )


def _pack_cte(
    table: str, id_col: str, text_col: str, seq_len: int, n_shards: int, seed: str
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_key,
         ('0x' || substr(md5('{seed}' || '|' || CAST({id_col} AS VARCHAR)), 1, 8))::UBIGINT::BIGINT
           % {n_shards} AS shard,
         len(list_filter(string_split({text_col}, ' '), x -> x <> ''))::BIGINT AS n_tokens
  FROM {table}
),
nonempty AS (SELECT * FROM toks WHERE n_tokens > 0),
offs AS (
  SELECT doc_key, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_key, n_tokens
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_offset
  FROM nonempty
),
assigned AS (
  SELECT doc_key, shard, n_tokens, tok_offset,
         (tok_offset // {seq_len})::BIGINT AS first_seq,
         ((tok_offset + n_tokens - 1) // {seq_len})::BIGINT AS last_seq
  FROM offs
)"""


def pack_assignments_sql(
    table: str,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int = 8,
    seed: str = "pack",
) -> str:
    """DuckDB twin of :func:`pack_assignments`."""
    cte = _pack_cte(table, id_col, text_col, seq_len, n_shards, seed)
    return f"""{cte}
SELECT doc_key, shard, n_tokens, tok_offset, first_seq, last_seq FROM assigned
"""


def pack_sequences_sql(
    table: str,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int = 8,
    seed: str = "pack",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    cte = _pack_cte(table, id_col, text_col, seq_len, n_shards, seed)
    return f"""{cte},
exploded AS (
  SELECT shard, n_tokens, tok_offset,
         unnest(generate_series(first_seq, last_seq)) AS seq
  FROM assigned
)
SELECT shard, seq,
       COUNT(*)::BIGINT AS n_docs,
       SUM(LEAST((seq + 1) * {seq_len}, tok_offset + n_tokens)
           - GREATEST(seq * {seq_len}, "tok_offset"))::BIGINT AS n_tokens
FROM exploded
GROUP BY shard, seq
"""


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_len: int,
    overlap: int = 0,
) -> DataFrame:
    """Sliding token windows per document (RAG/embedding prep):
    (doc_key, chunk_id, n_tokens, chunk_text).

    Chunk k covers tokens [k·stride, k·stride+chunk_len) with
    stride = chunk_len − overlap; the final chunk may be shorter.  Documents
    with 0 tokens produce no chunks.  Document-local and expressed entirely
    in array Columns — zero shuffle, scales linearly with corpus bytes.
    """
    if chunk_len <= 0:
        raise ValueError(f"chunk_len must be positive, got {chunk_len}")
    if not 0 <= overlap < chunk_len:
        raise ValueError(f"overlap must be in [0, chunk_len), got {overlap}")
    stride = chunk_len - overlap
    toks = _toks(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_key"), toks.alias("toks"), F.size(toks).cast("long").alias("n")
    ).filter(F.col("n") > 0)
    n_chunks = F.lit(1) + F.expr(
        f"(greatest(n - {chunk_len}, 0L) + {stride} - 1) DIV {stride}"
    )
    ch = base.select(
        "doc_key",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride  # 0-based token start
    length = F.least(F.lit(chunk_len).cast("long"), F.col("n") - start)
    return ch.select(
        "doc_key",
        "chunk_id",
        length.alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), (start + 1).cast("int"), length.cast("int")), " "
        ).alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str, id_col: str, text_col: str, chunk_len: int, overlap: int = 0
) -> str:
    """DuckDB twin of :func:`chunk_documents` (list slicing is 1-based
    inclusive in DuckDB, hence the ``start+1 .. start+len`` bounds)."""
    stride = chunk_len - overlap
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_key,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS toks
  FROM {table}
),
sized AS (
  SELECT doc_key, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0
),
ch AS (
  SELECT doc_key, toks, n,
         unnest(generate_series(0, (GREATEST(n - {chunk_len}, 0) + {stride} - 1) // {stride})) AS chunk_id
  FROM sized
)
SELECT doc_key, chunk_id,
       LEAST({chunk_len}, n - chunk_id * {stride})::BIGINT AS n_tokens,
       array_to_string(
         toks[(chunk_id * {stride} + 1)::INT :
              (chunk_id * {stride} + LEAST({chunk_len}, n - chunk_id * {stride}))::INT],
         ' ') AS chunk_text
FROM ch
"""
