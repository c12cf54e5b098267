"""Reference-format document ingest (SURVEY S1-S3).

The reference accepts MeiliSearch-style documents
``{id, title, content, thai_content?, metadata?}`` one-at-a-time or in
batches (src/meilisearch_integration/client.py:37-47 DocumentModel;
document_processor.py:154-172 requires ``id``; batch path
document_processor.py:261-343).  A reference user switching to this engine
points the same JSON corpora (``data/samples/*.json``) at
``read_documents_json`` / ``documents_to_pages`` and builds the index with
the standard builder — Spark partitions replace the reference's
asyncio.Semaphore batching.

Mapping onto the engine's pages contract:
  - ``url``  ← ``id``  (the primary key; prefixed to stay a valid url-ish key)
  - ``text`` ← title + "\n" + content  (the searchableAttributes order
    [title, content], settings_manager.py:72-76; both fields feed the index)
  - ``lang`` ← detected from Thai character ratio (P1 semantics)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),  # nullable: validation rejects, not the schema
        T.StructField("title", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("thai_content", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def read_documents_json(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """S3: load a reference sample corpus (JSON array or JSON-lines).

    Validation parity: rows without ``id`` are rejected the way
    document_processor.py:162-163 raises — surfaced as a filtered count the
    caller can assert on rather than a per-row exception.
    """
    reader = spark.read.schema(DOC_SCHEMA)
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def documents_from_list(spark: SparkSession, docs: list[dict]) -> DataFrame:
    """S1/S2: in-memory batch ingest (API-endpoint shape)."""
    rows = []
    for d in docs:
        meta = d.get("metadata") or {}
        rows.append(
            (
                str(d["id"]) if d.get("id") is not None else None,
                d.get("title"),
                d.get("content"),
                d.get("thai_content"),
                {str(k): json.dumps(v) if not isinstance(v, str) else v for k, v in meta.items()},
            )
        )
    return spark.createDataFrame(rows, DOC_SCHEMA)


def validate_documents(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split (valid, rejected): ``id`` present and non-empty — the only hard
    requirement the reference enforces (document_processor.py:162-172)."""
    ok = docs.filter(F.col("id").isNotNull() & (F.length("id") > 0))
    bad = docs.filter(F.col("id").isNull() | (F.length("id") == 0))
    return ok, bad


def documents_to_pages(docs: DataFrame, id_prefix: str = "doc://") -> DataFrame:
    """Map validated reference documents onto the engine's pages contract.

    Thai detection (P1, document_processor.py:72-112) as pure Column
    expressions: lang = th / th-en / en by Thai-character ratio over letters.
    """
    text = F.concat_ws(
        "\n", F.coalesce(F.col("title"), F.lit("")), F.coalesce(F.col("content"), F.lit(""))
    )
    thai_chars = F.length(F.regexp_replace(text, r"[^฀-๿]", ""))
    latin_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    letters = thai_chars + latin_chars
    lang = (
        F.when(letters == 0, F.lit("unknown"))
        .when(thai_chars / letters > 0.7, F.lit("th"))
        .when(thai_chars / letters > 0.1, F.lit("th-en"))
        .otherwise(F.lit("en"))
    )
    return docs.select(
        F.concat(F.lit(id_prefix), F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        text.cast("binary").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def ingest_and_index(
    spark: SparkSession, docs: DataFrame, out_dir: str, **build_kwargs
) -> tuple[object, int]:
    """End-to-end S1→S4: validate, map, build.  Returns (IndexMeta, n_rejected)."""
    from ..index.builder import build_index

    ok, bad = validate_documents(docs)
    n_bad = bad.count()
    meta = build_index(spark, documents_to_pages(ok), out_dir, **build_kwargs)
    return meta, n_bad
