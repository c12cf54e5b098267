"""Sequence packing + chunking: cross-engine parity, packing invariants,
and degenerate inputs.

The packing analogue in training pipelines has no reference counterpart
(the reference is a search proxy); semantics follow the standard
concat-and-chunk scheme, made shard-local for scale (pipeline/packing.py
module docstring)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.pipeline.packing import (
    chunk_documents,
    chunk_documents_sql,
    pack_assignments,
    pack_assignments_sql,
    pack_sequences,
    pack_sequences_sql,
)

SEQ_LEN = 256
SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return c


def _assert_frames_equal(sdf, con, sql, keys):
    a = sdf.toPandas().sort_values(keys).reset_index(drop=True)
    b = con.execute(sql).df().sort_values(keys).reset_index(drop=True)
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    assert a.shape == b.shape
    assert (a.astype(str).values == b.astype(str).values).all()


def test_pack_assignments_duckdb_parity(docs, con):
    _assert_frames_equal(
        pack_assignments(docs, "doc_id", "text", SEQ_LEN, SHARDS),
        con,
        pack_assignments_sql("documents", "doc_id", "text", SEQ_LEN, SHARDS),
        ["doc_key"],
    )


def test_pack_sequences_duckdb_parity(docs, con):
    _assert_frames_equal(
        pack_sequences(docs, "doc_id", "text", SEQ_LEN, SHARDS),
        con,
        pack_sequences_sql("documents", "doc_id", "text", SEQ_LEN, SHARDS),
        ["shard", "seq"],
    )


def test_every_nonfinal_sequence_is_full(docs):
    s = pack_sequences(docs, "doc_id", "text", SEQ_LEN, SHARDS).toPandas()
    last = s.groupby("shard")["seq"].transform("max")
    nonfinal = s[s["seq"] < last]
    assert (nonfinal["n_tokens"] == SEQ_LEN).all()
    # sequence ids are dense 0..max per shard
    per = s.groupby("shard")["seq"]
    assert (per.min() == 0).all()
    assert (per.max() + 1 == per.count()).all()


def test_packing_conserves_tokens(docs):
    a = pack_assignments(docs, "doc_id", "text", SEQ_LEN, SHARDS).toPandas()
    s = pack_sequences(docs, "doc_id", "text", SEQ_LEN, SHARDS).toPandas()
    assert a["n_tokens"].sum() == s["n_tokens"].sum()
    # offsets tile each shard's stream exactly: next offset = prev offset + n
    for _, g in a.sort_values(["shard", "doc_key", "n_tokens"]).groupby("shard"):
        expected = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["tok_offset"].values == expected.values).all()


def test_packing_is_parallelism_invariant(spark, docs):
    base = {
        (r["shard"], r["seq"]): (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(docs, "doc_id", "text", SEQ_LEN, SHARDS).collect()
    }
    re = {
        (r["shard"], r["seq"]): (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(
            docs.repartition(17), "doc_id", "text", SEQ_LEN, SHARDS
        ).collect()
    }
    assert base == re


def test_empty_docs_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, "d")], ["doc_id", "text"]
    )
    a = pack_assignments(df, "doc_id", "text", 4, 1)
    rows = {r["doc_key"]: r for r in a.collect()}
    assert set(rows) == {1, 4}
    with pytest.raises(ValueError):
        pack_assignments(df, "doc_id", "text", 0, 1)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "text", 4, 0)


def test_duplicate_keys_get_deterministic_offsets(spark):
    # same key, different lengths: (doc_key, n_tokens) tie-break pins the
    # order, so offsets are a deterministic multiset
    df = spark.createDataFrame(
        [(1, "a b c d e"), (1, "x y"), (2, "p q r")], ["doc_id", "text"]
    )
    got = sorted(
        (r["doc_key"], r["n_tokens"], r["tok_offset"])
        for r in pack_assignments(df, "doc_id", "text", 4, 1).collect()
    )
    by_key1 = [t for t in got if t[0] == 1]
    assert by_key1 == [(1, 2, 0), (1, 5, 2)]  # shorter row first


def test_doc_spanning_sequence_boundary(spark):
    # one shard, L=4: doc1 has 3 toks [0,3), doc2 has 3 toks [3,6) -> spans
    # seqs 0 and 1 contributing 1 and 2 tokens
    df = spark.createDataFrame([(1, "a b c"), (2, "d e f")], ["doc_id", "text"])
    s = {
        (r["shard"], r["seq"]): (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(df, "doc_id", "text", 4, 1).collect()
    }
    shard = next(k[0] for k in s)
    assert s[(shard, 0)] == (2, 4)
    assert s[(shard, 1)] == (1, 2)


def test_chunk_documents_duckdb_parity(docs, con):
    _assert_frames_equal(
        chunk_documents(docs, "doc_id", "text", 64, 16),
        con,
        chunk_documents_sql("documents", "doc_id", "text", 64, 16),
        ["doc_key", "chunk_id"],
    )


def test_chunk_windows_and_overlap(spark):
    df = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", 4, 1).collect(),
        key=lambda r: r["chunk_id"],
    )
    texts = [r["chunk_text"] for r in rows]
    assert texts == ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4]
    # short doc -> single short chunk; empty doc -> none
    df2 = spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"])
    rows2 = chunk_documents(df2, "doc_id", "text", 4, 1).collect()
    assert len(rows2) == 1 and rows2[0]["chunk_text"] == "a b"
    with pytest.raises(ValueError):
        chunk_documents(df2, "doc_id", "text", 4, 4)


def test_chunk_reconstruction_covers_doc(docs):
    # overlap=0 chunks concatenate back to the token stream (fixed key range,
    # not limit(): two unordered limit(50) scans may pick different rows)
    sub = docs.filter(F.col("doc_id") < 50)
    joined = (
        chunk_documents(sub, "doc_id", "text", 32, 0)
        .groupBy("doc_key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s.chunk_text,
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = sub.select(
        F.col("doc_id").alias("doc_key"),
        F.array_join(
            F.filter(F.split(F.col("text"), " "), lambda t: t != ""), " "
        ).alias("norm"),
    )
    bad = joined.join(orig, "doc_key").filter(F.col("rebuilt") != F.col("norm"))
    assert bad.count() == 0
