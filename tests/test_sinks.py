"""TableSink adapter (VERDICT r1 item 7): one storage seam for index tables,
so the north rule's Iceberg target maps to a single class swap."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.index.sinks import IcebergSink, ParquetSink


def test_parquet_sink_round_trip(spark, tmp_path):
    sink = ParquetSink(str(tmp_path))
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    sink.write(df, "t1")
    back = sink.read(spark, "t1")
    assert back.count() == 100
    assert sink.location("t1") == str(tmp_path / "t1")


def test_parquet_sink_partition_by(spark, tmp_path):
    from pyspark.sql import functions as F

    sink = ParquetSink(str(tmp_path))
    df = spark.range(0, 20).withColumn("p", (F.col("id") % 2).cast("int"))
    sink.write(df, "t2", partition_by=["p"])
    assert (tmp_path / "t2" / "p=0").exists()
    assert sink.read(spark, "t2").count() == 20


def test_build_through_explicit_sink(spark, tmp_path):
    from datetime import datetime

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.executor import SearchEngine

    out = str(tmp_path / "idx")
    pages = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1), b"", "เทคโนโลยีอาหาร", "th")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    meta = build_index(spark, pages, out, sink=ParquetSink(out))
    assert meta.n_docs == 1
    eng = SearchEngine(spark, out, cache_postings=False)
    assert eng.search("เทคโนโลยี", k=5).collect()


def test_iceberg_sink_fails_actionably_without_catalog(spark):
    sink = IcebergSink("nocat.db.idx")
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        sink.write(df, "postings")
    assert sink.location("postings") == "nocat.db.idx_postings"
