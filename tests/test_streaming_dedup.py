"""Streaming exact dedup: dropDuplicatesWithinWatermark vs the deterministic
batch twin — re-deliveries across micro-batches must drop while state stays
watermark-bounded."""

from __future__ import annotations

import os
import time

from meilisearch_thai_spark.streaming.dedup import (
    batch_exact_dedup_first,
    stream_exact_dedup,
)

SCHEMA = "url string, text string, ts timestamp"


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, t, s) for u, t, s in rows], "url string, text string, ts string"
    ).selectExpr("url", "text", "CAST(ts AS TIMESTAMP) AS ts")


def test_batch_twin_first_arrival_wins(spark):
    df = _df(
        spark,
        [
            ("u1", "same body", "2026-01-01 10:00:00"),
            ("u2", "same body", "2026-01-01 10:00:05"),
            ("u3", "other body", "2026-01-01 10:00:01"),
            ("u0", "same body", "2026-01-01 10:00:00"),  # ts tie -> url asc
        ],
    )
    got = sorted(
        r["url"] for r in batch_exact_dedup_first(df, "text", "ts", "url").collect()
    )
    assert got == ["u0", "u3"]
    # bounded-frame stream_exact_dedup drops dups too (winner unspecified)
    assert stream_exact_dedup(df, "text", "ts").count() == 2


def test_stream_drops_redeliveries_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _df(
        spark,
        [
            ("a/1", "alpha page", "2026-01-01 10:00:00"),
            ("b/1", "beta page", "2026-01-01 10:00:01"),
        ],
    ).coalesce(1).write.parquet(src + "/b0")
    time.sleep(1.1)
    _df(
        spark,
        [
            ("a/2", "alpha page", "2026-01-01 10:00:30"),  # re-delivery: drop
            ("c/1", "gamma page", "2026-01-01 10:00:31"),
        ],
    ).coalesce(1).write.parquet(src + "/b1")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        stream_exact_dedup(stream, "text", "ts", delay="10 minutes")
        .writeStream.format("memory")
        .queryName("sdedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT url, text FROM sdedup_sink").collect()
    got = sorted(r["url"] for r in rows)
    assert got == ["a/1", "b/1", "c/1"]
    # equals the batch twin under time-ordered arrival
    batch = batch_exact_dedup_first(
        spark.read.parquet(src + "/b*"), "text", "ts", "url"
    ).collect()
    assert sorted(r["url"] for r in batch) == got
