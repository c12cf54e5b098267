"""Per-host crawl quota: batch window twin vs the applyInPandasWithState
stream — per-host state must survive ACROSS micro-batches (the property no
built-in streaming aggregation expresses)."""

from __future__ import annotations

import os
import time

import pytest

from meilisearch_thai_spark.streaming.quota import apply_host_quota, host_quota_stream

SCHEMA = "host string, ts long, url string"


def _rows(host, ts0, n):
    return [(host, ts0 + i, f"{host}/{ts0 + i}") for i in range(n)]


def test_apply_host_quota_batch_semantics(spark):
    df = spark.createDataFrame(
        _rows("a.com", 0, 5) + _rows("b.com", 0, 2), SCHEMA
    )
    got = apply_host_quota(df, "host", 3, "ts", "url").collect()
    by = {}
    for r in got:
        by.setdefault(r["host"], []).append(r["ts"])
    assert sorted(by["a.com"]) == [0, 1, 2]  # first 3 by ts
    assert sorted(by["b.com"]) == [0, 1]     # under quota: all pass
    with pytest.raises(ValueError):
        apply_host_quota(df, "host", 0, "ts", "url")


def test_host_quota_state_survives_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: a.com sends 2 (of quota 3), b.com sends 3 (quota filled)
    spark.createDataFrame(
        _rows("a.com", 0, 2) + _rows("b.com", 0, 3), SCHEMA
    ).coalesce(1).write.parquet(src + "/b0")
    time.sleep(1.1)  # file-source ordering is by modification time
    # batch 2: a.com sends 3 more (only 1 may pass), b.com sends 2 (all drop)
    spark.createDataFrame(
        _rows("a.com", 10, 3) + _rows("b.com", 10, 2), SCHEMA
    ).coalesce(1).write.parquet(src + "/b1")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    gated = host_quota_stream(stream, "host", 3, "ts", "url")
    q = (
        gated.writeStream.format("memory")
        .queryName("quota_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM quota_sink").collect()
    by = {}
    for r in rows:
        by.setdefault(r["host"], []).append(r["ts"])
    # a.com: 2 from batch1 + exactly 1 more from batch2 (state carried)
    assert sorted(by["a.com"]) == [0, 1, 10]
    # b.com: quota consumed entirely in batch1; batch2 fully dropped
    assert sorted(by["b.com"]) == [0, 1, 2]
    # and the stream equals the batch twin here because arrival order
    # follows ts order (the live-crawl contract)
    batch = apply_host_quota(
        spark.read.parquet(src + "/b*"), "host", 3, "ts", "url"
    ).collect()
    assert sorted((r["host"], r["ts"]) for r in rows) == sorted(
        (r["host"], r["ts"]) for r in batch
    )
