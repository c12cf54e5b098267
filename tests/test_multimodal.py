"""Multimodal binary-column plumbing: typed metadata, stubbed decode with the
real Spark contract (schema / Arrow batch shape / fan-out), frame sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.pipeline import multimodal as mm
from meilisearch_thai_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 200, seed=21).persist()


def test_binary_meta_types_and_hash(spark, pages):
    out = mm.binary_meta(pages.withColumn("k", F.xxhash64("url")), "k", "html").collect()
    assert len(out) == 200
    row = out[0]
    assert row["n_bytes"] > 0
    assert len(row["content_sha256"]) == 64
    # html payloads start with <html → sniffed
    assert {r["sniffed_type"] for r in out} == {"text/html"}


def test_binary_meta_magic_sniffing(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\nrest"),
        (2, b"\xff\xd8\xffjpeg"),
        (3, b"RIFFxxxxWAVE"),
        (4, b"plain bytes"),
    ]
    df = spark.createDataFrame(rows, "k long, payload binary")
    got = {r["k"]: r["sniffed_type"] for r in mm.binary_meta(df, "k", "payload").collect()}
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/wav",
        4: "application/octet-stream",
    }


def test_fake_decode_contract():
    arr = mm.decode_image(b"some-bytes", allow_fake=True)
    assert arr.shape == (8, 8, 3) and arr.dtype == np.uint8
    # deterministic: same payload, same pixels
    assert (arr == mm.decode_image(b"some-bytes", allow_fake=True)).all()
    assert mm.decode_image(b"", allow_fake=True).sum() == 0


def test_decode_raises_without_fake():
    try:
        import PIL  # noqa: F401

        pytest.skip("real decoder present")
    except ImportError:
        pass
    with pytest.raises((NotImplementedError, Exception)):
        mm.decode_image(b"\x89PNG\r\n\x1a\nnot-really-a-png", allow_fake=False)


def test_image_features_schema_and_determinism(spark, pages):
    feats = mm.image_features(
        pages.withColumn("k", F.xxhash64("url")), "k", "html"
    )
    rows = feats.collect()
    assert len(rows) == 200
    r = rows[0]
    assert r["height"] == 8 and r["width"] == 8 and len(r["mean_rgb"]) == 3
    assert r["decoder"] in ("pil", "fake")
    # run twice → identical features (decode is deterministic)
    again = {x["doc_key"]: x["mean_rgb"] for x in feats.collect()}
    for x in rows:
        assert again[x["doc_key"]] == x["mean_rgb"]


def test_frame_sample_fanout(spark, pages):
    frames = mm.frame_sample(
        pages.withColumn("k", F.xxhash64("url")), "k", "html", n_frames=4, frame_size=32
    )
    agg = frames.groupBy("doc_key").agg(
        F.count("*").alias("n"), F.max(F.octet_length("frame_bytes")).alias("mx")
    )
    rows = agg.collect()
    assert len(rows) == 200
    assert all(r["n"] == 4 for r in rows)
    assert all(r["mx"] <= 32 for r in rows)
    # frame 0 starts at payload start
    f0 = frames.filter((F.col("frame_idx") == 0)).limit(1).collect()[0]
    assert bytes(f0["frame_bytes"]).startswith(b"<html>")
