"""WARC source (ISO 28500 container parsing): writer/parser roundtrip,
framing robustness, and the WARC → pages → index pipeline closure."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_record_bytes,
    warc_to_pages,
)


def _file_bytes() -> bytes:
    return (
        warc_record_bytes("https://a.example.com/1", "2024-01-01T00:00:00Z", b"<p>one</p>")
        + warc_record_bytes(
            "https://a.example.com/1", "2024-01-01T00:00:00Z", b"GET / HTTP/1.1",
            warc_type="request",
        )
        + warc_record_bytes(
            "https://b.example.com/2", "2024-02-02T12:30:00Z", b"<p>two</p>",
            http_headers=None,
        )
    )


def test_roundtrip_and_record_filtering():
    recs = parse_warc_bytes(_file_bytes())
    # request record skipped; http headers stripped from record 1
    assert [(r["url"], r["html"]) for r in recs] == [
        ("https://a.example.com/1", b"<p>one</p>"),
        ("https://b.example.com/2", b"<p>two</p>"),
    ]


def test_truncated_file_is_quiet_unless_strict():
    data = _file_bytes()[:-20]  # clip the final payload
    recs = parse_warc_bytes(data)
    assert [r["url"] for r in recs] == ["https://a.example.com/1"]
    with pytest.raises(ValueError, match="truncated|malformed|Content-Length|unterminated"):
        parse_warc_bytes(data, strict=True)
    # clip INSIDE the final payload: strict flags the short body
    data2 = _file_bytes()[:-6]
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(data2, strict=True)


def test_payload_containing_crlf_crlf_survives():
    # Content-Length framing must win over separator scanning
    tricky = b"<p>a</p>\r\n\r\n<p>b</p>"
    data = warc_record_bytes("https://t/x", "2024-01-01T00:00:00Z", tricky)
    recs = parse_warc_bytes(data)
    assert recs[0]["html"] == tricky


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(_file_bytes())
    (d / "seg-1.warc").write_bytes(
        warc_record_bytes("https://c.example.com/3", "2024-03-03T00:00:00Z", b"<p>three</p>")
    )
    rows = {r["url"]: r for r in read_warc(spark, str(d)).collect()}
    assert set(rows) == {
        "https://a.example.com/1", "https://b.example.com/2", "https://c.example.com/3",
    }
    assert bytes(rows["https://c.example.com/3"]["html"]) == b"<p>three</p>"
    assert rows["https://b.example.com/2"]["warc_ts"].month == 2
    assert rows["https://a.example.com/1"]["warc_file"].endswith("seg-0.warc")


def test_warc_to_pages_feeds_build_index(spark, tmp_path):
    """The full closure: WARC container -> extracted pages -> queryable
    index."""
    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.executor import SearchEngine

    d = tmp_path / "warcs"
    d.mkdir()
    body = b"<html><head><title>T</title></head><body><p>wakame salad recipe</p></body></html>"
    (d / "seg.warc").write_bytes(
        warc_record_bytes("https://t/1", "2024-01-01T00:00:00Z", body)
        + warc_record_bytes(
            "https://t/2", "2024-01-01T00:00:00Z",
            b"<html><body><p>unrelated text entirely</p></body></html>",
        )
    )
    pages = warc_to_pages(spark, str(d), lang="en")
    out = str(tmp_path / "idx")
    meta = build_index(spark, pages, out)
    assert meta.n_docs == 2
    hits = SearchEngine(spark, out, cache_postings=False).search_terms(["wakame"], k=5).collect()
    assert [h["url"] for h in hits] == ["https://t/1"]


def test_negative_content_length_terminates():
    """A corrupted negative Content-Length must stop the scan (quiet) or
    raise (strict), never loop forever."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: -26\r\n\r\n"
    )
    assert parse_warc_bytes(bad) == []
    with pytest.raises(ValueError, match="negative"):
        parse_warc_bytes(bad, strict=True)


def test_malformed_warc_date_quiet_keeps_record(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg.warc").write_bytes(
        warc_record_bytes("https://t/1", "not-a-date", b"<p>x</p>")
    )
    rows = read_warc(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["warc_ts"] is None
    with pytest.raises(Exception, match="malformed WARC-Date"):
        read_warc(spark, str(d), strict=True).collect()


def test_warc_to_pages_duplicate_urls_stay_rowwise(spark, tmp_path):
    """Re-crawled urls (duplicates in a segment) keep one row per RECORD
    with text extracted from ITS OWN html — no join mispairing/doubling."""
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg.warc").write_bytes(
        warc_record_bytes("https://t/1", "2024-01-01T00:00:00Z",
                          b"<p>first crawl</p>")
        + warc_record_bytes("https://t/1", "2024-02-01T00:00:00Z",
                            b"<p>second crawl</p>")
    )
    rows = warc_to_pages(spark, str(d), lang="en").collect()
    assert len(rows) == 2
    texts = {bytes(r["html"]): r["text"] for r in rows}
    assert texts[b"<p>first crawl</p>"] == "first crawl"
    assert texts[b"<p>second crawl</p>"] == "second crawl"
