"""WARC (Web ARChive, ISO 28500) source: the container format crawls
actually arrive in (Common Crawl publishes ~1 GB ``.warc.gz`` segments).

The reference ingests pre-extracted text (document_processor.py receives
JSON documents); a 100 TB web pipeline starts one stage earlier — parsing
WARC response records into the ``pages(url, warc_ts, html, …)`` frame this
repo's extract/clean/index stages consume.  Together with
``webtext.extract_html_text`` and ``webtext.clean_corpus`` this closes the
loop: raw crawl container → text → hygiene → index.

Scale shape: the processing grain is ONE WARC FILE per task — exactly how
warcio-based pipelines shard (a segment is the atomic unit; records inside
are framed sequentially and cannot be split without scanning).  Reading via
``spark.read.format("binaryFile")`` gives (path, content) rows; the parser
is a ``mapInPandas`` generator over those rows — byte-format parsing is the
honest use case for the Python path (imperative framing, no columnar
expression exists), and the output columns immediately re-enter JVM land.

Parsing follows the WARC/1.0 framing: ``WARC/1.0\\r\\n`` + header lines +
blank line + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``.
Only ``WARC-Type: response`` records yield rows; an HTTP payload's status
line + headers are stripped to the body.  Malformed trailing bytes stop the
scan for that file (crash-quiet per file is the crawl-world convention:
truncated segments are routine) — but a ``strict=True`` read raises
instead, for pipelines that prefer loud.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("warc_file", T.StringType(), True),
    ]
)


def warc_record_bytes(
    url: str,
    date: str,
    payload: bytes,
    warc_type: str = "response",
    http_headers: str | None = "HTTP/1.1 200 OK\r\nContent-Type: text/html",
) -> bytes:
    """One WARC/1.0 record (writer twin of the parser; tests + synthesis).

    ``date`` is the ``WARC-Date`` value (ISO-8601, e.g.
    ``2024-01-01T00:00:00Z``).  With ``http_headers`` the payload is wrapped
    as an HTTP response body, the way real response records carry pages."""
    body = (
        http_headers.encode("ascii") + _CRLF + _CRLF + payload
        if http_headers is not None
        else payload
    )
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode("ascii")
        + f"WARC-Target-URI: {url}\r\n".encode("ascii")
        + f"WARC-Date: {date}\r\n".encode("ascii")
        + f"Content-Length: {len(body)}\r\n".encode("ascii")
        + _CRLF
    )
    return head + body + _CRLF + _CRLF


def parse_warc_bytes(data: bytes, strict: bool = False) -> list[dict]:
    """Parse one WARC file's bytes into response-record dicts
    (url, warc_date, html).  Pure function — unit-testable off-cluster, and
    the exact code the distributed reader runs per file."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            if strict and data[pos:].strip():
                raise ValueError(f"malformed WARC framing at byte {pos}")
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            if strict:
                raise ValueError("unterminated WARC header block")
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            if strict:
                raise ValueError("WARC record without Content-Length") from None
            break
        if length < 0:
            # a negative length would move the scan BACKWARD and loop forever
            if strict:
                raise ValueError(f"negative Content-Length {length}")
            break
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        if len(body) < length:
            if strict:
                raise ValueError("truncated WARC payload")
            break
        pos = body_start + length
        # consume the record separator (two CRLFs), tolerantly
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if headers.get("warc-type") == "response":
            if body[:5] == b"HTTP/":
                split = body.find(_CRLF + _CRLF)
                if split >= 0:
                    body = body[split + 4 :]
            out.append(
                {
                    "url": headers.get("warc-target-uri"),
                    "warc_date": headers.get("warc-date"),
                    "html": body,
                }
            )
    return out


def read_warc(
    spark: SparkSession, source, strict: bool = False
) -> DataFrame:
    """WARC files → (url, warc_ts, html, warc_file) rows.

    ``source`` is a path/glob (read via the ``binaryFile`` format, one task
    per file — the warcio sharding grain) or an existing DataFrame with
    (``path`` string, ``content`` binary) columns."""
    if isinstance(source, DataFrame):
        files = source.select("path", "content")
    else:
        files = spark.read.format("binaryFile").load(source).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), strict=strict):
                    try:
                        ts = (
                            pd.to_datetime(rec["warc_date"], utc=True).tz_localize(None)
                            if rec["warc_date"]
                            else None
                        )
                    except (ValueError, TypeError):
                        # corrupted WARC-Date: quiet mode keeps the record
                        # with a NULL timestamp (the crawl-tolerance
                        # contract); strict surfaces it
                        if strict:
                            raise ValueError(
                                f"malformed WARC-Date {rec['warc_date']!r}"
                            ) from None
                        ts = None
                    rows.append((rec["url"], ts, rec["html"], path))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "warc_file"]
            )

    return files.mapInPandas(run, WARC_SCHEMA)


def warc_to_pages(spark: SparkSession, source, lang: str | None = None) -> DataFrame:
    """WARC → the repo's ``pages`` frame: html extracted to text via
    :func:`~..pipeline.webtext.extract_html_text`, ``lang`` filled with the
    given constant or left NULL for a downstream language-ID stage — ready
    for ``clean_corpus``/``build_index``."""
    from ..pipeline.webtext import html_text_columns

    recs = read_warc(spark, source)
    # extraction applied IN PLACE (html_text_columns), never an id-keyed
    # self-join: urls repeat across re-crawls in real segments, and a join
    # on a non-unique url would mispair html/text and double rows
    _title, text = html_text_columns(F.col("html").cast("string"))
    return recs.select(
        "url",
        "warc_ts",
        "html",
        text.alias("text"),
        F.lit(lang).cast("string").alias("lang"),
    )
