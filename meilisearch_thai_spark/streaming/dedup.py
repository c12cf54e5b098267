"""Streaming exact dedup for live crawl ingestion.

A crawl stream re-delivers the same page constantly (re-crawls, mirror
hosts, redirect aliases); batch pipelines dedup after the fact
(pipeline/dedup.py), but an INGESTING stream wants duplicates dropped
before they ever hit the staging layer.  Decision record, mirroring
streaming/quota.py's module doc: this one IS expressible with a built-in —
``dropDuplicatesWithinWatermark`` keys state by the content digest and
evicts it once the watermark passes, which is exactly "drop re-deliveries
within the re-crawl horizon" — so custom ``applyInPandasWithState`` is
deliberately NOT used here (quota needed it because pass-or-drop on a
running COUNT is not an aggregation; drop-if-seen IS the built-in).

Scale: state is one digest (16 bytes) + timestamp per distinct document
seen inside the watermark horizon, partitioned by digest hash — the same
state-store scaling as any streaming aggregation.  The watermark bounds
state forever; an unbounded "never re-ingest" guarantee belongs to the
batch layer (``pipeline.dedup.against_snapshot`` at finalize), giving the
standard lambda split: stream = horizon-bounded exact, batch = unbounded
exact + fuzzy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIGEST = "_digest"


def stream_exact_dedup(
    pages: DataFrame, text_col: str, ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """Drop re-deliveries of identical ``text_col`` content arriving within
    the ``delay`` watermark horizon; first arrival wins.  Works on a
    streaming DataFrame (state evicted past the watermark) and, like every
    Spark built-in, degrades to plain dropDuplicates semantics over a
    bounded frame."""
    digested = pages.withColumn(DIGEST, F.md5(F.col(text_col)))
    if pages.isStreaming:
        digested = digested.withWatermark(ts_col, delay)
        out = digested.dropDuplicatesWithinWatermark([DIGEST])
    else:
        out = digested.dropDuplicates([DIGEST])
    return out.drop(DIGEST)


def batch_exact_dedup_first(
    docs: DataFrame, text_col: str, ts_col: str, tie_col: str
) -> DataFrame:
    """Batch twin with a DETERMINISTIC winner: per content digest keep the
    first row by (ts, tie).  The stream matches it on the SURVIVOR SET
    always; on WHICH row survives only when a digest's first delivery is
    unique within its micro-batch (cross-batch order is arrival order, but
    ``dropDuplicatesWithinWatermark`` keeps an arbitrary row among
    same-digest rows of ONE batch — within-batch processing order is not
    event-time order).  Pipelines that key on the surviving row's url
    across engines should re-canonicalize with THIS twin at finalize; the
    stream's job is volume reduction at ingest.  One window per digest."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(
        F.asc(ts_col), F.asc(tie_col)
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
