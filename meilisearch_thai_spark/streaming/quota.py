"""Per-host crawl quota — a genuinely STATEFUL streaming operator.

Large-scale crawl ingestion caps how many pages any single host may
contribute (C4/Gopher-era pipelines bound per-domain volume so mega-hosts
don't dominate the mixture).  Over a bounded table that is a window rank;
over a LIVE stream it needs per-host state that survives across
micro-batches ("how many has this host already emitted?") — exactly the
case Spark's built-in streaming aggregations cannot express (they fold
rows into aggregates; this must PASS or DROP whole rows based on a running
count), so this is the repo's ``applyInPandasWithState`` showcase.  The
module's sibling decision (query/analytics.py ``session_windows``) is the
opposite call: gap sessionization IS expressible with the built-in
``F.session_window``, so custom state is deliberately NOT used there.

Semantics: per host, the first ``quota`` rows pass, everything after is
dropped forever.  Within one micro-batch rows are ordered by
``(ts, tie)`` (deterministic); across micro-batches the order is arrival
order — the live-crawl contract (a batch job over the finished crawl
should use :func:`apply_host_quota`, whose global ``(ts, tie)`` order is
the arrival order when files arrive in time order).

Scale: state is ONE long per distinct host (millions of hosts = tens of
MB per state store partition); the groupBy shuffles each micro-batch by
host exactly once.  No timeout is set — a host's budget never resets; a
TTL variant (quota per day) is ``GroupStateTimeout.EventTimeTimeout`` plus
a watermark, same skeleton.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def apply_host_quota(
    pages: DataFrame, host_col: str, quota: int, ts_col: str, tie_col: str
) -> DataFrame:
    """Batch twin: the first ``quota`` rows per host in (ts, tie) order.

    One window rank per host partition — at 100 TB prefer running this
    inside the per-host ingest partitioning; the streaming form never
    materializes the rank at all."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    w = Window.partitionBy(host_col).orderBy(F.asc(ts_col), F.asc(tie_col))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def host_quota_stream(
    pages: DataFrame, host_col: str, quota: int, ts_col: str, tie_col: str
) -> DataFrame:
    """Streaming per-host quota: ``applyInPandasWithState`` keyed by host,
    state = rows already emitted for that host (one long)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    out_schema = pages.schema
    cols = out_schema.fieldNames()
    state_schema = T.StructType([T.StructField("emitted", T.LongType())])

    def fn(key, pdfs, state):
        used = int(state.get[0]) if state.exists else 0
        chunks = list(pdfs)  # drain: the (ts, tie) order spans ALL of the
        # group's Arrow chunks in this micro-batch, not each chunk alone
        remaining = quota - used
        batch = pd.concat(chunks, ignore_index=True) if chunks else None
        if batch is not None and len(batch) and remaining > 0:
            out = batch.sort_values([ts_col, tie_col], kind="mergesort").head(
                remaining
            )
            state.update((used + len(out),))
            yield out[cols]
        elif not state.exists:
            state.update((used,))

    return pages.groupBy(F.col(host_col)).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
