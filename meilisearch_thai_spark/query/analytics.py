"""S6 — search analytics: query patterns, sessions, performance trends.

Re-expresses the reference's in-process SearchAnalyticsCollector
(src/search_proxy/analytics.py:211-332 query/session analytics,
:304-332 performance trends, :443-523 pattern/session upkeep) as DataFrame
aggregations over a search-event log.  The reference mutates dicts under a
lock per request; at 100 TB the same insights are groupBy/window jobs over
billions of logged events — every aggregate here is combiner-friendly
(no windows over the whole log, no driver-side loops).

Event record contract (one row per search request):
    query string, session_id string, ts timestamp, response_time_ms double,
    n_hits long, success boolean, language string
``SearchService`` records exactly this shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType(), False),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("response_time_ms", T.DoubleType(), False),
        T.StructField("n_hits", T.LongType(), False),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("language", T.StringType(), True),
    ]
)

SLOW_MS = 1000.0  # analytics.py slow-query threshold


def events_frame(spark: SparkSession, records: list[dict]) -> DataFrame:
    return spark.createDataFrame(records, EVENT_SCHEMA)  # type: ignore[arg-type]


def _norm_query(col):
    """analytics.py:431-441 — lowercase, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def query_patterns(events: DataFrame) -> DataFrame:
    """Per normalized-query pattern stats (analytics.py:443-487 QueryPattern):
    frequency, avg response time, success rate, zero-result count, language.
    One hash aggregation — map-side combinable."""
    return (
        events.groupBy(_norm_query(F.col("query")).alias("pattern"))
        .agg(
            F.count("*").alias("frequency"),
            F.round(F.avg("response_time_ms"), 2).alias("avg_response_time_ms"),
            F.round(F.avg(F.col("success").cast("double")), 4).alias("success_rate"),
            F.sum(F.when(F.col("n_hits") == 0, 1).otherwise(0)).alias("zero_result_count"),
            F.max("language").alias("language"),
            F.max("ts").alias("last_seen"),
        )
    )


def query_analytics(events: DataFrame, top_n: int = 20) -> dict:
    """analytics.py:211-269 summary dict: totals, top queries, language and
    length distributions, zero-result/slow/failed counts.  Collects only
    k-bounded aggregates."""
    pats = query_patterns(events).cache()
    totals = pats.agg(
        F.count("*").alias("uniq"), F.sum("frequency").alias("volume")
    ).collect()[0]
    top = [
        r.asDict()
        for r in pats.orderBy(F.desc("frequency"), F.asc("pattern")).limit(top_n).collect()
    ]
    lang_dist = {
        r["language"]: r["n"]
        for r in events.groupBy("language").agg(F.count("*").alias("n")).collect()
    }
    len_buckets = {
        r["bucket"]: r["n"]
        for r in events.select(
            F.when(F.length("query") <= 10, "short(1-10)")
            .when(F.length("query") <= 30, "medium(11-30)")
            .otherwise("long(31+)")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    counters = events.agg(
        F.sum(F.when(F.col("n_hits") == 0, 1).otherwise(0)).alias("zero"),
        F.sum(F.when(F.col("response_time_ms") > SLOW_MS, 1).otherwise(0)).alias("slow"),
        F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("failed"),
    ).collect()[0]
    pats.unpersist()
    return {
        "total_unique_queries": int(totals["uniq"]),
        "total_query_volume": int(totals["volume"] or 0),
        "top_queries": top,
        "language_distribution": lang_dist,
        "query_length_distribution": len_buckets,
        "zero_result_queries": int(counters["zero"] or 0),
        "slow_queries": int(counters["slow"] or 0),
        "failed_queries": int(counters["failed"] or 0),
    }


def popular_searches(
    events: DataFrame, limit: int = 50, language: str | None = None
) -> DataFrame:
    """The /analytics/popular-searches endpoint (api/endpoints/analytics.py:
    194-250): top query patterns by frequency with their quality metrics,
    optionally filtered to one language, capped at ``limit`` (reference
    bounds 1-200).  Ordering is total (frequency desc, pattern asc) so the
    page is deterministic."""
    pats = query_patterns(events)
    if language is not None:
        pats = pats.filter(F.lower(F.col("language")) == language.lower())
    return (
        pats.orderBy(F.desc("frequency"), F.asc("pattern"))
        .limit(max(1, min(int(limit), 200)))
        .select(
            "pattern", "frequency", "avg_response_time_ms", "success_rate", "language"
        )
    )


def trending_queries(
    events: DataFrame,
    now=None,
    recent: str = "1 hour",
    min_frequency: int = 5,
    top: int = 10,
) -> DataFrame:
    """The reference's trending detector (analytics.py:523-541): patterns
    with frequency > ``min_frequency`` seen within the last ``recent``
    window, scored frequency / max(1, hours since first seen), top 10.

    ``now`` anchors the window; default is the LOG'S max timestamp (a batch
    job over a historical log has no meaningful wall-clock "now", and a
    deterministic anchor keeps the job reproducible).  The anchor rides in
    as a broadcast one-row cross join, not a driver collect, so the whole
    computation stays one lazy plan."""
    pats = events.groupBy(_norm_query(F.col("query")).alias("pattern")).agg(
        F.count("*").alias("frequency"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )
    if now is None:
        anchor = events.agg(F.max("ts").alias("_now"))
        pats = pats.crossJoin(F.broadcast(anchor))
    else:
        pats = pats.withColumn("_now", F.lit(now).cast("timestamp"))
    def _epoch(c):  # NTZ timestamps reject a direct double cast in Spark 4
        return F.col(c).cast("timestamp_ltz").cast("double")

    hours = (_epoch("_now") - _epoch("first_seen")) / F.lit(3600.0)
    return (
        pats.filter(
            (F.col("frequency") > F.lit(int(min_frequency)))
            & (F.col("last_seen") > F.col("_now") - F.expr(f"INTERVAL {recent}"))
        )
        .select(
            "pattern",
            "frequency",
            F.round(F.col("frequency") / F.greatest(F.lit(1.0), hours), 4).alias(
                "trend_score"
            ),
        )
        .orderBy(F.desc("trend_score"), F.asc("pattern"))
        .limit(top)
    )


def quality_report(events: DataFrame, top: int = 10) -> dict:
    """The /analytics/quality endpoint (analytics.py:334-385
    get_search_quality_report): zero-result / slow / failed blocks with
    top offending patterns and rates, plus threshold-rule recommendations.

    Departure from the reference: the event contract carries no error
    taxonomy (failures here are ``success=false`` rows), so the failed
    block reports its top PATTERNS where the reference reports exception
    class names — same triage purpose, log-derivable signal."""
    volume = events.count()

    def _block(cond, extra_aggs=()):
        sub = events.filter(cond)
        tops = [
            (r["pattern"], int(r["n"]))
            for r in sub.groupBy(_norm_query(F.col("query")).alias("pattern"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("pattern"))
            .limit(top)
            .collect()
        ]
        total = sum(n for _p, n in tops) if len(tops) < top else sub.count()
        return sub, tops, int(total)

    zero_sub, zero_top, zero_n = _block(F.col("n_hits") == 0)
    slow_sub, slow_top, slow_n = _block(F.col("response_time_ms") > SLOW_MS)
    fail_sub, fail_top, fail_n = _block(~F.col("success"))
    slow_avg = slow_sub.agg(F.round(F.avg("response_time_ms"), 2).alias("a")).collect()[0]["a"]
    zero_pct = round(zero_n / volume * 100, 2) if volume else 0.0
    fail_pct = round(fail_n / volume * 100, 2) if volume else 0.0
    recs: list[str] = []
    # analytics.py:564+ _generate_quality_recommendations threshold rules
    if zero_pct > 10:
        recs.append(
            "High zero-result rate: review tokenization of top zero-result "
            "patterns and consider synonym/compound dictionary entries"
        )
    if slow_n > 0:
        recs.append(
            "Slow queries present: check variant fan-out width and warm-tier "
            "coverage for the top slow patterns"
        )
    if fail_pct > 5:
        recs.append("Elevated failure rate: inspect error logs for the top failed patterns")
    return {
        "zero_result_queries": {
            "total_count": zero_n,
            "top_queries": zero_top,
            "percentage_of_total": zero_pct,
        },
        "slow_queries": {
            "total_count": slow_n,
            "top_queries": slow_top,
            "avg_response_time_ms": float(slow_avg) if slow_avg is not None else 0.0,
        },
        "failed_queries": {
            "total_count": fail_n,
            "top_patterns": fail_top,
            "failure_rate": fail_pct,
        },
        "recommendations": recs,
    }


def session_stats(events: DataFrame) -> DataFrame:
    """Per-session aggregates (analytics.py:56-80 SearchSession): duration,
    search count, success count — the substrate for session analytics."""
    return (
        events.filter(F.col("session_id").isNotNull())
        .groupBy("session_id")
        .agg(
            F.count("*").alias("total_searches"),
            F.sum(F.col("success").cast("long")).alias("successful_searches"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_seconds"),
        )
    )


def session_analytics(events: DataFrame) -> dict:
    """analytics.py:271-302: avg duration, avg queries/session, session
    success rate (sessions with ≥1 success), bounce rate (1-search sessions).
    """
    s = session_stats(events)
    row = s.agg(
        F.count("*").alias("n"),
        F.round(F.avg("duration_seconds"), 2).alias("avg_duration"),
        F.round(F.avg("total_searches"), 4).alias("avg_queries"),
        F.round(
            F.avg((F.col("successful_searches") > 0).cast("double")), 4
        ).alias("success_rate"),
        F.round(F.avg((F.col("total_searches") == 1).cast("double")), 4).alias("bounce_rate"),
    ).collect()[0]
    n = int(row["n"] or 0)
    return {
        "sessions": n,
        "avg_session_duration_seconds": float(row["avg_duration"] or 0.0),
        "avg_queries_per_session": float(row["avg_queries"] or 0.0),
        "session_success_rate": float(row["success_rate"] or 0.0),
        "bounce_rate": float(row["bounce_rate"] or 0.0),
    }


def _bucket_minutes(bucket: str) -> float:
    """Parse an ``F.window``-style interval ("N seconds|minutes|hours") into
    minutes — rejecting what it can't parse instead of silently assuming an
    hour (a wrong denominator corrupts requests_per_minute)."""
    import re as _re

    units = {
        "second": 1 / 60.0, "minute": 1.0, "hour": 60.0,
        "day": 1440.0, "week": 10080.0,
    }
    parts = _re.findall(r"(\d+)\s*(second|minute|hour|day|week)s?", bucket)
    leftover = _re.sub(r"(\d+)\s*(second|minute|hour|day|week)s?", "", bucket).strip()
    if not parts or leftover:
        raise ValueError(f"unsupported bucket interval {bucket!r}")
    return sum(int(n) * units[u] for n, u in parts)


def performance_trends(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """analytics.py:304-332 PerformanceTrend points as a time-window
    aggregation: per bucket avg/p95/p99 response time, requests-per-minute,
    success rate.  ``F.window`` keeps this streaming-compatible (the same
    expression runs under a watermark in Structured Streaming)."""
    mins = _bucket_minutes(bucket)
    return (
        events.groupBy(F.window("ts", bucket).alias("w"))
        .agg(
            F.round(F.avg("response_time_ms"), 2).alias("avg_response_time_ms"),
            F.expr("percentile(response_time_ms, 0.95)").alias("p95_response_time_ms"),
            F.expr("percentile(response_time_ms, 0.99)").alias("p99_response_time_ms"),
            F.round(F.count("*") / F.lit(mins), 4).alias("requests_per_minute"),
            F.round(F.avg(F.col("success").cast("double")), 4).alias("success_rate"),
        )
        .select(F.col("w.start").alias("bucket_start"), "*")
        .drop("w")
        .orderBy("bucket_start")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization via the BUILT-IN ``F.session_window`` — the
    Spark-first replacement for the reference's in-memory session tracker
    with its 30-minute timeout (analytics.py:102-146 session_timeout_minutes,
    :489-521 _update_session/_cleanup_expired_sessions).

    A session = consecutive searches by one session_id with < ``gap`` between
    them; the same expression runs over a bounded log OR a live stream (add
    ``withWatermark`` upstream and state evicts itself — no lock-guarded
    dict, no cleanup thread).  Custom ``applyInPandasWithState`` is NOT
    needed here: gap-sessionization is exactly what the built-in expresses,
    and built-ins keep the aggregation JVM-side with state-store support."""
    return (
        events.filter(F.col("session_id").isNotNull())
        .groupBy(F.session_window("ts", gap).alias("w"), "session_id")
        .agg(
            F.count("*").alias("total_searches"),
            F.sum(F.col("success").cast("long")).alias("successful_searches"),
        )
        .select(
            "session_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            (
                F.unix_timestamp("w.end") - F.unix_timestamp("w.start")
            ).alias("window_seconds"),
            "total_searches",
            "successful_searches",
        )
    )


def performance_trends_stream(
    events: DataFrame, bucket: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of :func:`performance_trends` for a live event feed:
    the same windowed aggregation under a watermark, so late events beyond
    ``watermark`` are dropped and window state is finalized/evicted — the
    Structured Streaming shape for continuous analytics.  Exact percentiles
    need the full value set and are a batch-only column; the streaming
    surface carries the state-friendly aggregates (avg / rpm / success)."""
    mins = _bucket_minutes(bucket)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("w"))
        .agg(
            F.round(F.avg("response_time_ms"), 2).alias("avg_response_time_ms"),
            F.round(F.count("*") / F.lit(mins), 4).alias("requests_per_minute"),
            F.round(F.avg(F.col("success").cast("double")), 4).alias("success_rate"),
        )
        .select(F.col("w.start").alias("bucket_start"), "*")
        .drop("w")
    )


def export_analytics(events: DataFrame, out_path: str) -> dict:
    """analytics.py:388-429 export: one JSON summary (query + session
    blocks) written driver-side; trend tables are written separately by the
    caller (``performance_trends(events).write.parquet(...)``)."""
    import json

    summary = {
        "query_analytics": query_analytics(events),
        "session_analytics": session_analytics(events),
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, default=str)
    return summary
