"""S6 analytics parity (VERDICT r1 item 8): query patterns, sessions,
performance trends as DataFrame aggregations (reference analytics.py:211-332).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from meilisearch_thai_spark.query import analytics as an

T0 = datetime(2025, 6, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def events(spark):
    recs = [
        # session A: 3 searches over 120 s, all successful
        {"query": "อาหารไทย", "session_id": "A", "ts": T0, "response_time_ms": 100.0,
         "n_hits": 5, "success": True, "language": "thai"},
        {"query": "อาหารไทย", "session_id": "A", "ts": T0 + timedelta(seconds=60),
         "response_time_ms": 200.0, "n_hits": 3, "success": True, "language": "thai"},
        {"query": "street food", "session_id": "A", "ts": T0 + timedelta(seconds=120),
         "response_time_ms": 1500.0, "n_hits": 1, "success": True, "language": "english"},
        # session B: bounce (single search), zero results, failed
        {"query": "xyzzy", "session_id": "B", "ts": T0 + timedelta(hours=1),
         "response_time_ms": 50.0, "n_hits": 0, "success": False, "language": "english"},
        # sessionless request
        {"query": "  Street   FOOD ", "session_id": None, "ts": T0 + timedelta(hours=1, minutes=5),
         "response_time_ms": 300.0, "n_hits": 2, "success": True, "language": "english"},
    ]
    return an.events_frame(spark, recs)


def test_query_patterns_normalize_and_aggregate(events):
    pats = {r["pattern"]: r for r in an.query_patterns(events).collect()}
    # whitespace-collapsed lowercase normalization merges the two spellings
    assert pats["street food"]["frequency"] == 2
    assert pats["อาหารไทย"]["frequency"] == 2
    assert pats["xyzzy"]["zero_result_count"] == 1
    assert pats["xyzzy"]["success_rate"] == 0.0
    assert pats["อาหารไทย"]["avg_response_time_ms"] == 150.0


def test_query_analytics_summary(events):
    qa = an.query_analytics(events)
    assert qa["total_unique_queries"] == 3
    assert qa["total_query_volume"] == 5
    assert qa["zero_result_queries"] == 1
    assert qa["slow_queries"] == 1  # the 1500 ms one
    assert qa["failed_queries"] == 1
    assert qa["language_distribution"]["thai"] == 2
    assert qa["top_queries"][0]["frequency"] == 2


def test_session_analytics(events):
    ss = {r["session_id"]: r for r in an.session_stats(events).collect()}
    assert set(ss) == {"A", "B"}  # sessionless rows excluded
    assert ss["A"]["total_searches"] == 3 and ss["A"]["duration_seconds"] == 120
    assert ss["B"]["total_searches"] == 1 and ss["B"]["successful_searches"] == 0
    agg = an.session_analytics(events)
    assert agg["sessions"] == 2
    assert agg["avg_session_duration_seconds"] == 60.0
    assert agg["avg_queries_per_session"] == 2.0
    assert agg["session_success_rate"] == 0.5
    assert agg["bounce_rate"] == 0.5


def test_performance_trends_hourly(events):
    rows = an.performance_trends(events).collect()
    assert len(rows) == 2  # two distinct hours
    first = rows[0]
    assert first["avg_response_time_ms"] == 600.0  # (100+200+1500)/3
    assert first["requests_per_minute"] == round(3 / 60.0, 4)
    assert first["success_rate"] == 1.0
    assert first["p99_response_time_ms"] >= first["p95_response_time_ms"] >= 200.0


def test_session_windows_gap_split(spark):
    """One session_id with a > gap pause must split into two sessions; the
    built-in session_window replaces the reference's timeout-dict tracker."""
    recs = [
        {"query": "a", "session_id": "U", "ts": T0, "response_time_ms": 10.0,
         "n_hits": 1, "success": True, "language": "en"},
        {"query": "b", "session_id": "U", "ts": T0 + timedelta(minutes=10),
         "response_time_ms": 10.0, "n_hits": 1, "success": True, "language": "en"},
        # 31-minute silence > the 30-minute gap -> new session
        {"query": "c", "session_id": "U", "ts": T0 + timedelta(minutes=41),
         "response_time_ms": 10.0, "n_hits": 0, "success": False, "language": "en"},
    ]
    rows = sorted(
        an.session_windows(an.events_frame(spark, recs)).collect(),
        key=lambda r: r["session_start"],
    )
    assert len(rows) == 2
    assert rows[0]["total_searches"] == 2 and rows[0]["successful_searches"] == 2
    assert rows[1]["total_searches"] == 1 and rows[1]["successful_searches"] == 0


def test_session_windows_streaming(spark, tmp_path_factory):
    """The same sessionization expression runs on a live stream with a
    watermark — state evicts itself, no cleanup thread."""
    recs = [
        {"query": "a", "session_id": "S", "ts": T0 + timedelta(minutes=i), "response_time_ms": 5.0,
         "n_hits": 1, "success": True, "language": "en"}
        for i in range(3)
    ]
    src = str(tmp_path_factory.mktemp("sess_stream") / "ev")
    an.events_frame(spark, recs).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(an.EVENT_SCHEMA).parquet(src).withWatermark("ts", "1 hour")
    q = (
        an.session_windows(stream)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sessions_stream").collect()
    assert len(rows) == 1 and rows[0]["total_searches"] == 3


def test_performance_trends_streaming_matches_batch(spark, events, tmp_path_factory):
    """The streaming trends job (watermark + windowed agg) over a file
    stream must agree with the batch computation on the shared columns."""
    root = tmp_path_factory.mktemp("an_stream")
    src = str(root / "events")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(an.EVENT_SCHEMA).parquet(src)
    q = (
        an.performance_trends_stream(stream)
        .writeStream.format("memory")
        .queryName("trends_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["bucket_start"]: (r["avg_response_time_ms"], r["requests_per_minute"], r["success_rate"])
        for r in spark.table("trends_stream").collect()
    }
    want = {
        r["bucket_start"]: (r["avg_response_time_ms"], r["requests_per_minute"], r["success_rate"])
        for r in an.performance_trends(events).collect()
    }
    assert got == want and len(got) == 2


def test_service_records_and_reports(spark, tmp_path_factory):
    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.query.service import SearchService
    from meilisearch_thai_spark.sources.pages import generate_pages

    out = str(tmp_path_factory.mktemp("svc_an"))
    build_index(spark, generate_pages(spark, 300, seed=9), out)
    svc = SearchService(spark, out, cache_postings=False)
    svc.search("อาหารไทย", limit=3, session_id="s1")
    svc.search("อาหารไทย", limit=3, session_id="s1")
    svc.search("เทคโนโลยี", limit=3, session_id="s2")
    rep = svc.analytics_report(spark)
    assert rep["query_analytics"]["total_query_volume"] == 3
    assert rep["query_analytics"]["total_unique_queries"] == 2
    assert rep["session_analytics"]["sessions"] == 2
    assert rep["session_analytics"]["bounce_rate"] == 0.5
    # export writes a JSON summary
    p = str(tmp_path_factory.mktemp("an_out") / "summary.json")
    an.export_analytics(svc.events_df(spark), p)
    import json

    with open(p) as fh:
        assert "query_analytics" in json.load(fh)


def test_popular_searches(events):
    rows = an.popular_searches(events, limit=2).collect()
    # top by frequency, deterministic tie-break on pattern
    assert [r["pattern"] for r in rows] == ["street food", "อาหารไทย"]
    assert rows[0]["frequency"] == 2 and rows[1]["success_rate"] == 1.0
    # language filter (endpoint's ?language=)
    en = an.popular_searches(events, language="ENGLISH").collect()
    assert {r["pattern"] for r in en} == {"street food", "xyzzy"}


def test_trending_queries(events, spark):
    # build a log where 'hot' surges near the anchor and 'old' is ancient:
    # hot: 8 hits in the last hour; old: 8 hits starting 100 h earlier;
    # sparse: below the frequency floor
    recs = []
    for i in range(8):
        recs.append({"query": "hot", "session_id": None,
                     "ts": T0 + timedelta(minutes=50 + i), "response_time_ms": 10.0,
                     "n_hits": 1, "success": True, "language": "english"})
        recs.append({"query": "old", "session_id": None,
                     "ts": T0 - timedelta(hours=100) + timedelta(minutes=i * 60 * 13),
                     "response_time_ms": 10.0, "n_hits": 1, "success": True,
                     "language": "english"})
    # one recent 'old' hit keeps it inside the recency window (the detector
    # needs last_seen within the hour), but its 100 h age crushes the score
    recs.append({"query": "old", "session_id": None, "ts": T0 + timedelta(minutes=30),
                 "response_time_ms": 10.0, "n_hits": 1, "success": True,
                 "language": "english"})
    recs.append({"query": "sparse", "session_id": None, "ts": T0 + timedelta(minutes=55),
                 "response_time_ms": 10.0, "n_hits": 1, "success": True,
                 "language": "english"})
    ev = an.events_frame(spark, recs)
    rows = an.trending_queries(ev, min_frequency=5).collect()
    got = {r["pattern"]: r for r in rows}
    # 'sparse' under the frequency floor; both others recent enough, but
    # 'hot' (8 hits in <1 h -> score 8/1.0-ish) far outscores 'old'
    # (8 hits over ~100 h)
    assert "sparse" not in got
    assert rows[0]["pattern"] == "hot"
    assert got["hot"]["trend_score"] > got["old"]["trend_score"] * 10
    # explicit anchor excludes everything older than the window
    future = an.trending_queries(ev, now=T0 + timedelta(days=30), min_frequency=5).collect()
    assert future == []


def test_quality_report(events):
    qr = an.quality_report(events)
    assert qr["zero_result_queries"]["total_count"] == 1
    assert qr["zero_result_queries"]["top_queries"] == [("xyzzy", 1)]
    assert qr["zero_result_queries"]["percentage_of_total"] == 20.0
    assert qr["slow_queries"]["total_count"] == 1
    assert qr["slow_queries"]["avg_response_time_ms"] == 1500.0
    assert qr["failed_queries"]["total_count"] == 1
    assert qr["failed_queries"]["failure_rate"] == 20.0
    assert any("zero-result" in r.lower() for r in qr["recommendations"])
