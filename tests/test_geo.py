"""Geosearch (MeiliSearch `_geoRadius` / `_geoBoundingBox` filters,
`_geoPoint(lat, lng)` sort, `_geoDistance` hit field).

The reference proxies MeiliSearch, whose geosearch contract is: documents
carry a reserved ``_geo`` attribute, filters restrict by haversine radius or
bounding box (boxes may cross the antimeridian), sorting by ``_geoPoint``
orders by haversine distance and attaches ``_geoDistance`` (meters) to each
hit, and using geo on an index that declares filterable/sortable attributes
requires ``_geo`` in the declaration.  Here the document metadata columns
are plain ``lat``/``lng`` doubles (degrees); every assertion below checks
the engine against an independent pure-Python haversine twin.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index
from meilisearch_thai_spark.query.executor import SearchEngine, parse_geo_point
from meilisearch_thai_spark.sources.pages import generate_pages

N = 300
BKK = (13.7563, 100.5018)


def _py_haversine(lat1, lng1, lat2, lng2):
    d = 0.017453292519943295
    p1, l1, p2, l2 = lat1 * d, lng1 * d, lat2 * d, lng2 * d
    sp = math.sin((p2 - p1) / 2.0)
    sl = math.sin((l2 - l1) / 2.0)
    h = sp * sp + (math.cos(p1) * math.cos(p2)) * (sl * sl)
    return 2.0 * 6371000.0 * math.asin(min(1.0, math.sqrt(h)))


def _geo_pages(spark, n=N):
    """Deterministic corpus with lat/lng spread over the globe."""
    pages = generate_pages(spark, n, seed=77)
    rid = F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    return pages.withColumn(
        "lat", (F.pmod(rid * 37, F.lit(17000)).cast("double") / 100.0 - 85.0)
    ).withColumn(
        "lng", (F.pmod(rid * 73, F.lit(35000)).cast("double") / 100.0 - 175.0)
    )


@pytest.fixture(scope="module")
def geo_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("geoidx") / "idx")
    pages = _geo_pages(spark).persist()
    build_index(spark, pages, out, bucket_span=128, stored_fields=["lat", "lng"])
    coords = {
        r["url"]: (r["lat"], r["lng"])
        for r in pages.select("url", "lat", "lng").collect()
    }
    pages.unpersist()
    return out, coords


def _common_term(eng):
    return (
        eng.postings.groupBy("term")
        .agg(F.max("df").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(1)
        .collect()[0]["term"]
    )


def test_geo_radius_filter_matches_python_twin(spark, geo_idx):
    out, coords = geo_idx
    eng = SearchEngine(spark, out, cache_postings=False)
    # ids 0..299 put every point at lat = .37*id - 85, lng = .73*id - 175
    # (the modulus never wraps below id 460) — center the circle mid-line
    center, radius = (-29.5, -65.5), 3_000_000.0
    allowed = {
        r["doc_id"]
        for r in eng.allowed_docs({"_geo": {"$radius": [*center, radius]}}).collect()
    }
    id_of = {r["url"]: r["doc_id"] for r in eng.doc_stats.select("url", "doc_id").collect()}
    expect = {
        id_of[u] for u, (la, ln) in coords.items()
        if _py_haversine(*center, la, ln) <= radius
    }
    assert allowed == expect and 0 < len(allowed) < len(coords)

    # end-to-end: filtered top-k == unfiltered full ranking restricted to
    # the allowed set (corpus-wide BM25 stats, filter prunes candidates)
    term = _common_term(eng)
    full = eng.search_terms([term], k=N).collect()
    want = [r["doc_id"] for r in full if r["doc_id"] in allowed][:5]
    got = [r["doc_id"] for r in eng.search_terms(
        [term], k=5, filters={"_geo": {"$radius": [*center, radius]}}
    ).collect()]
    assert got == want


def test_geo_bounding_box_incl_antimeridian(spark, geo_idx):
    out, coords = geo_idx
    eng = SearchEngine(spark, out, cache_postings=False)
    id_of = {r["url"]: r["doc_id"] for r in eng.doc_stats.select("url", "doc_id").collect()}

    # plain box: topRight=(-30, -80), bottomLeft=(-60, -140) — cuts the
    # point line (see the fixture derivation) on both axes
    allowed = {
        r["doc_id"]
        for r in eng.allowed_docs(
            {"_geo": {"$boundingBox": [[-30.0, -80.0], [-60.0, -140.0]]}}
        ).collect()
    }
    expect = {
        id_of[u] for u, (la, ln) in coords.items()
        if -60.0 <= la <= -30.0 and -140.0 <= ln <= -80.0
    }
    assert allowed == expect and 0 < len(allowed) < len(coords)

    # antimeridian crossing: left lng 170 > right lng -170 → OR of wraps
    # (catches the low ids whose lng sits below -170)
    allowed = {
        r["doc_id"]
        for r in eng.allowed_docs(
            {"_geo": {"$boundingBox": [[0.0, -170.0], [-90.0, 170.0]]}}
        ).collect()
    }
    expect = {
        id_of[u] for u, (la, ln) in coords.items()
        if -90.0 <= la <= 0.0 and (ln >= 170.0 or ln <= -170.0)
    }
    assert allowed == expect and 0 < len(allowed) < len(coords)


def test_geo_point_sort_attaches_distance(spark, geo_idx):
    out, coords = geo_idx
    eng = SearchEngine(spark, out, cache_postings=False)
    term = _common_term(eng)
    hits = eng.search_terms(
        [term], k=10, sort=[f"_geoPoint({BKK[0]}, {BKK[1]}):asc"]
    ).collect()
    assert len(hits) == 10
    dists = [r["_geoDistance"] for r in hits]
    assert dists == sorted(dists)
    for r in hits:
        la, ln = coords[r["url"]]
        assert r["_geoDistance"] == math.floor(_py_haversine(*BKK, la, ln))
    # the 10 hits ARE the 10 nearest docs matching the term
    matching = {r["url"] for r in eng.search_terms([term], k=N).collect()}
    nearest = sorted(
        matching, key=lambda u: (_py_haversine(*BKK, *coords[u]), u)
    )[:10]
    assert [r["url"] for r in hits] == nearest

    # desc sorts farthest-first
    far = eng.search_terms(
        [term], k=3, sort=[f"_geoPoint({BKK[0]}, {BKK[1]}):desc"]
    ).collect()
    fd = [r["_geoDistance"] for r in far]
    assert fd == sorted(fd, reverse=True) and fd[0] >= dists[-1]


def test_geo_through_search_service(spark, geo_idx):
    """The proxy facade passes geo filters/sort through and surfaces
    _geoDistance on hits (MeiliSearch returns it inside the hit body)."""
    from meilisearch_thai_spark.query.service import SearchService

    out, coords = geo_idx
    svc = SearchService(spark, out)
    eng = SearchEngine(spark, out, cache_postings=False)
    term = _common_term(eng)
    r = svc.search(term, limit=5, sort=[f"_geoPoint({BKK[0]}, {BKK[1]}):asc"])
    assert len(r.hits) == 5
    dists = [h.attributes["_geoDistance"] for h in r.hits]
    assert dists == sorted(dists)
    for h in r.hits:
        la, ln = coords[h.url]
        assert h.attributes["_geoDistance"] == math.floor(_py_haversine(*BKK, la, ln))
    # radius filter through the facade restricts the page
    center, radius = (-29.5, -65.5), 3_000_000.0
    r2 = svc.search(term, limit=10, filters={"_geo": {"$radius": [*center, radius]}})
    assert r2.hits
    for h in r2.hits:
        la, ln = coords[h.url]
        assert _py_haversine(*center, la, ln) <= radius


def test_geo_declarations_and_errors(spark, geo_idx, tmp_path):
    out, _ = geo_idx
    eng = SearchEngine(spark, out, cache_postings=False)
    # malformed _geoPoint → request error, not a silent field sort
    with pytest.raises(ValueError, match="malformed _geoPoint"):
        eng.search_terms(["a"], k=3, sort=["_geoPoint(13.75):asc"])
    with pytest.raises(ValueError, match="out of range"):
        parse_geo_point("_geoPoint(97.0, 0.0)")
    with pytest.raises(ValueError, match="unsupported _geo operator"):
        eng.allowed_docs({"_geo": {"$near": [0, 0]}})
    with pytest.raises(ValueError, match="bottom <= top"):
        eng.allowed_docs({"_geo": {"$boundingBox": [[-10.0, 0.0], [10.0, 0.0]]}})
    # out-of-range radius centers are request errors, not silent wrong
    # results (an out-of-range center would break the prefilter's
    # box-superset-of-circle invariant)
    with pytest.raises(ValueError, match="center out of range"):
        eng.allowed_docs({"_geo": {"$radius": [95.0, 0.0, 700_000.0]}})
    with pytest.raises(ValueError, match="center out of range"):
        eng.allowed_docs({"_geo": {"$radius": [0.0, 200.0, 700_000.0]}})
    with pytest.raises(ValueError, match="must be >= 0"):
        eng.allowed_docs({"_geo": {"$radius": [0.0, 0.0, -5.0]}})
    with pytest.raises(ValueError, match="longitudes"):
        eng.allowed_docs({"_geo": {"$boundingBox": [[10.0, 200.0], [-10.0, 0.0]]}})

    # declared filterable/sortable lists must include _geo (MeiliSearch 400)
    from meilisearch_thai_spark.index.settings import (
        update_filterable_attributes,
        update_sortable_attributes,
    )

    update_filterable_attributes(out, ["lang"])
    update_sortable_attributes(out, ["lang"])
    eng2 = SearchEngine(spark, out, cache_postings=False)
    with pytest.raises(ValueError, match="_geo"):
        eng2.allowed_docs({"_geo": {"$radius": [*BKK, 1000.0]}})
    with pytest.raises(ValueError, match="_geo"):
        eng2.search_terms(["a"], k=3, sort=["_geoPoint(0.0, 0.0):asc"])
    update_filterable_attributes(out, ["lang", "_geo"])
    update_sortable_attributes(out, ["lang", "_geo"])
    eng3 = SearchEngine(spark, out, cache_postings=False)
    eng3.allowed_docs({"_geo": {"$radius": [*BKK, 1000.0]}}).collect()
    eng3.search_terms(["a"], k=3, sort=["_geoPoint(0.0, 0.0):asc"]).collect()
    # restore undeclared mode for the other module tests (shared fixture)
    update_filterable_attributes(out, None)
    update_sortable_attributes(out, None)

    # an index without lat/lng metadata refuses geo cleanly
    plain = str(tmp_path / "plain")
    build_index(spark, generate_pages(spark, 50, seed=5), plain, bucket_span=128)
    peng = SearchEngine(spark, plain, cache_postings=False)
    with pytest.raises(ValueError, match="lat/lng"):
        peng.allowed_docs({"_geo": {"$radius": [*BKK, 1000.0]}})
    with pytest.raises(ValueError, match="lat/lng"):
        peng.search_terms(["a"], k=3, sort=["_geoPoint(0.0, 0.0):asc"])
    # ... on the facet paths too — a clean request error on EVERY path
    # that hands filters to filters_to_column, not an AnalysisException
    with pytest.raises(ValueError, match="lat/lng"):
        peng.facet_distribution(["a"], ["lang"], filters={"_geo": {"$radius": [*BKK, 1000.0]}})
    with pytest.raises(ValueError, match="lat/lng"):
        peng.facet_search("lang", "t", filters={"_geo": {"$radius": [*BKK, 1000.0]}})


def test_radius_prefilter_is_conservative_and_pushes_down(spark, geo_idx):
    """The _geoRadius bounding-box prefilter must (a) never change the
    result set — box ⊇ circle even near poles and across the antimeridian —
    and (b) reach the parquet scan as PushedFilters on lat/lng (the part of
    the predicate that prunes row groups at 100 TB; the haversine itself is
    not scan-pushable)."""
    out, coords = geo_idx
    eng = SearchEngine(spark, out, cache_postings=False)
    id_of = {r["url"]: r["doc_id"] for r in eng.doc_stats.select("url", "doc_id").collect()}
    cases = [
        (-29.5, -65.5, 3_000_000.0),     # mid-line, the plain case
        (-84.0, -100.0, 2_000_000.0),    # near-pole: lng constraint must drop
        (-40.0, -178.0, 2_500_000.0),    # antimeridian wrap on the left
        (-40.0, 178.0, 2_500_000.0),     # antimeridian wrap on the right
        (0.0, 0.0, 19_000_000.0),        # near-antipodal radius
        (-85.0, 0.0, 700_000.0),         # pole INSIDE the circle
    ]
    for lat, lng, radius in cases:
        allowed = {
            r["doc_id"]
            for r in eng.allowed_docs({"_geo": {"$radius": [lat, lng, radius]}}).collect()
        }
        expect = {
            id_of[u] for u, (la, ln) in coords.items()
            if _py_haversine(lat, lng, la, ln) <= radius
        }
        assert allowed == expect, (lat, lng, radius)

    # plan guard: the box ranges reach the scan
    df = eng.doc_stats.filter(
        __import__("meilisearch_thai_spark.query.requests", fromlist=["x"]).filters_to_column(
            {"_geo": {"$radius": [-29.5, -65.5, 3_000_000.0]}}
        )
    )
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in txt
    assert "lat" in txt and "lng" in txt
