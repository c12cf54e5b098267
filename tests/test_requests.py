"""P6 request validation + P4 filter translation parity tests."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.query.requests import (
    SearchRequest,
    filters_to_column,
    validate_request,
)


def test_valid_request_passes():
    r = SearchRequest("วากาเมะ", limit=100, offset=0, sort=["price:asc", "ts:desc"])
    assert validate_request(r) is r


@pytest.mark.parametrize(
    "kwargs",
    [
        {"limit": 0},
        {"limit": 101},
        {"offset": -1},
        {"crop_length": 5},
        {"crop_length": 2000},
        {"matching_strategy": "fuzzy"},
        {"sort": ["price"]},
        {"sort": ["price:up"]},
        {"min_score_threshold": 1.5},
    ],
)
def test_invalid_requests_rejected(kwargs):
    with pytest.raises(ValueError):
        validate_request(SearchRequest("q", **kwargs))


def test_filter_translation(spark):
    df = spark.createDataFrame(
        [(1, 150, "th", None), (2, 50, "en", "x"), (3, 150, "en", "y")],
        "k long, score long, lang string, tag string",
    )
    got = df.filter(
        filters_to_column({"score": {"$gte": 100}, "lang": {"$in": ["en", "de"]}})
    ).collect()
    assert [r["k"] for r in got] == [3]
    got = df.filter(filters_to_column({"tag": {"$exists": True}})).collect()
    assert {r["k"] for r in got} == {2, 3}
    got = df.filter(filters_to_column({"lang": "th"})).collect()
    assert [r["k"] for r in got] == [1]
    assert df.filter(filters_to_column({})).count() == 3
    with pytest.raises(ValueError):
        filters_to_column({"x": {"$regex": "a"}})
