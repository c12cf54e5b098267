"""P6 — search-request validation (driver-side, plain Python).

Mirrors the reference's request models and executor validation
(src/search_proxy/models/requests.py:51-147;
src/search_proxy/services/search_executor.py:912-983): limit 1-100, offset
≥ 0, crop length 10-1000, matching strategy enum, sort entries
``field:asc|desc``.  Raises ``ValueError`` with the same kind of message the
reference surfaces as HTTP 422.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MATCHING_STRATEGIES = {"all", "last", "frequency", "best"}
_SORTABLE_DIRS = {"asc", "desc"}


@dataclass
class SearchRequest:
    query: str
    limit: int = 10
    offset: int = 0
    crop_length: int = 200
    matching_strategy: str = "best"
    sort: list[str] = field(default_factory=list)
    filters: dict | None = None
    min_score_threshold: float = 0.0
    # reference models/requests.py:16-20: highlight toggle, per-attribute
    # highlighting, and the crop marker string
    highlight: bool = True
    attributes_to_highlight: list[str] = field(default_factory=list)
    crop_marker: str = "..."
    # reference models/requests.py:32 max_query_variants (ge=1, le=10);
    # None = the pipeline default (5)
    max_query_variants: int | None = None


def validate_request(req: SearchRequest) -> SearchRequest:
    """Validate and return the request (raises ValueError on any violation)."""
    if not isinstance(req.query, str):
        raise ValueError("query must be a string")
    if not (1 <= req.limit <= 100):
        raise ValueError(f"limit must be in [1, 100], got {req.limit}")
    if req.offset < 0:
        raise ValueError(f"offset must be >= 0, got {req.offset}")
    if not (10 <= req.crop_length <= 1000):
        raise ValueError(f"crop_length must be in [10, 1000], got {req.crop_length}")
    if req.matching_strategy not in MATCHING_STRATEGIES:
        raise ValueError(
            f"matching_strategy must be one of {sorted(MATCHING_STRATEGIES)}, got {req.matching_strategy!r}"
        )
    for s in req.sort:
        parts = s.split(":")
        if len(parts) != 2 or not parts[0] or parts[1] not in _SORTABLE_DIRS:
            raise ValueError(f"sort entries must be 'field:asc|desc', got {s!r}")
    if not (0.0 <= req.min_score_threshold <= 1.0):
        raise ValueError(f"min_score_threshold must be in [0, 1], got {req.min_score_threshold}")
    if not isinstance(req.crop_marker, str):
        raise ValueError("crop_marker must be a string")
    for a in req.attributes_to_highlight:
        if not isinstance(a, str) or not a:
            raise ValueError(f"attributes_to_highlight entries must be non-empty strings, got {a!r}")
    if req.max_query_variants is not None and not (1 <= req.max_query_variants <= 10):
        raise ValueError(f"max_query_variants must be in [1, 10], got {req.max_query_variants}")
    return req


# P4 — filter translation: the reference turns {"field": {"$gte": 100}} into
# MeiliSearch filter strings (search_executor.py:766-829); here the target is
# a typed Spark Column predicate.
_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$exists"}


def check_declared(fields, declared, kind: str) -> None:
    """Enforce a filterable/sortable declaration when one exists (None =
    undeclared mode, everything allowed — IndexMeta docs).  Shared by the
    search path (SearchEngine) and maintenance (delete_by_filter) so the
    two can never drift on what a declaration allows."""
    if declared is None:
        return
    bad = sorted(set(fields) - set(declared))
    if bad:
        raise ValueError(
            f"{kind} {bad} not declared (settings allow {sorted(declared)}); "
            f"declare them with update_{kind.split()[0]}_attributes"
        )


def filters_to_column(filters: dict):
    """AND-joined Column predicate from the reference's filter dict syntax."""
    from pyspark.sql import functions as F

    pred = None

    def _and(p):
        nonlocal pred
        pred = p if pred is None else (pred & p)

    for fld, cond in (filters or {}).items():
        col = F.col(fld)
        if not isinstance(cond, dict):
            _and(col == F.lit(cond))
            continue
        for op, val in cond.items():
            if op not in _OPS:
                raise ValueError(f"unsupported filter operator {op!r}")
            if op == "$eq":
                _and(col == F.lit(val))
            elif op == "$ne":
                _and(col != F.lit(val))
            elif op == "$gt":
                _and(col > F.lit(val))
            elif op == "$gte":
                _and(col >= F.lit(val))
            elif op == "$lt":
                _and(col < F.lit(val))
            elif op == "$lte":
                _and(col <= F.lit(val))
            elif op == "$in":
                _and(col.isin(list(val)))
            elif op == "$exists":
                _and(col.isNotNull() if val else col.isNull())
    from pyspark.sql import functions as F  # noqa: F811

    return pred if pred is not None else F.lit(True)
