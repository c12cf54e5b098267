"""Property-based tests (hypothesis) for the pure-python/numpy cores."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meilisearch_thai_spark.index.codec import (
    varbyte_decode,
    varbyte_encode,
    varbyte_encode_chunks,
)
from meilisearch_thai_spark.query.executor import _edit_distance_within


# ---------------------------------------------------------------- codec
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=100),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_varbyte_chunks_consistent(vals, data):
    arr = np.array(vals, dtype=np.uint64)
    if len(vals) > 1:
        starts = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=1, max_value=len(vals) - 1),
                    max_size=len(vals) - 1,
                    unique=True,
                )
            )
        )
    else:
        starts = []
    starts = np.array([0] + starts, dtype=np.int64)
    chunks = varbyte_encode_chunks(arr, starts)
    # chunks concatenate to the plain encoding, and each decodes to its slice
    assert b"".join(chunks) == varbyte_encode(arr)
    bounds = list(starts) + [len(vals)]
    for i, c in enumerate(chunks):
        assert varbyte_decode(c).tolist() == vals[bounds[i] : bounds[i + 1]]


# ---------------------------------------------------------- edit distance
def _osa_reference(a: str, b: str) -> int:
    """Unbounded optimal-string-alignment distance, textbook DP."""
    d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        d[i][0] = i
    for j in range(len(b) + 1):
        d[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[len(a)][len(b)]


@given(
    st.text(alphabet="abcde", max_size=12),
    st.text(alphabet="abcde", max_size=12),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=500, deadline=None)
def test_banded_osa_matches_reference(a, b, k):
    assert _edit_distance_within(a, b, k) == (_osa_reference(a, b) <= k)


# ------------------------------------------------------------ positions
@given(
    st.lists(  # per-doc position lists (sorted unique ordinals)
        st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=20, unique=True).map(sorted),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_position_block_roundtrip(pos_lists):
    """Encode positions the way the block encoder does; decode the way the
    query side does; must round-trip per doc."""
    from meilisearch_thai_spark.query.executor import _decode_doc_positions

    n = len(pos_lists)
    doc_ids = np.arange(n, dtype=np.int64)
    tfs = np.array([len(p) for p in pos_lists], dtype=np.uint64)
    flat = np.concatenate([np.asarray(p, dtype=np.uint64) for p in pos_lists])
    row_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tfs.astype(np.int64), out=row_offs[1:])
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    starts = row_offs[:-1]
    deltas[starts] = flat[starts]
    pos_bytes = varbyte_encode(deltas)
    got = _decode_doc_positions(doc_ids, tfs, pos_bytes)
    assert len(got) == n
    for i, p in enumerate(pos_lists):
        assert got[i].tolist() == p
