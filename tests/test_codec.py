from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meilisearch_thai_spark.index.codec import (
    decode_doc_block,
    encode_doc_block,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**63 - 1], dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


def test_varbyte_empty():
    assert varbyte_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert len(varbyte_decode(b"")) == 0


def test_block_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(np.arange(10_000_000, dtype=np.uint64), 5000, replace=False))
    tfs = rng.integers(1, 50, size=5000).astype(np.uint64)
    db, tb = encode_doc_block(ids, tfs)
    out_ids, out_tfs = decode_doc_block(db, tb)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()
    # delta+varbyte on dense-ish ids should compress well below 8 bytes/id
    assert len(db) < 8 * len(ids)


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_property_roundtrip(ids):
    ids = np.sort(np.array(ids, dtype=np.uint64))
    tfs = (ids % 31 + 1).astype(np.uint64)
    db, tb = encode_doc_block(ids, tfs)
    out_ids, out_tfs = decode_doc_block(db, tb)
    assert (out_ids == ids).all() and (out_tfs == tfs).all()
