"""Codec invariants: delta+varbyte round-trip (property-tested)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_indexer_spark.index.codec import (
    delta_decode, delta_encode, pack_block, unpack_block, varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == values


@given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=200, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    ids = np.array(sorted(ids), dtype=np.int64)
    assert list(delta_decode(delta_encode(ids))) == list(ids)


@given(
    st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=128, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_pack_block_roundtrip(ids, data):
    ids = sorted(ids)
    n = len(ids)
    tfs = data.draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n))
    dls = data.draw(st.lists(st.integers(1, 100000), min_size=n, max_size=n))
    packed = pack_block(np.array(ids), np.array(tfs), np.array(dls))
    rids, rtfs, rdls = unpack_block(*packed)
    assert list(rids) == ids
    assert list(rtfs) == tfs
    assert list(rdls) == dls


def test_varbyte_compression_ratio():
    # small gaps must stay small on disk: 10k sequential ids ≈ 1 byte each
    ids = np.arange(1_000_000, 1_010_000, dtype=np.int64)
    enc = varbyte_encode(delta_encode(ids).astype(np.uint64))
    assert len(enc) < 10_500  # ~1.0005 bytes/posting
