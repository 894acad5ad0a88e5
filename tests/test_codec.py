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


def test_pack_batch_bit_identical_to_per_group_pack():
    """The vectorized batch packer (build._pack_batch / _pack_stream) must
    produce byte-for-byte the same blocks as packing each (part, term)
    group independently with pack_block — including across Arrow batch
    boundaries (carry buffer) and multi-block groups."""
    import pandas as pd

    from rdf_indexer_spark.index.build import BLOCK_SIZE, _pack_stream

    rng = np.random.default_rng(17)
    rows = []
    for g in range(300):
        part = int(rng.integers(0, 5))
        term = f"t{int(rng.integers(0, 120)):03d}_{g}"
        ln = int(rng.integers(1, 4 * BLOCK_SIZE))
        ids = np.sort(rng.choice(10**7, size=ln, replace=False))
        for d in ids:
            rows.append((part, term, int(d), int(rng.integers(1, 9)),
                         int(rng.integers(1, 500))))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    pdf = pd.DataFrame(rows, columns=["part", "term", "doc_id", "tf", "dl"])
    cuts = [0, 997, 5003, 20011, len(pdf)]
    batches = [pdf.iloc[a:b].reset_index(drop=True)
               for a, b in zip(cuts, cuts[1:]) if b > a]
    got = pd.concat(list(_pack_stream(iter(batches))), ignore_index=True)
    got = got.sort_values(["part", "term", "seq"]).reset_index(drop=True)

    # reference: pack each group independently, block by block
    want_rows = []
    for (part, term), grp in pdf.groupby(["part", "term"], sort=True):
        ids = grp["doc_id"].values.astype(np.int64)
        tfs = grp["tf"].values.astype(np.int64)
        dls = grp["dl"].values.astype(np.int64)
        for seq, start in enumerate(range(0, len(ids), BLOCK_SIZE)):
            bi = ids[start: start + BLOCK_SIZE]
            bt = tfs[start: start + BLOCK_SIZE]
            bd = dls[start: start + BLOCK_SIZE]
            ib, tb, db = pack_block(bi, bt, bd)
            want_rows.append((part, term, seq, len(bi), int(bi[0]),
                              int(bi[-1]), int(bt.max()), int(bd.min()),
                              int(bt.sum()), len(ib) + len(tb) + len(db),
                              ib, tb, db))
    want = pd.DataFrame(want_rows, columns=list(got.columns))
    want = want.sort_values(["part", "term", "seq"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["part", "term", "seq", "n", "first_doc_id", "last_doc_id",
              "max_tf", "dl_min", "tf_sum", "bin_bytes"]:
        assert (got[c].values == want[c].values).all(), c
    for c in ["ids_bin", "tfs_bin", "dls_bin"]:
        assert all(bytes(a) == bytes(b) for a, b in zip(got[c], want[c])), c
