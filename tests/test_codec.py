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
                              ib, tb, db, None))
    want = pd.DataFrame(want_rows, columns=list(got.columns))
    want = want.sort_values(["part", "term", "seq"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["part", "term", "seq", "n", "first_doc_id", "last_doc_id",
              "max_tf", "dl_min", "tf_sum", "bin_bytes"]:
        assert (got[c].values == want[c].values).all(), c
    for c in ["ids_bin", "tfs_bin", "dls_bin"]:
        assert all(bytes(a) == bytes(b) for a, b in zip(got[c], want[c])), c

@given(
    st.lists(st.lists(st.integers(0, 2**20), min_size=1, max_size=12),
             min_size=0, max_size=60),
)
@settings(max_examples=100, deadline=None)
def test_segmented_positions_roundtrip(segments):
    """delta_encode_segmented + varbyte ↔ unpack_positions is exact for any
    list of sorted per-posting position lists (segment bounds implied by
    tf = len(segment), the on-disk layout)."""
    from rdf_indexer_spark.index.codec import (
        delta_encode_segmented, unpack_positions,
    )

    segments = [sorted(set(s)) for s in segments if s]
    tfs = np.array([len(s) for s in segments], dtype=np.int64)
    flat = (np.concatenate([np.array(s, dtype=np.int64) for s in segments])
            if segments else np.array([], dtype=np.int64))
    starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    enc = varbyte_encode(delta_encode_segmented(flat, starts).astype(np.uint64))
    got_flat, got_offs = unpack_positions(enc, tfs)
    assert list(got_flat) == list(flat)
    assert list(got_offs) == list(np.concatenate(([0], np.cumsum(tfs))))


def test_segmented_positions_tf_mismatch_rejected():
    from rdf_indexer_spark.index.codec import unpack_positions

    enc = varbyte_encode(np.array([3, 1, 5], dtype=np.uint64))
    with np.testing.assert_raises(ValueError):
        unpack_positions(enc, np.array([2], dtype=np.int64))  # tf sum 2 != 3


def test_pack_batch_positional_bit_identical():
    """Positional variant of the bit-identity test: _pack_stream with a
    `positions` column must emit, per block, exactly the per-group
    varbyte(delta-with-reset) encoding of that block's position lists —
    including groups that straddle Arrow batch boundaries — and leave the
    CORE columns (incl. bin_bytes) byte-identical to the non-positional
    packer."""
    import pandas as pd

    from rdf_indexer_spark.index.build import BLOCK_SIZE, _pack_stream
    from rdf_indexer_spark.index.codec import (
        delta_encode_segmented, varbyte_encode,
    )

    rng = np.random.default_rng(23)
    rows = []
    for g in range(120):
        part = int(rng.integers(0, 4))
        term = f"t{int(rng.integers(0, 60)):03d}_{g}"
        ln = int(rng.integers(1, 3 * BLOCK_SIZE))
        ids = np.sort(rng.choice(10**6, size=ln, replace=False))
        for d in ids:
            tf = int(rng.integers(1, 6))
            pos = np.sort(rng.choice(5000, size=tf, replace=False))
            rows.append((part, term, int(d), tf, int(rng.integers(1, 500)),
                         pos.tolist()))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    pdf = pd.DataFrame(
        rows, columns=["part", "term", "doc_id", "tf", "dl", "positions"])
    cuts = [0, 499, 2003, len(pdf)]
    batches = [pdf.iloc[a:b].reset_index(drop=True)
               for a, b in zip(cuts, cuts[1:]) if b > a]
    got = pd.concat(list(_pack_stream(iter(batches))), ignore_index=True)
    got = got.sort_values(["part", "term", "seq"]).reset_index(drop=True)

    # non-positional packer on the same rows: core columns must not move
    flat = pd.concat(
        list(_pack_stream(iter([pdf.drop(columns=["positions"])]))),
        ignore_index=True).sort_values(
            ["part", "term", "seq"]).reset_index(drop=True)
    for c in ["part", "term", "seq", "n", "first_doc_id", "last_doc_id",
              "max_tf", "dl_min", "tf_sum", "bin_bytes"]:
        assert (got[c].values == flat[c].values).all(), c
    for c in ["ids_bin", "tfs_bin", "dls_bin"]:
        assert all(bytes(a) == bytes(b)
                   for a, b in zip(got[c], flat[c])), c
    assert flat["pos_bin"].isna().all()

    # reference pos_bin: per (part, term) group, per block, segmented
    # delta + varbyte over that block's concatenated position lists
    want = {}
    for (part, term), grp in pdf.groupby(["part", "term"], sort=True):
        plists = list(grp["positions"].values)
        for seq, start in enumerate(range(0, len(grp), BLOCK_SIZE)):
            blk = plists[start: start + BLOCK_SIZE]
            tfs = np.array([len(p) for p in blk], dtype=np.int64)
            bflat = np.concatenate(
                [np.array(p, dtype=np.int64) for p in blk])
            starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
            want[(part, term, seq)] = bytes(varbyte_encode(
                delta_encode_segmented(bflat, starts).astype(np.uint64)))
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert bytes(r["pos_bin"]) == want[
            (r["part"], r["term"], r["seq"])], (r["part"], r["term"], r["seq"])
