"""Posting-block physical codec: delta + variable-byte, numpy-vectorized.

Per-term posting lists are packed into blocks of ``BLOCK_SIZE`` postings.
Within a block, doc_ids are delta-encoded (strictly increasing) and
varbyte-packed; term frequencies and document lengths are varbyte-packed
directly. This is the standard inverted-file layout (Manning/Raghavan/Schütze
ch.5; Ding & Suel 2011 for the block-max bound stored alongside).

The reference keeps this inside Lucene; no reference code corresponds —
cited design precedent only.

Everything here is pure numpy (no Python loops over postings): encoding
computes per-value byte widths, allocates one output buffer, and scatters
7-bit groups with vectorized shifts.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_parts(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varbyte over a WHOLE value array, returning the raw
    ``uint8`` buffer plus per-value byte offsets (length n+1).

    Because varbyte is per-value independent, the concatenation of the
    encodings of any consecutive value ranges equals the whole-array
    encoding split at ``offsets`` — which lets a batch packer encode once
    and slice per-block ranges out (build._pack_batch)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    # byte width per value: ceil(bits/7), minimum 1.
    # bit_length via log2 on float is unsafe near 2^53; use a loop over the
    # 10 possible widths instead (still vectorized per width).
    widths = np.ones(v.shape, dtype=np.int64)
    for w in range(1, 10):
        widths[v >= (np.uint64(1) << np.uint64(7 * w))] = w + 1
    offsets = np.concatenate(([0], np.cumsum(widths)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    for b in range(int(widths.max())):
        sel = widths > b
        idx = offsets[:-1][sel] + b
        chunk = (v[sel] >> np.uint64(7 * b)) & np.uint64(0x7F)
        last = widths[sel] == b + 1
        chunk = chunk.astype(np.uint8)
        chunk[last] |= 0x80
        out[idx] = chunk
    return out, offsets


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte: little-endian 7-bit groups, MSB set on the last
    byte of each value (so decode can find value boundaries with a mask)."""
    return varbyte_parts(values)[0].tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`, vectorized."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.array([], dtype=np.uint64)
    ends = np.flatnonzero(raw & 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    widths = ends - starts + 1
    max_w = int(widths.max())
    payload = raw & 0x7F
    for b in range(max_w):
        sel = widths > b
        idx = starts[sel] + b
        values[sel] |= payload[idx].astype(np.uint64) << np.uint64(7 * b)
    return values


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing doc_ids → first value + gaps (gap ≥ 1)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    out = np.empty_like(d)
    out[0] = d[0]
    np.subtract(d[1:], d[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.int64))


def pack_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> tuple[bytes, bytes, bytes]:
    """One block: (delta+varbyte doc_ids, varbyte tfs, varbyte dls)."""
    return (
        varbyte_encode(delta_encode(doc_ids).astype(np.uint64)),
        varbyte_encode(tfs),
        varbyte_encode(dls),
    )


def unpack_block(ids_bin: bytes, tfs_bin: bytes, dls_bin: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = delta_decode(varbyte_decode(ids_bin))
    return ids, varbyte_decode(tfs_bin).astype(np.int64), varbyte_decode(dls_bin).astype(np.int64)


def delta_encode_segmented(flat: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Delta-encode a flat concatenation of sorted segments, resetting (raw
    value) at each segment start — the positional-postings layout: one
    segment per posting, ``starts`` = flat index of each posting's first
    position (positions within a posting are strictly increasing)."""
    flat = np.asarray(flat, dtype=np.int64)
    out = flat.copy()
    if len(flat) > 1:
        out[1:] = flat[1:] - flat[:-1]
    out[starts] = flat[starts]
    return out


def unpack_positions(pos_bin: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of the segmented positional encoding for ONE block.

    ``tfs`` are the block's term frequencies: posting i owns exactly
    ``tfs[i]`` positions, so the segment boundaries are implied by data the
    block already stores — no extra length column. Returns ``(flat, offs)``
    where ``flat`` is every position in posting order and posting i's
    positions are ``flat[offs[i]:offs[i+1]]`` (``offs`` has len(tfs)+1)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(tfs)))
    deltas = varbyte_decode(pos_bin).astype(np.int64)
    if deltas.size != offs[-1]:
        raise ValueError(
            f"positions payload has {deltas.size} values, tf sum is {offs[-1]}")
    if deltas.size == 0:
        return deltas, offs
    cs = np.cumsum(deltas)
    starts = offs[:-1]
    base = cs[starts] - deltas[starts]
    return cs - np.repeat(base, tfs), offs
