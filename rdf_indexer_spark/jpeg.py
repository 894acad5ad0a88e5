"""Baseline JPEG (JFIF) decoder in pure numpy — no media libraries.

Closes the last stubbed decode path in :mod:`.multimodal` (VERDICT r3
item 7): baseline sequential DCT, 8-bit, Huffman-coded JPEGs (SOF0) with
1 or 3 components and sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0) decode
for real; progressive (SOF2), arithmetic coding, and 12-bit stay on the
deterministic stub via the normal ValueError fallback.

Everything here is from the public JPEG spec (ITU-T T.81): marker segment
layout §B, Huffman decoding §F.2.2, the zigzag order Figure A.6, and the
IDCT as the exact orthonormal 8×8 DCT-III basis (the spec does not mandate
a particular IDCT approximation; this implementation is deterministic in
the input bytes, which is what the tests pin).

Decode pipeline per MCU: entropy-decode (DC diff category + AC
run/length), dequantize, de-zigzag, IDCT via two 8×8 matrix multiplies
(vectorized over all blocks of a component at once after the scan pass),
level-shift, chroma upsample (nearest), YCbCr→RGB (JFIF/BT.601 full
range).
"""

from __future__ import annotations

import numpy as np

# zigzag index order (T.81 Figure A.6): ZIGZAG[i] = raster position of the
# i-th coefficient in scan order
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: C[k, n] = s(k)·cos((2n+1)kπ/16);
# IDCT of block B (DCT-III) = C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    _C[_k] = _s * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing and marker detection (T.81 §F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None  # RSTn/EOI hit during fill

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # past a marker (or EOF): pad with 1-bits per §F.2.2.5 —
                # a correct stream never *consumes* them into a decision
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2  # unstuff: 0xFF00 is a 0xFF data byte
                else:
                    # a lone 0xFF at end-of-data has no marker byte; treat
                    # it as EOI so the loop switches to 1-bit padding
                    # instead of re-reading the same byte forever
                    self.marker = nxt if nxt is not None else 0xD9
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None
            return
        # marker not yet reached through _fill: scan forward
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _Huff:
    """Canonical Huffman table from the DHT BITS/HUFFVAL arrays, decoded
    with the (code, length) ladder of T.81 §F.2.2.3."""

    def __init__(self, bits: list[int], vals: bytes):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            else:
                self.maxcode[ln] = -1
            code <<= 1
        if k != len(vals):
            raise ValueError("DHT count mismatch")

    def decode(self, br: _BitReader) -> int:
        code = br.get_bits(1)
        ln = 1
        while code > self.maxcode[ln] or self.maxcode[ln] < 0:
            ln += 1
            if ln > 16:
                raise ValueError("bad Huffman code")
            code = (code << 1) | br.get_bits(1)
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 §F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB (grayscale replicated).

    Raises ValueError on anything that is not baseline sequential 8-bit
    Huffman JPEG — the caller (multimodal.decode_media) falls back to the
    stub, same contract as every other decoder."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps = list of (cid, hs, vs, tq)
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        m = data[pos + 1]
        if m == 0xD8 or 0xD0 <= m <= 0xD7:  # SOI / RST outside scan
            pos += 2
            continue
        seglen = int.from_bytes(data[pos + 2:pos + 4], "big")
        body = data[pos + 4:pos + 2 + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                elif pq == 1:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                else:
                    raise ValueError("bad DQT precision")
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = body[i + 17:i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                i += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit baseline supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hs, vs = body[7 + 3 * c] >> 4, body[7 + 3 * c] & 15
                tq = body[8 + 3 * c]
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError("unsupported sampling factor")
                comps.append((cid, hs, vs, tq))
            if nc not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for s in range(ns):
                cs = body[1 + 2 * s]
                td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 15
                scan_tabs[cs] = (td, ta)
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan_tabs, qt,
                huff_dc, huff_ac, restart_interval,
            )
        # else: APPn/COM/etc — skip
        pos += 2 + seglen
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, frame, scan_tabs, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    # per-component coefficient planes (in 8×8 blocks)
    planes = []
    for cid, hs, vs, tq in comps:
        bw, bh = mcux * hs, mcuy * vs
        planes.append(np.zeros((bh, bw, 64), dtype=np.int32))
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for cid, hs, vs, tq in comps:
        if cid not in scan_tabs:
            raise ValueError("SOS missing frame component")
        td, ta = scan_tabs[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("undeclared Huffman table slot")
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            br.restart()
            pred = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            td, ta = scan_tabs[cid]
            hdc, hac = huff_dc[td], huff_ac[ta]
            for by in range(vs):
                for bx in range(hs):
                    blk = planes[ci][my * vs + by, mx * hs + bx]
                    t = hdc.decode(br)
                    diff = _extend(br.get_bits(t), t)
                    pred[ci] += diff
                    blk[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = hac.decode(br)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        blk[k] = _extend(br.get_bits(s), s)
                        k += 1
    # dequantize + de-zigzag + IDCT, vectorized per component
    out_planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("missing quant table")
        coeffs = planes[ci] * qt[tq][None, None, :]
        raster = np.zeros_like(coeffs)
        raster[:, :, ZIGZAG] = coeffs
        bh, bw = raster.shape[:2]
        blocks = raster.reshape(bh, bw, 8, 8).astype(np.float64)
        # IDCT: C.T @ B @ C over every block at once
        px = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        # blocks → full plane
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution (nearest), crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        y = out_planes[0]
        return np.stack([y, y, y], axis=-1)
    y = out_planes[0].astype(np.float64)
    cb = out_planes[1].astype(np.float64) - 128.0
    cr = out_planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
