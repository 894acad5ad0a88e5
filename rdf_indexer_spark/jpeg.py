"""Baseline + progressive JPEG (JFIF) decoder in pure numpy — no media
libraries.

Closes the stubbed decode paths in :mod:`.multimodal`: baseline
sequential DCT (SOF0/SOF1) and progressive DCT (SOF2), 8-bit,
Huffman-coded, 1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 /
4:2:0) decode for real; arithmetic coding, hierarchical, lossless and
12-bit stay on the deterministic stub via the normal ValueError fallback.

Everything here is from the public JPEG spec (ITU-T T.81): marker segment
layout §B, Huffman decoding §F.2.2, progressive successive approximation
§G.1.2 (DC bit-appending G.1.2.1, AC first-scan EOB runs G.1.2.2, AC
refinement correction bits G.1.2.3), the zigzag order Figure A.6, and the
IDCT as the exact orthonormal 8×8 DCT-III basis (the spec does not mandate
a particular IDCT approximation; this implementation is deterministic in
the input bytes, which is what the tests pin).

Decode pipeline: entropy-decode every scan into per-component zigzag
coefficient planes (baseline = one interleaved scan; progressive =
repeated spectral-selection/approximation passes over the same planes),
then dequantize, de-zigzag, IDCT via two 8×8 matrix multiplies
(vectorized over all blocks of a component at once), level-shift, chroma
upsample (nearest), YCbCr→RGB (JFIF/BT.601 full range).
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
    """Baseline or progressive JFIF bytes → (H, W, 3) uint8 RGB
    (grayscale replicated).

    Raises ValueError on anything that is not 8-bit Huffman
    sequential-baseline (SOF0/1) or progressive (SOF2) JPEG — the caller
    (multimodal.decode_media) falls back to the stub, same contract as
    every other decoder."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps = list of (cid, hs, vs, tq)
    progressive = False
    planes = None  # progressive: per-component zigzag coefficient planes
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker sync lost")
        m = data[pos + 1]
        if m == 0xD8 or 0xD0 <= m <= 0xD7:  # SOI / RST outside scan
            pos += 2
            continue
        if m == 0xD9:  # EOI — progressive streams end here
            break
        if pos + 4 > len(data):
            break
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
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
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
            progressive = m == 0xC2
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG process (arithmetic/lossless/hier)")
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            if not progressive:
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
            if planes is None:
                planes = _alloc_planes(frame)
            pos = _decode_progressive_scan(
                data, pos + 2 + seglen, body, frame, planes,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        # else: APPn/COM/etc — skip
        pos += 2 + seglen
    if progressive and planes is not None:
        h, w, comps = frame
        return _reconstruct(planes, comps, qt, h, w)
    raise ValueError("no SOS marker")


def _geometry(frame):
    """(hmax, vmax, mcux, mcuy) for the frame."""
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _alloc_planes(frame) -> list[np.ndarray]:
    """MCU-padded per-component zigzag coefficient planes."""
    _, _, mcux, mcuy = _geometry(frame)
    return [np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
            for _, hs, vs, _ in frame[2]]


def _decode_scan(data, pos, frame, scan_tabs, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _geometry(frame)
    br = _BitReader(data, pos)
    # per-component coefficient planes (in 8×8 blocks)
    planes = _alloc_planes(frame)
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
    return _reconstruct(planes, comps, qt, h, w)


def _reconstruct(planes, comps, qt, h, w) -> np.ndarray:
    """Zigzag coefficient planes → RGB: dequantize + de-zigzag + IDCT
    (vectorized per component), upsample, color-convert."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
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


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips stuffed
    0xFF00, fill 0xFFs and RSTn left inside entropy data)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    raise ValueError("no marker after scan data")


def _decode_progressive_scan(data, pos, body, frame, planes,
                             huff_dc, huff_ac, restart_interval) -> int:
    """Decode ONE progressive scan (T.81 §G.1.2) into ``planes`` and
    return the position of the marker following its entropy data.

    DC scans (Ss=0) may interleave all frame components per MCU; AC scans
    carry exactly one component in the component's own block-raster order.
    First scans (Ah=0) code values scaled down by 2^Al; refinement scans
    (Ah>0) append one magnitude bit per coefficient — bit-OR for DC
    (two's complement, G.1.2.1), sign-directed correction bits for AC
    (G.1.2.3, the libjpeg-documented algorithm shape)."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy = _geometry(frame)
    ns = body[0]
    scan_comps = []  # (ci, td, ta) in scan order
    for s in range(ns):
        cs = body[1 + 2 * s]
        td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 15
        ci = next((i for i, c in enumerate(comps) if c[0] == cs), None)
        if ci is None:
            raise ValueError("SOS component not in frame")
        scan_comps.append((ci, td, ta))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    a = body[3 + 2 * ns]
    ah, al = a >> 4, a & 15
    if ss > se or se > 63 or al > 13:
        raise ValueError("bad spectral selection")
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    br = _BitReader(data, pos)

    if ss == 0:
        _prog_dc_scan(br, scan_comps, frame, planes, huff_dc, ah, al,
                      restart_interval)
    else:
        ci, _td, ta = scan_comps[0]
        # AC refinement scans Huffman-code their run/EOB symbols too —
        # the table is required for BOTH passes (only DC refinement is
        # table-free), and the error must be ValueError so decode_media's
        # malformed-input fallback contract holds
        if ta not in huff_ac:
            raise ValueError("undeclared Huffman table slot")
        _prog_ac_scan(br, planes[ci], huff_ac[ta], ss, se, ah, al,
                      _comp_blocks(frame, ci), restart_interval)
    return _next_marker(data, br.pos)


def _comp_blocks(frame, ci) -> tuple[int, int]:
    """Non-interleaved block-grid dims (bh, bw) for component ``ci`` —
    ceil(scaled component size / 8), NOT the MCU-padded plane shape
    (T.81 §A.2.2): single-component scans code exactly these blocks."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _cid, hs, vs, _tq = comps[ci]
    cw = -(-w * hs // hmax)
    ch = -(-h * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _prog_dc_scan(br, scan_comps, frame, planes, huff_dc, ah, al,
                  restart_interval):
    """DC scan (Ss=0): first pass decodes DC diffs scaled by 2^Al
    (G.1.2.1); refinement appends bit Al via two's-complement OR.
    Interleaved over MCUs when ns>1, else the component's own raster."""
    _h, _w, comps = frame
    _hmax, _vmax, mcux, mcuy = _geometry(frame)
    if ah == 0:
        for _ci, td, _ta in scan_comps:
            if td not in huff_dc:
                raise ValueError("undeclared Huffman table slot")
    pred = [0] * len(scan_comps)

    def dc_unit(blk, si, td):
        if ah == 0:
            t = huff_dc[td].decode(br)
            diff = _extend(br.get_bits(t), t)
            pred[si] += diff
            blk[0] = pred[si] << al
        else:
            if br.get_bits(1):
                blk[0] |= 1 << al

    if len(scan_comps) > 1:
        for mi in range(mcux * mcuy):
            if restart_interval and mi and mi % restart_interval == 0:
                br.restart()
                pred = [0] * len(scan_comps)
            my, mx = divmod(mi, mcux)
            for si, (ci, td, _ta) in enumerate(scan_comps):
                _cid, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        dc_unit(planes[ci][my * vs + by, mx * hs + bx],
                                si, td)
    else:
        ci, td, _ta = scan_comps[0]
        bh, bw = _comp_blocks(frame, ci)
        for bi in range(bh * bw):
            if restart_interval and bi and bi % restart_interval == 0:
                br.restart()
                pred = [0] * len(scan_comps)
            byy, bxx = divmod(bi, bw)
            dc_unit(planes[ci][byy, bxx], 0, td)


def _prog_ac_scan(br, plane, hac, ss, se, ah, al, dims,
                  restart_interval):
    """AC scan over one component's block raster. First pass (Ah=0):
    run/size symbols with EOB-run escapes, values scaled by 2^Al
    (G.1.2.2). Refinement (Ah>0): the correction-bit walk of G.1.2.3 —
    history-nonzero coefficients absorb one magnitude bit each, zero
    coefficients are created as ±2^Al."""
    bh, bw = dims
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def refine_nonzero(blk, k):
        # one correction bit for a history-nonzero coefficient: move its
        # magnitude toward the true value iff the bit is 1 and bit Al is
        # not already set
        if br.get_bits(1) and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    for bi in range(bh * bw):
        if restart_interval and bi and bi % restart_interval == 0:
            br.restart()
            eobrun = 0
        byy, bxx = divmod(bi, bw)
        blk = plane[byy, bxx]
        if ah == 0:  # first AC pass
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = hac.decode(br)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.get_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past Se")
                blk[k] = _extend(br.get_bits(s), s) << al
                k += 1
        else:  # AC refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = hac.decode(br)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.get_bits(r)
                            break
                        val = 0  # ZRL: pass 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("bad AC refinement size")
                        val = p1 if br.get_bits(1) else m1
                    while k <= se:
                        if blk[k] != 0:
                            refine_nonzero(blk, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val != 0:
                        if k > se:
                            raise ValueError("AC refinement run past Se")
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if blk[k] != 0:
                        refine_nonzero(blk, k)
                    k += 1
                eobrun -= 1
