"""Baseline JPEG decoder (rdf_indexer_spark/jpeg.py) — VERDICT r3 item 7.

The fixture is a REAL JFIF stream produced by a from-scratch encoder below
(spec-only: T.81 markers, canonical DHT, zigzag, orthonormal DCT, byte
stuffing) so no media library is needed on either side. Tests:

* decode(encode(img)) ≈ img within quantization error (4:4:4, grayscale,
  4:2:0, restart markers)
* determinism: two decodes are bit-identical
* byte-stuffing (0xFF00) round-trips
* truncated / progressive payloads fall back to the multimodal stub
"""

import numpy as np
import pytest

from rdf_indexer_spark.jpeg import ZIGZAG, _C, decode_jpeg

# simple deterministic quant tables (any values 1..255 are legal)
QLUM = (2 + (np.arange(64) // 8) + (np.arange(64) % 8)).astype(np.int32)
QCHR = (3 + 2 * ((np.arange(64) // 8 + np.arange(64) % 8) // 2)).astype(np.int32)


# -- canonical "flat" Huffman tables: every DC category gets a 4-bit code,
# -- every AC (run,size) symbol an 8-bit code (Kraft-valid: 12<16, 162<256)
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
DC_BITS = [0, 0, 0, 12] + [0] * 12
AC_BITS = [0] * 7 + [len(AC_SYMS)] + [0] * 8
DC_CODE = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
AC_CODE = {sym: (i, 8) for i, sym in enumerate(AC_SYMS)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _cat(v: int) -> int:
    return int(v).bit_length() if v else 0  # |v| category


def _mag(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize, emitted in ZIGZAG scan order. ``q`` is the
    table exactly as serialized in DQT (scan order by spec), and the
    decoder multiplies scan-order coefficients by it element-wise — so
    divide the scan-ordered coefficients by the raw table."""
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    return np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int32)


def _encode_block(bw, zz, pred, dc_code, ac_code):
    diff = int(zz[0]) - pred
    t = _cat(abs(diff)) if diff else 0
    bw.put(*dc_code[t])
    if t:
        bw.put(_mag(diff, t) & ((1 << t) - 1), t)
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_code[0xF0])
            run -= 16
        s = _cat(abs(v))
        bw.put(*ac_code[(run << 4) | s])
        bw.put(_mag(v, s) & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        bw.put(*ac_code[0x00])  # EOB
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht(tc, th, bits, syms):
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits[:16]) + bytes(syms))


def encode_jpeg(img: np.ndarray, sampling=((1, 1), (1, 1), (1, 1)),
                restart_interval: int = 0) -> bytes:
    """Minimal baseline JFIF encoder (test fixture generator)."""
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        sampling = ((1, 1),)
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    quant = [QLUM] + ([QCHR, QCHR] if not gray else [])
    blocks = []
    for ci, (p, (hs, vs)) in enumerate(zip(planes, sampling)):
        # subsample by slicing (decoder upsamples nearest)
        p = p[::vmax // vs, ::hmax // hs]
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        pad = np.pad(np.clip(np.round(p), 0, 255),
                     ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        blocks.append(pad)
    bw = _BitWriter()
    pred = [0] * len(planes)
    n_mcu = mcux * mcuy
    chunks = []
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + ((mi // restart_interval - 1) % 8)]))
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mi, mcux)
        for ci, (hs, vs) in enumerate(sampling):
            q = quant[ci]
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    zz = _fdct_quant(blocks[ci][y0:y0 + 8, x0:x0 + 8], q)
                    _encode_block(bw, zz, pred[ci], DC_CODE, AC_CODE)
                    pred[ci] = int(zz[0])
    bw.flush()
    chunks.append(bytes(bw.out))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(QLUM.astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(QCHR.astype(np.uint8)))
    nc = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, DC_BITS, DC_SYMS) + _dht(1, 0, AC_BITS, AC_SYMS)
    if not gray:
        out += _dht(0, 1, DC_BITS, DC_SYMS) + _dht(1, 1, AC_BITS, AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    for c in chunks:
        out += c
    out += b"\xff\xd9"
    return bytes(out)


def _test_image(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((np.sin(xx / 5.0) * np.cos(yy / 7.0) * 100) + 128).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_roundtrip_444():
    img = _test_image()
    data = encode_jpeg(img)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 48, (err.mean(), err.max())


def test_roundtrip_grayscale():
    img = _test_image()[..., 1]
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (*img.shape, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    err = np.abs(out[..., 0].astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() < 48


def test_roundtrip_420_subsampled():
    img = _test_image(48, 64)
    data = encode_jpeg(img, sampling=((2, 2), (1, 1), (1, 1)))
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is subsampled 2×2 + nearest-upsampled: tolerate more
    assert err.mean() < 12 and err.max() < 96, (err.mean(), err.max())


def test_restart_markers():
    img = _test_image(24, 88)
    plain = decode_jpeg(encode_jpeg(img))
    rst = decode_jpeg(encode_jpeg(img, restart_interval=3))
    np.testing.assert_array_equal(plain, rst)


def test_deterministic_and_pinned():
    """Bit-exact decode within a host: two runs identical. Against the
    stored golden array (tests/fixtures/jpeg_decode_ref.npy) the check is
    tolerance-based, NOT a sha pin: the IDCT matmuls run through BLAS,
    whose CPU-dispatched kernels reorder float summation, so the final
    uint8 rounding can flip a pixel by ±1 right at a .5 boundary on a
    different host (the r4 sha pin broke exactly this way — same code,
    same numpy, new sandbox CPU). A real decoder change (entropy decode,
    dequant, upsampling, color matrix) moves pixels by more than 1,
    which this still catches via the max-diff gate."""
    img = _test_image()
    data = encode_jpeg(img)
    a, b = decode_jpeg(data), decode_jpeg(data)
    np.testing.assert_array_equal(a, b)
    import os

    ref = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "jpeg_decode_ref.npy"))
    assert a.shape == ref.shape and a.dtype == ref.dtype
    diff = np.abs(a.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1, diff.max()  # ulp-at-rounding-boundary only
    frac = (diff != 0).mean()
    # ADVICE r5: 0.05 let a sparse ±1 decoder regression pass silently;
    # BLAS rounding drift across hosts touches well under 1% of pixels
    assert frac <= 0.01, frac  # and only at rounding boundaries


def test_byte_stuffing_roundtrip():
    # an image engineered to produce 0xFF bytes in the entropy stream:
    # random noise maximizes code variety; correctness = decode succeeds
    # and stays within quantization error
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
    data = encode_jpeg(img)
    out = decode_jpeg(data)
    assert out.shape == img.shape


def test_bad_payloads_fall_back_to_stub():
    from rdf_indexer_spark.multimodal import _decode_stub, decode_media

    img = _test_image(16, 16)
    data = encode_jpeg(img)
    # real JPEG through the media router decodes for real
    arr = decode_media(data, "image")
    np.testing.assert_allclose(arr, decode_jpeg(data).astype(np.float32) / 255.0)
    # truncated / corrupted fall back to the stub, not a task failure
    for bad in (data[:20], data[:2], b"\xff\xd8\xff\xc2" + data[4:]):
        got = decode_media(bad, "image")
        np.testing.assert_array_equal(got, _decode_stub(bad, "image"))


def test_malformed_progressive_rejected():
    """A baseline stream relabeled SOF2 is INVALID progressive (its single
    scan has Ss=0, Se=63 — a progressive DC scan must have Se=0) and must
    raise ValueError, not decode garbage."""
    img = _test_image(8, 8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # claim progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_truncated_entropy_stream_terminates():
    """ADVICE r4 (high): a lone 0xFF at end-of-data used to send
    _BitReader._fill into an infinite loop (marker=None reassigned forever).
    It must terminate and switch to the §F.2.2.5 1-bit padding instead."""
    from rdf_indexer_spark.jpeg import _BitReader

    br = _BitReader(b"\x12\xff", 0)
    assert br.get_bits(8) == 0x12
    assert br.get_bits(8) == 0xFF  # padding, not a hang
    # a real JPEG truncated right before the EOI marker byte decodes or
    # falls back — never hangs the executor task
    img = _test_image(8, 8)
    data = encode_jpeg(img)
    from rdf_indexer_spark.multimodal import decode_media

    out = decode_media(data[:-1], "image")
    assert out.shape[-1] == 3


def test_undeclared_tables_raise_valueerror():
    """ADVICE r4 (low): an SOS referencing an undeclared DHT slot (or a
    frame component missing from SOS) must raise ValueError — the
    decode_media fallback contract — not KeyError."""
    img = _test_image(8, 8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xda")
    seglen = int.from_bytes(data[i + 2:i + 4], "big")
    # point every scan component at Huffman slot 3 (never declared)
    for s in range((data[i + 4])):
        data[i + 6 + 2 * s] = 0x33
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


# --- progressive (SOF2) fixtures: from-scratch progressive encoder ---------
# Scan scripts follow T.81 §G.1: DC first (interleaved) then DC refinement;
# per-component AC band first scans then AC refinement with EOB runs and
# buffered correction bits (the jcphuff-documented emission order, restated
# from the spec's decoder algorithm G.1.2.3).

# progressive AC table additionally needs the EOBn symbols (r<<4 | 0)
PAC_SYMS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
PAC_BITS = [0] * 7 + [len(PAC_SYMS)] + [0] * 8
PAC_CODE = {sym: (i, 8) for i, sym in enumerate(PAC_SYMS)}


def _coef_planes(img, sampling):
    """Color-convert, subsample, pad and FDCT-quantize: per-component
    zigzag coefficient arrays (bh, bw, 64) on the MCU-padded grid, plus
    geometry. Mirrors the baseline encoder's front half."""
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        sampling = ((1, 1),)
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    quant = [QLUM] + ([QCHR, QCHR] if not gray else [])
    zz = []
    for ci, (p, (hs, vs)) in enumerate(zip(planes, sampling)):
        p = p[::vmax // vs, ::hmax // hs]
        bh, bw = mcuy * vs, mcux * hs
        pad = np.pad(np.clip(np.round(p), 0, 255),
                     ((0, bh * 8 - p.shape[0]), (0, bw * 8 - p.shape[1])),
                     mode="edge")
        coef = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                coef[by, bx] = _fdct_quant(
                    pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], quant[ci])
        zz.append(coef)
    return zz, sampling, (h, w, hmax, vmax, mcux, mcuy), gray


def _comp_grid(geom, hs, vs):
    """Non-interleaved block-grid (bh, bw) for a component."""
    h, w, hmax, vmax, _mcux, _mcuy = geom
    return -(-(-(-h * vs // vmax)) // 8), -(-(-(-w * hs // hmax)) // 8)


def _sos_seg(comps, ss, se, ah, al):
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


class _RstWriter(_BitWriter):
    """_BitWriter that can flush + emit an RSTn marker mid-stream."""

    def __init__(self):
        super().__init__()
        self.rst = 0

    def restart(self):
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (self.rst % 8)])
        self.rst += 1


def _enc_dc_first(zz, sampling, geom, al, ri=0):
    """Interleaved DC first scan: diffs of DC >> al."""
    _h, _w, _hmax, _vmax, mcux, mcuy = geom
    bw_ = _RstWriter()
    pred = [0] * len(sampling)
    for mi in range(mcux * mcuy):
        if ri and mi and mi % ri == 0:
            bw_.restart()
            pred = [0] * len(sampling)
        my, mx = divmod(mi, mcux)
        for ci, (hs, vs) in enumerate(sampling):
            for by in range(vs):
                for bx in range(hs):
                    v = int(zz[ci][my * vs + by, mx * hs + bx, 0]) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    t = _cat(abs(diff)) if diff else 0
                    bw_.put(*DC_CODE[t])
                    if t:
                        bw_.put(_mag(diff, t) & ((1 << t) - 1), t)
    bw_.flush()
    return bytes(bw_.out)


def _enc_dc_refine(zz, sampling, geom, al, ri=0):
    """Interleaved DC refinement: raw bit al of each DC, no Huffman."""
    _h, _w, _hmax, _vmax, mcux, mcuy = geom
    bw_ = _RstWriter()
    for mi in range(mcux * mcuy):
        if ri and mi and mi % ri == 0:
            bw_.restart()
        my, mx = divmod(mi, mcux)
        for ci, (hs, vs) in enumerate(sampling):
            for by in range(vs):
                for bx in range(hs):
                    v = int(zz[ci][my * vs + by, mx * hs + bx, 0])
                    bw_.put((v >> al) & 1, 1)
    bw_.flush()
    return bytes(bw_.out)


def _enc_ac_first(zz_c, grid, ss, se, al, ri=0):
    """Single-component AC first scan with EOB-run accumulation."""
    bh, bw = grid
    bw_ = _RstWriter()
    eobrun = 0

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            bw_.put(*PAC_CODE[r << 4])
            if r:
                bw_.put(eobrun - (1 << r), r)
            eobrun = 0

    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            flush_eobrun()
            bw_.restart()
        byy, bxx = divmod(bi, bw)
        blk = zz_c[byy, bxx]
        vals = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            vals.append((abs(v) >> al) * (1 if v >= 0 else -1))
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        r = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for i in range(last_nz + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                bw_.put(*PAC_CODE[0xF0])
                r -= 16
            s = _cat(abs(v))
            bw_.put(*PAC_CODE[(r << 4) | s])
            bw_.put(_mag(v, s) & ((1 << s) - 1), s)
            r = 0
        if last_nz < se - ss:
            eobrun += 1
    flush_eobrun()
    bw_.flush()
    return bytes(bw_.out)


def _enc_ac_refine(zz_c, grid, ss, se, al, ri=0):
    """Single-component AC refinement scan: newly-nonzero coefficients as
    ±1 symbols, history coefficients as buffered correction bits flushed
    after the covering symbol (spec G.1.2.3 read back from the decoder
    side; the emission order is the documented jcphuff shape)."""
    bh, bw = grid
    bw_ = _RstWriter()
    eobrun = 0
    be: list[int] = []  # correction bits riding with the pending EOB run

    def flush_eobrun():
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            bw_.put(*PAC_CODE[r << 4])
            if r:
                bw_.put(eobrun - (1 << r), r)
            for bit in be:
                bw_.put(bit, 1)
            be = []
            eobrun = 0

    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            flush_eobrun()
            bw_.restart()
        byy, bxx = divmod(bi, bw)
        blk = zz_c[byy, bxx]
        t_abs, signs = [], []
        for k in range(ss, se + 1):
            v = int(blk[k])
            t_abs.append(abs(v) >> al)
            signs.append(1 if v >= 0 else 0)
        newly = [i for i, t in enumerate(t_abs) if t == 1]
        last_new = newly[-1] if newly else -1
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(t_abs):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= last_new:
                flush_eobrun()
                bw_.put(*PAC_CODE[0xF0])
                r -= 16
                for bit in br:
                    bw_.put(bit, 1)
                br = []
            if t > 1:  # history-nonzero: one correction bit
                br.append(t & 1)
                continue
            # newly nonzero: (run, 1) + sign, then the buffered bits
            flush_eobrun()
            bw_.put(*PAC_CODE[(r << 4) | 1])
            bw_.put(signs[i], 1)
            for bit in br:
                bw_.put(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()
    bw_.flush()
    return bytes(bw_.out)


def encode_jpeg_progressive(img, sampling=((1, 1), (1, 1), (1, 1)),
                            dc_al=1, ac_al=1,
                            bands=((1, 5), (6, 63)),
                            restart_interval=0) -> bytes:
    """Spectral-selection + successive-approximation progressive JFIF
    stream (SOF2) carrying EXACTLY the same quantized coefficients as
    ``encode_jpeg`` — so a correct decoder must reproduce the baseline
    decode bit for bit."""
    zz, sampling, geom, gray = _coef_planes(img, sampling)
    h, w = geom[0], geom[1]
    nc = len(zz)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(QLUM.astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(QCHR.astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, DC_BITS, DC_SYMS) + _dht(1, 0, PAC_BITS, PAC_SYMS)
    if not gray:
        out += _dht(0, 1, DC_BITS, DC_SYMS) + _dht(1, 1, PAC_BITS, PAC_SYMS)
    ri = restart_interval
    if ri:
        out += _seg(0xDD, ri.to_bytes(2, "big"))

    dc_comps = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nc)]
    # scan 1: DC first at Al=dc_al (interleaved)
    out += _sos_seg(dc_comps, 0, 0, 0, dc_al)
    out += _enc_dc_first(zz, sampling, geom, dc_al, ri)
    # AC first scans per component/band at Al=ac_al
    for ci in range(nc):
        grid = _comp_grid(geom, *sampling[ci])
        ta = 0 if ci == 0 else 1
        for ss, se in bands:
            out += _sos_seg([(ci + 1, 0, ta)], ss, se, 0, ac_al)
            out += _enc_ac_first(zz[ci], grid, ss, se, ac_al, ri)
    # DC refinement scans dc_al-1 .. 0 (interleaved)
    for al in range(dc_al - 1, -1, -1):
        out += _sos_seg(dc_comps, 0, 0, al + 1, al)
        out += _enc_dc_refine(zz, sampling, geom, al, ri)
    # AC refinement scans per component/band, ac_al-1 .. 0
    for al in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            grid = _comp_grid(geom, *sampling[ci])
            ta = 0 if ci == 0 else 1
            for ss, se in bands:
                out += _sos_seg([(ci + 1, 0, ta)], ss, se, al + 1, al)
                out += _enc_ac_refine(zz[ci], grid, ss, se, al, ri)
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_equals_baseline_444():
    """The progressive stream carries the same coefficients as the
    baseline one, so both decodes must be IDENTICAL pixels."""
    img = _test_image()
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)


def test_progressive_equals_baseline_grayscale():
    img = _test_image()[..., 1]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)


def test_progressive_equals_baseline_420():
    """4:2:0: the luma non-interleaved AC block grid (ceil(w/8)) is
    SMALLER than the MCU-padded plane (2·ceil(w/16)) at w=40 — exercises
    the §A.2.2 single-component traversal."""
    img = _test_image(40, 40)
    base = decode_jpeg(encode_jpeg(img, sampling=((2, 2), (1, 1), (1, 1))))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, sampling=((2, 2), (1, 1), (1, 1))))
    np.testing.assert_array_equal(prog, base)


def test_progressive_deep_approximation():
    """Three successive-approximation levels (Al=2 first scans, two
    refinement rounds) and a 3-band spectral split."""
    img = _test_image(24, 32)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, dc_al=2, ac_al=2, bands=((1, 2), (3, 20), (21, 63))))
    np.testing.assert_array_equal(prog, base)


def test_progressive_noise_eobrun_stress():
    """Random noise maximizes symbol variety (ZRL runs, EOB runs spanning
    many blocks, interleaved correction bits) — decode must still equal
    the baseline decode exactly."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)
    # and an almost-flat image maximizes long EOB runs
    flat = np.full((48, 64, 3), 130, np.uint8)
    flat[5, 7] = 240
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(flat)),
        decode_jpeg(encode_jpeg(flat)))


def test_progressive_deterministic():
    img = _test_image(20, 28)
    data = encode_jpeg_progressive(img)
    np.testing.assert_array_equal(decode_jpeg(data), decode_jpeg(data))


def test_progressive_restart_markers():
    """RSTn inside progressive scans: predictors and EOB runs reset per
    interval on every scan type; decode equals the no-restart decode."""
    img = _test_image(32, 40)
    plain = decode_jpeg(encode_jpeg_progressive(img))
    rst = decode_jpeg(encode_jpeg_progressive(img, restart_interval=3))
    np.testing.assert_array_equal(plain, rst)


def test_progressive_undeclared_ac_table_raises_valueerror():
    """An AC refinement scan referencing an undeclared DHT slot must raise
    ValueError (the decode_media fallback contract), not AttributeError."""
    img = _test_image(16, 16)
    data = bytearray(encode_jpeg_progressive(img))
    # point every single-component (AC) scan at Huffman slot 3
    i = 0
    while True:
        i = data.find(b"\xff\xda", i)
        if i < 0:
            break
        ns = data[i + 4]
        if ns == 1:
            data[i + 6] = 0x03  # td=0, ta=3 (never declared)
        i += 2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))
    from rdf_indexer_spark.multimodal import _decode_stub, decode_media

    bad = bytes(data)
    np.testing.assert_array_equal(
        decode_media(bad, "image"), _decode_stub(bad, "image"))
