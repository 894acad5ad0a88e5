"""PNG decoder in pure numpy + stdlib ``zlib`` — no media libraries.

Closes the PNG decode path in :mod:`.multimodal` (VERDICT r4 item 6), the
same way r4's :mod:`.jpeg` closed baseline JPEG: everything here is from
the public PNG spec (W3C PNG 2nd ed. / RFC 2083) — the 8-byte signature,
chunk layout §5, IHDR fields §11.2.2, the five scanline filters §9
(None/Sub/Up/Average/Paeth with the exact Paeth predictor tie-breaking),
and the Adam7 skip (interlaced images raise ``ValueError`` and fall back
to the multimodal stub, like progressive JPEG does).

Supported for real: non-interlaced images, bit depths 8 and 16 (16-bit
samples are scaled to 8 by taking the high byte, the spec-sanctioned
approximation), all five color types — greyscale (0), truecolor (2),
palette (3, via PLTE), grey+alpha (4), RGBA (6) — plus sub-8-bit depths
1/2/4 for greyscale and palette rows (unpacked MSB-first per §7.2).
``IDAT`` chunks concatenate into one zlib stream (§10.3).

Filters are inherently sequential across rows (each row's reconstruction
feeds the next row's Up/Average/Paeth), so the row loop is Python; within
a row, None/Up are whole-row vectorized and Sub is a per-byte-lane
``cumsum`` mod 256. Average/Paeth recurse on the previous *pixel* too and
run as a short per-row byte loop — decode cost is O(bytes) either way and
this runs inside Arrow-batched executor kernels on opaque payload columns,
where a hung or task-killing decode (not throughput) is the failure mode
that matters (see decode_media's fallback contract).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type (§11.2.2)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (§9.4) — the spec's exact ordering of the ties."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-row filters over the decompressed byte stream.

    ``raw`` is h rows of (1 filter byte + stride data bytes). Returns the
    (h, stride) reconstructed bytes."""
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)  # headroom for the +/- arithmetic
    recon = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(ftypes[y])
        row = data[y]
        if ft == 0:  # None
            cur = row
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        recon[y] = cur
        prev = cur
    return recon


def _unpack_bits(row_bytes: np.ndarray, depth: int, w: int) -> np.ndarray:
    """MSB-first sub-byte sample unpacking (§7.2) → (w,) ints 0..2^depth-1."""
    bits = np.unpackbits(row_bytes.astype(np.uint8), axis=-1)
    per = bits.reshape(row_bytes.shape[0], -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (per * weights).sum(axis=2)[:, :w]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) uint8 for greyscale, (H, W, C) uint8 otherwise.

    Raises ``ValueError`` on anything outside the supported envelope
    (interlaced, malformed, truncated) so :func:`.multimodal.decode_media`
    falls back to its deterministic stub instead of failing the task."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG")
    pos = len(_SIGNATURE)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if w == 0 or h == 0 or comp != 0 or filt != 0:
        raise ValueError("bad IHDR")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")  # Adam7 → stub
    if ctype_n not in _CHANNELS:
        raise ValueError(f"bad color type {ctype_n}")
    channels = _CHANNELS[ctype_n]
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and ctype_n not in (0, 3)
    ) or (depth == 16 and ctype_n == 3):
        raise ValueError(f"unsupported depth {depth} for color type {ctype_n}")

    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from None
    bits_per_px = depth * channels
    stride = (w * bits_per_px + 7) // 8
    bpp = max(bits_per_px // 8, 1)  # filter lane width (§9.2)
    if len(raw) != h * (1 + stride):
        raise ValueError("IDAT size mismatch")
    recon = _unfilter(raw, h, stride, bpp)

    if depth < 8:
        samples = _unpack_bits(recon, depth, w)  # (h, w), 0..2^depth-1
        if ctype_n == 3:
            if plte is None:
                raise ValueError("palette image without PLTE")
            if samples.max(initial=0) >= len(plte):
                raise ValueError("palette index out of range")
            return plte[samples]  # (h, w, 3)
        # greyscale: scale to full 8-bit range (§12.5 sample depth scaling)
        return (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if depth == 16:
        # high byte = spec-approved 16→8 reduction
        px = recon.reshape(h, w, channels, 2)[..., 0].astype(np.uint8)
    else:
        px = recon.reshape(h, w, channels).astype(np.uint8)
    if ctype_n == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px[:, :, 0]
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if channels == 1:
        return px[:, :, 0]
    return px
