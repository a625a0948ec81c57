"""Zero-dependency baseline JPEG codec (stdlib + numpy).

Closes the largest honest gap in the multimodal path: web images are
overwhelmingly JPEG, and until r5 a declared ``image/jpeg`` payload
could only raise (strict) or fall back to the stub feature. This
module decodes baseline sequential JFIF — the format >90% of web JPEGs
use — and encodes it, so the perceptual-hash / cross-format-dedup /
transcode machinery covers the dominant web format with planted-truth
tests (an image stored as BMP and as JPEG hashes to the same 64-bit
average-hash).

Scope (disclosed, enforced with NotImplementedError so the non-strict
corpus path routes such rows to NULL instead of crashing the job):

- decode: baseline DCT (SOF0), 8-bit samples, grayscale or YCbCr,
  sampling factors 1-2 in each axis (covers 4:4:4 / 4:2:2 / 4:4:0 /
  4:2:0), restart intervals (DRI/RSTn). Progressive (SOF2),
  arithmetic coding, 12-bit precision, and >3 components raise.
- encode: baseline sequential, 4:4:4, Annex K quantization tables
  scaled by libjpeg-style quality, Annex K Huffman tables.

The DCT/IDCT, color transforms, quantization, and upsampling are
vectorized numpy over all blocks at once; only the entropy coder is a
per-symbol Python loop (Huffman is inherently sequential within a
restart segment). That is the right trade for a correctness kernel:
on a production cluster the same ``mapInPandas`` seam swaps in
libjpeg-turbo, and nothing outside this module changes.

Format reference: ITU-T T.81 (public spec); tables from its Annex K.
No reference-repo analog (the Go reference has no media path).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

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
_UNZIG = np.argsort(ZIGZAG)

_QL_BASE = np.array([  # luminance, Annex K.1
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC_BASE = np.array([  # chrominance, Annex K.2
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# standard Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# 8x8 DCT-II basis: _DCT_M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_k = np.arange(8)
_DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_DCT_M[0] *= 1.0 / np.sqrt(2.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL_BASE * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC_BASE * scale + 50) // 100, 1, 255)
    return ql, qc


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical order (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical MINCODE/MAXCODE/VALPTR decoder (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment; unstuffs FF00,
    stops at any other marker (leaves it for the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                # past a marker: the spec pads with 1-bits (F.2.2.5's
                # behavior for truncated segments is undefined; raising
                # on overread happens via receive() users noticing EOB)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            if self.pos >= len(self.data):
                self.marker = 0xD9  # treat EOF as EOI
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                elif nxt == 0xFF:  # fill byte
                    self.pos += 1
                else:
                    self.marker = nxt  # stop: RSTn / EOI / next header
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        self.bitbuf = 0
        if self.marker is None:
            # scan forward to the marker (skip any pad bits already read)
            while self.pos < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.pos + 1 < len(self.data)
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    break
                self.pos += 1
        else:
            self.marker = None
            # pos currently sits ON the 0xFF of the marker? No: _fill
            # leaves pos at the 0xFF; normalize by searching back/fwd
            while self.pos < len(self.data) and self.data[self.pos] != 0xFF:
                self.pos += 1
        if self.pos + 1 >= len(self.data) or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("JPEG: expected restart marker")
        self.pos += 2
        self.marker = None


def _huff_decode(r: _BitReader, d: _HuffDecoder) -> int:
    code = r.bit()
    length = 1
    while code > d.maxcode[length]:
        if length >= 16:
            raise ValueError("JPEG: invalid Huffman code")
        code = (code << 1) | r.bit()
        length += 1
    return d.vals[d.valptr[length] + code - d.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB.

    Grayscale JPEGs are broadcast to 3 channels so every image codec in
    the registry returns the same shape. Progressive / arithmetic /
    12-bit / exotic sampling raise NotImplementedError (routed to NULL
    by the non-strict corpus path); malformed structure raises
    ValueError."""
    d = payload
    if len(d) < 4 or d[0] != 0xFF or d[1] != 0xD8:
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hi, vi, tq)]
    restart_interval = 0

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seg_len,) = struct.unpack(">H", d[pos : pos + 2])
        seg = d[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables")
                qtabs[tq] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline (extended) sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError("JPEG: only gray/YCbCr")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError("JPEG: sampling factors > 2")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG: only baseline sequential (SOF0/1)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si : 3 + 2 * si]
                sel[cs] = (tt >> 4, tt & 0xF)
            data_start = pos + seg_len
            return _decode_scan(
                d, data_start, frame, sel, qtabs, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("JPEG: no scan found")


def _decode_scan(d, pos, frame, sel, qtabs, dc_tabs, ac_tabs, ri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    r = _BitReader(d, pos)

    # per component: coefficient grid (blocks_y, blocks_x, 64)
    grids = []
    for _cid, hi, vi, _tq in comps:
        grids.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32))
    preds = [0] * len(comps)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                r.restart()
                preds = [0] * len(comps)
            for ci, (cid, hi, vi, _tq) in enumerate(comps):
                dc_d = dc_tabs.get(sel[cid][0])
                ac_d = ac_tabs.get(sel[cid][1])
                if dc_d is None or ac_d is None:
                    raise ValueError("JPEG: missing Huffman table")
                for by in range(vi):
                    for bx in range(hi):
                        blk = grids[ci][my * vi + by, mx * hi + bx]
                        t = _huff_decode(r, dc_d)
                        if t > 11:
                            raise ValueError("JPEG: bad DC category")
                        diff = _extend(r.receive(t), t)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_d)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG: AC run overflow")
                            blk[k] = _extend(r.receive(ss), ss)
                            k += 1
            mcu_count += 1

    # vectorized: dequantize + dezigzag + IDCT per component
    planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError("JPEG: missing quant table")
        # grid and the stored quant table are both in zigzag order
        coeffs = grids[ci].astype(np.float64) * qtabs[tq][None, None, :]
        spatial = np.zeros_like(coeffs)
        spatial[:, :, ZIGZAG] = coeffs  # dezigzag: raster[ZIGZAG[i]] = zig[i]
        by, bx = spatial.shape[:2]
        blocks = spatial.reshape(by, bx, 8, 8)
        # IDCT: M.T @ B @ M, batched
        pix = np.einsum("ux,mnuv,vy->mnxy", _DCT_M, blocks, _DCT_M) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU-grid resolution
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.stack([y, y, y], axis=2)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        rgb = np.stack(
            [y + 1.402 * cr,
             y - 0.344136 * cb - 0.714136 * cr,
             y + 1.772 * cb],
            axis=2,
        )
    return np.clip(np.rint(rgb[:h, :w]), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:  # pad the final partial byte with 1-bits (T.81 F.1.2.3)
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) → (by, bx, 64) zigzagged
    quantized int coefficients, fully vectorized."""
    H, W = plane.shape
    by, bx = H // 8, W // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ux,mnxy,vy->mnuv", _DCT_M, blocks, _DCT_M)
    zz = coeffs.reshape(by, bx, 64)[:, :, ZIGZAG]
    # zz is zigzag-ordered; qtab arrives in raster order → reorder
    q = np.rint(zz / qtab[ZIGZAG].astype(np.float64)[None, None, :]).astype(np.int64)
    return q


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → baseline sequential JFIF bytes (4:4:4,
    Annex K Huffman tables, libjpeg-style quality scaling)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)

    rgbf = img.astype(np.float64)
    rf, gf, bf = rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2]
    y = 0.299 * rf + 0.587 * gf + 0.114 * bf - 128.0
    cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf
    cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf

    # pad to block multiple by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    planes = [(pad(y), ql), (pad(cb), qc), (pad(cr), qc)]
    quantized = [_fdct_quant(p, q) for p, q in planes]

    dc_l = _build_huff_codes(*_DC_L)
    ac_l = _build_huff_codes(*_AC_L)
    dc_c = _build_huff_codes(*_DC_C)
    ac_c = _build_huff_codes(*_AC_C)
    huff = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    wtr = _BitWriter()
    preds = [0, 0, 0]
    by, bx = ph // 8, pw // 8
    for myx in range(by):
        for mxx in range(bx):
            for ci in range(3):
                blk = quantized[ci][myx, mxx]
                dct_codes, act_codes = huff[ci]
                diff = int(blk[0]) - preds[ci]
                preds[ci] = int(blk[0])
                t = _category(diff)
                code, ln = dct_codes[t]
                wtr.put(code, ln)
                if t:
                    wtr.put(_magnitude_bits(diff, t), t)
                run = 0
                nz = np.nonzero(blk[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act_codes[0xF0]  # ZRL
                        wtr.put(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = act_codes[(run << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(_magnitude_bits(v, s), s)
                    run = 0
                if last < 63:
                    code, ln = act_codes[0x00]  # EOB
                    wtr.put(code, ln)
    wtr.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # APP0/JFIF: version 1.1, aspect-ratio units, 1x1 density, no thumbnail
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT entries are stored in zigzag order; _quality_tables returns
    # raster order, so emit tbl[ZIGZAG]
    for tid, tbl in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([tid]) + bytes(
            tbl[ZIGZAG].astype(np.uint8)
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 1x1 sampling (4:4:4)
    for tc_th, (bits, vals) in ((0x00, _DC_L), (0x10, _AC_L),
                                (0x01, _DC_C), (0x11, _AC_C)):
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tt])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
