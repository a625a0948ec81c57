"""Baseline JPEG codec (operators/jpeg.py) + its multimodal integration.

The container has no independent JPEG implementation to diff against,
so conformance is pinned two ways: (a) encoder→decoder roundtrips with
quality-scaled error bounds, and (b) HAND-CRAFTED byte streams — built
in this file from the T.81 marker layout with spec-computed DC values,
NOT by calling encode_jpeg — for the paths the engine's encoder never
emits (grayscale single-component scans, 4:2:0 subsampled MCUs,
restart intervals), so a matched encoder/decoder bug pair cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deduplicator_go_spark.operators import multimodal
from deduplicator_go_spark.operators.jpeg import (
    _AC_C,
    _AC_L,
    _DC_C,
    _DC_L,
    _QC_BASE,
    _QL_BASE,
    ZIGZAG,
    _BitWriter,
    _build_huff_codes,
    _category,
    _magnitude_bits,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(h + w - 2, 1)],
        axis=2,
    ).astype(np.uint8)


def test_roundtrip_error_bounds():
    img = _gradient(45, 67)  # odd dims exercise edge padding
    for q, bound in ((95, 4), (90, 6), (75, 10)):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= bound, (q, err.max())


def test_roundtrip_noise_q95():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 8  # worst case for JPEG; bounds stay sane


# ---------------------------------------------------------------------------
# hand-crafted streams (decoder-only paths)
# ---------------------------------------------------------------------------

def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _dqt(tid: int, raster_tbl: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(raster_tbl[ZIGZAG].astype(np.uint8)))


def _dht(tc: int, th: int, table) -> bytes:
    bits, vals = table
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _entropy_uniform(dc_codes, ac_codes, dc_diffs: list[int]) -> _BitWriter:
    """Entropy bits for a sequence of all-AC-zero blocks with the given
    DC diffs (spec F.1.2: DC category+magnitude, then EOB)."""
    w = _BitWriter()
    for diff in dc_diffs:
        t = _category(diff)
        code, ln = dc_codes[t]
        w.put(code, ln)
        if t:
            w.put(_magnitude_bits(diff, t), t)
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return w


def test_handcrafted_grayscale_decode():
    """8x8 uniform gray v=200, single component, Annex K luma table at
    quality 50 (scale 100 → the base table verbatim, q00=16).
    DC = round(8*(200-128)/16) = 36; decode must return exactly 200."""
    dc = _build_huff_codes(*_DC_L)
    ac = _build_huff_codes(*_AC_L)
    w = _entropy_uniform(dc, ac, [36])
    w.flush()
    payload = (
        b"\xff\xd8"
        + _dqt(0, _QL_BASE)
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _dht(0, 0, _DC_L) + _dht(1, 0, _AC_L)
        + _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
        + bytes(w.out)
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 8, 3)
    assert (out == 200).all()


def _sof420(h: int, w: int) -> bytes:
    comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    return _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comps)


_SOS3 = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")


def _tables3() -> bytes:
    return (
        _dqt(0, _QL_BASE) + _dqt(1, _QC_BASE)
        + _dht(0, 0, _DC_L) + _dht(1, 0, _AC_L)
        + _dht(0, 1, _DC_C) + _dht(1, 1, _AC_C)
    )


def test_handcrafted_420_decode():
    """16x16 uniform gray v=200 in 4:2:0: one MCU = 4 Y blocks (DC diffs
    36,0,0,0) + 1 Cb + 1 Cr (DC 0 → neutral chroma). Every pixel must
    decode to exactly (200,200,200) — pins the MCU interleave order and
    the 2x chroma upsample."""
    dcl, acl = _build_huff_codes(*_DC_L), _build_huff_codes(*_AC_L)
    dcc, acc = _build_huff_codes(*_DC_C), _build_huff_codes(*_AC_C)
    w = _entropy_uniform(dcl, acl, [36, 0, 0, 0])
    for diff in (0, 0):  # Cb, Cr
        t = _category(diff)
        code, ln = dcc[t]
        w.put(code, ln)
        code, ln = acc[0x00]
        w.put(code, ln)
    w.flush()
    payload = (
        b"\xff\xd8" + _tables3() + _sof420(16, 16) + _SOS3
        + bytes(w.out) + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (16, 16, 3)
    assert (out == 200).all()


def test_handcrafted_restart_interval_decode():
    """32x16 4:2:0 (two MCUs) with DRI=1: an RST0 between the MCUs
    resets the DC predictors, so both MCUs carry the same diff bits;
    decode must handle the marker and still yield uniform 200."""
    dcl, acl = _build_huff_codes(*_DC_L), _build_huff_codes(*_AC_L)
    dcc, acc = _build_huff_codes(*_DC_C), _build_huff_codes(*_AC_C)

    def mcu_bits() -> bytes:
        w = _entropy_uniform(dcl, acl, [36, 0, 0, 0])
        for _ in range(2):
            code, ln = dcc[0]
            w.put(code, ln)
            code, ln = acc[0x00]
            w.put(code, ln)
        w.flush()
        return bytes(w.out)

    payload = (
        b"\xff\xd8" + _tables3()
        + _seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
        + _sof420(16, 32) + _SOS3
        + mcu_bits() + b"\xff\xd0" + mcu_bits()
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (16, 32, 3)
    assert (out == 200).all()


def test_progressive_raises_not_implemented():
    payload = (
        b"\xff\xd8" + _dqt(0, _QL_BASE)
        + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(payload + b"\xff\xd9")


def test_corrupt_and_truncated_raise_decode_errors():
    good = encode_jpeg(_gradient(16, 16), 90)
    for bad in (b"not a jpeg", good[:20], good[:-40] + b"\x00" * 5):
        with pytest.raises(multimodal._DECODE_ERRORS):
            decode_jpeg(bad)


# ---------------------------------------------------------------------------
# multimodal integration
# ---------------------------------------------------------------------------

def test_cross_format_bmp_jpeg_phash_identical():
    """The cross-format dedup contract now covers the dominant web
    format: the same high-contrast content stored as BMP and as JPEG
    (q90) must produce the IDENTICAL 64-bit average-hash (the synth
    patterns' block means are 0/255 — JPEG noise of a few levels can
    never cross the global mean)."""
    from deduplicator_go_spark.fixtures import media as fx

    for cid in range(0, 8, 2):
        img = multimodal.decode_bmp(fx.synth_image(cid))
        h_bmp = multimodal.image_average_hash(img)
        h_jpg = multimodal.image_average_hash(decode_jpeg(encode_jpeg(img, 90)))
        assert h_bmp == h_jpg, cid


def test_transcode_jpeg_source_to_png(spark):
    """JPEG rows transcode losslessly (w.r.t. their DECODED pixels) to
    PNG through the distributed mapInPandas path."""
    from deduplicator_go_spark.fixtures import media as fx

    img = multimodal.decode_bmp(fx.synth_image(2))
    jpg = encode_jpeg(img, 90)
    rows = [("j1", "image", bytearray(jpg), "image/jpeg", 32, 32, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.transcode_media(media, to_mime="image/png").collect()
    assert [r["media_id"] for r in out] == ["pj1"]
    got = multimodal.decode_png(bytes(out[0]["payload"]))
    assert np.array_equal(got, decode_jpeg(jpg))


def test_perceptual_hashes_jpeg_and_bad_jpeg_nonstrict(spark):
    """A mixed batch: a real JPEG hashes like its BMP twin; a corrupt
    JPEG routes to NULL under strict=False instead of crashing the
    corpus job (the NULL-on-undecodable contract, extended to the new
    codec)."""
    from deduplicator_go_spark.fixtures import media as fx

    bmp = fx.synth_image(4)
    img = multimodal.decode_bmp(bmp)
    jpg = encode_jpeg(img, 90)
    rows = [
        ("b", "image", bytearray(bmp), "image/bmp", 32, 32, None),
        ("j", "image", bytearray(jpg), "image/jpeg", 32, 32, None),
        ("x", "image", bytearray(jpg[:40]), "image/jpeg", 32, 32, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"]
           for r in multimodal.perceptual_hashes(media, strict=False).collect()}
    assert got["b"] == got["j"] and got["b"] is not None
    assert got["x"] is None
