"""GIF codec (operators/gif.py): LZW round-trips, scope fences, and
cross-format phash integration."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicator_go_spark.operators.gif import decode_gif, encode_gif


def _palette_img(rng, shape, colors):
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, shape)]


@pytest.mark.parametrize(
    "shape,colors",
    [((32, 32), 2), ((32, 32), 256), ((7, 5), 3), ((120, 90), 250), ((1, 1), 1)],
)
def test_gif_roundtrip_lossless(shape, colors):
    img = _palette_img(np.random.default_rng(hash((shape, colors)) % 2**32), shape, colors)
    out = decode_gif(encode_gif(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_gif_lzw_dictionary_reset_path():
    # a long high-entropy index stream forces the 12-bit dict to fill
    # and the encoder to emit a mid-stream CLEAR; decode must follow
    rng = np.random.default_rng(11)
    img = _palette_img(rng, (200, 200), 256)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_encode_rejects_true_color():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        encode_gif(img)


def test_gif_decode_rejects_interlaced_and_garbage():
    img = _palette_img(np.random.default_rng(1), (8, 8), 4)
    payload = bytearray(encode_gif(img))
    # flip the interlace bit in the image descriptor flags: descriptor
    # starts at 13 (header) + palette; find the 0x2C introducer
    i = payload.index(0x2C, 13)
    payload[i + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(payload))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(20))


def test_gif_cross_format_phash(spark):
    """BMP original and GIF transcode collide at hamming 0 through the
    full distributed path (transcode_media + perceptual_hashes)."""
    from deduplicator_go_spark.fixtures import media as fx
    from deduplicator_go_spark.operators import multimodal

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id").filter("doc_id % 2 = 0")
    media = fx.synthetic_media(ids, "doc_id").filter("kind = 'image'")
    gif = multimodal.transcode_media(media, to_mime="image/gif", id_prefix="g")
    both = media.unionByName(gif)
    hashes = {r["media_id"]: r["phash"]
              for r in multimodal.perceptual_hashes(both, strict=True).collect()}
    originals = [m for m in hashes if not m.startswith("g")]
    assert originals
    for mid in originals:
        assert hashes[mid] == hashes["g" + mid]


# ---------------------------------------------------------------------------
# property-based LZW round-trips (pure Python, no Spark session)
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st

from deduplicator_go_spark.operators.gif import _lzw_decode, _lzw_encode


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_any_stream(data, mcs):
    # indices must fit the initial code table
    capped = bytes(b % (1 << mcs) for b in data)
    assert bytes(_lzw_decode(_lzw_encode(capped, mcs), mcs)) == capped


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_gif_roundtrip_random_small_images(seed):
    rng = np.random.default_rng(seed)
    colors = int(rng.integers(1, 257))
    h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    img = _palette_img(rng, (h, w), colors)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
