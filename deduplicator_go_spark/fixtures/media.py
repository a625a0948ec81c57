"""Deterministic synthetic multimodal corpus (zero-dependency codecs).

Every payload is generated from a seeded numpy RNG and encoded with the
engine's own pure-numpy BMP/WAV encoders (operators/multimodal.py), so
the multimodal dedup path — decode → perceptual hash → banded Hamming
candidates — runs on REAL decoded content with no codec libraries.

Planted structure: ids with ``id % 8 in (4, 5)`` are near-duplicate
variants of ``id - 4`` (same parity → same kind): the variant re-renders
the base content with small seeded noise (±2 pixel levels / ±50 sample
amplitude) that the perceptual hashes are designed to survive, so the
truth set of dup pairs is exactly {(id-4, id) : id % 8 in (4, 5)}.

Generation is distributed (mapInPandas over the id column) — the
fixture scales with the input table instead of being driver-built.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..operators.multimodal import MEDIA_SCHEMA, encode_avi, encode_bmp, encode_wav

IMG_SIDE = 32  # 8x8 pattern blocks upscaled 4x
VIDEO_FRAMES = 6


def media_kind(i: int) -> str:
    return "image" if i % 2 == 0 else "audio"


def base_id(i: int) -> int:
    """The id whose content this row renders (i itself, or i-4 for the
    planted near-dup variants)."""
    return i - 4 if i % 8 in (4, 5) else i


def synth_image(content_id: int, noise_seed: int | None = None) -> bytes:
    """High-contrast 8x8 block pattern upscaled to 32x32 RGB; optional
    small noise (±2 levels) that never flips an average-hash bit."""
    rng = np.random.default_rng(content_id)
    pattern = rng.integers(0, 2, (8, 8)).astype(np.uint8) * 255
    img = np.kron(pattern, np.ones((4, 4), dtype=np.uint8))
    img = np.stack([img, img, img], axis=2).astype(np.int16)
    if noise_seed is not None:
        noise = np.random.default_rng(noise_seed).integers(-2, 3, img.shape)
        img = np.clip(img + noise, 0, 255)
    return encode_bmp(img.astype(np.uint8))


def synth_audio(content_id: int, noise_seed: int | None = None,
                rate: int = 16000) -> bytes:
    """64-window amplitude envelope (quiet/loud per window); optional
    ±50 sample noise that never flips an envelope-hash bit."""
    rng = np.random.default_rng(content_id)
    amps = rng.choice(np.array([500, 20000], dtype=np.int32), 64)
    window = 64
    signs = rng.choice(np.array([-1, 1], dtype=np.int32), 64 * window)
    samples = np.repeat(amps, window) * signs
    if noise_seed is not None:
        samples = samples + np.random.default_rng(noise_seed).integers(
            -50, 51, samples.shape
        )
    return encode_wav(np.clip(samples, -32768, 32767).astype(np.int16), rate)


def synth_video(content_id: int, noise_seed: int | None = None,
                n_frames: int = VIDEO_FRAMES, fps: int = 10) -> bytes:
    """A brightness-ramped clip over one high-contrast 8x8 pattern:
    frame f renders the pattern at 50%..100% brightness, so the clip
    has real inter-frame structure while its SAMPLED MEAN frame keeps
    block means at 0 or ~191 — far from the video average-hash's
    global-mean threshold, so per-frame ±2 noise can never flip a bit
    (same margin argument as synth_image)."""
    rng = np.random.default_rng(content_id)
    pattern = rng.integers(0, 2, (8, 8)).astype(np.float64) * 255
    base = np.kron(pattern, np.ones((4, 4)))
    ramp = np.linspace(0.5, 1.0, n_frames)
    frames = np.stack([base * b for b in ramp])[..., None].repeat(3, axis=3)
    if noise_seed is not None:
        noise = np.random.default_rng(noise_seed).integers(-2, 3, frames.shape)
        frames = np.clip(frames + noise, 0, 255)
    return encode_avi(frames.astype(np.uint8), fps=fps)


def synthetic_video(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed video corpus: per input id, a clean clip ('v' id) and
    a noisy near-dup variant ('w' id) — the planted truth set is exactly
    {(v<i>, w<i>)} per id. mime video/avi, kind 'video'."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms"]
        for pdf in it:
            rows = []
            for i in (int(x) for x in pdf[id_col]):
                dur = VIDEO_FRAMES * 100
                rows.append((f"v{i:08d}", "video", synth_video(i),
                             "video/avi", IMG_SIDE, IMG_SIDE, dur))
                rows.append((f"w{i:08d}", "video", synth_video(i, noise_seed=i + 1),
                             "video/avi", IMG_SIDE, IMG_SIDE, dur))
            yield pd.DataFrame(rows, columns=cols)

    return ids.select(id_col).mapInPandas(batches, MEDIA_SCHEMA)


def synth_media_row(i: int) -> tuple:
    b = base_id(i)
    noise = i if b != i else None
    if media_kind(i) == "image":
        payload = synth_image(b, noise)
        return (f"m{i:08d}", "image", payload, "image/bmp", IMG_SIDE, IMG_SIDE, None)
    payload = synth_audio(b, noise)
    return (f"m{i:08d}", "audio", payload, "audio/wav", None, None, 256)


def synthetic_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed generator: one media row per input id.

    The id list arrives from a parquet scan whose split count (1-4
    tasks for a skinny id column) would otherwise serialize every
    downstream codec UDF — synthesis here, plus the decode/encode
    chains of transcode/phash consumers that inherit this
    partitioning. Repartition to core count first (the CPU-bound
    pandas-stage rule, operators/minhash.cpu_partitions)."""
    from ..operators.minhash import cpu_partitions

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms"]
        for pdf in it:
            rows = [synth_media_row(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(rows, columns=cols)

    return (
        ids.select(id_col)
        .repartition(cpu_partitions(ids))
        .mapInPandas(batches, MEDIA_SCHEMA)
    )


def truth_pairs(id_values: list[int]) -> set[tuple[str, str]]:
    """The planted near-dup truth set over a concrete id population."""
    present = set(id_values)
    return {
        (f"m{i - 4:08d}", f"m{i:08d}")
        for i in present
        if i % 8 in (4, 5) and (i - 4) in present
    }
