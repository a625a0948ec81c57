"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a typed metadata struct — the same shape the documents table uses for
``html``.  The Spark-side plumbing (schemas, partitioning, Arrow batch
shape, UDF signatures) is real and tested; the actual codec work is
stubbed deterministically because no image/audio libraries exist in
this container — each stub is clearly marked and raises
``NotImplementedError`` when ``strict=True``.

Decode/resize/frame-sample run through ``mapInPandas`` so each Arrow
batch amortizes Python overhead and payload bytes never pass through
Python row objects.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, payload_sha string, "
    "feature array<float>"
)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: bytes of
    the sha256 digest scaled to [0,1). STUB — replace with a real
    decode+model when codec libs are available."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(media: DataFrame, dim: int = 8, strict: bool = False) -> DataFrame:
    """binary payload → fixed-width feature vector via mapInPandas.

    ``strict=True`` raises NotImplementedError — the real decoder is
    not available in this environment (no PIL/ffmpeg); the plumbing
    (schema, batching, column pruning) is the tested part.
    """
    if strict:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this image"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "payload_sha": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda p: _fake_feature(p or b"", dim)),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind payload statistics — native exprs (binary length only,
    payload never decoded)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg(F.length("payload")).alias("avg_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


def exact_dup_media(media: DataFrame) -> DataFrame:
    """Exact payload dedup: sha2 over binary + length blocking — the
    reference's (hash, size) grouping applied to opaque payloads."""
    sigs = media.select(
        "media_id",
        F.sha2("payload", 256).alias("payload_sha"),
        F.length("payload").alias("n_bytes"),
    )
    groups = (
        sigs.groupBy("payload_sha", "n_bytes")
        .agg(F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )
    return sigs.join(F.broadcast(groups), ["payload_sha", "n_bytes"])
