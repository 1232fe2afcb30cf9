"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual codec work is
STUBBED with a deterministic fake (this container ships no image/audio
libraries) behind ``_decode_image_stub`` — swap in PIL/libav by replacing
that one function. Batch shape: mapInPandas receives an iterator of Arrow
batches; we yield one output frame per input frame to keep memory bounded
regardless of payload size — the pattern that matters at 100 TB, where a
single partition can hold GBs of media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "media_ref string, mime string, width int, height int, n_bytes long, "
    "feat array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame bytes".replace(
    "bytes", "binary"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC FAKE decoder (no PIL in this container): derives a
    (width, height, 8-dim feature) from the payload bytes. Replace with a
    real decode (PIL.Image.open + thumbnail + embedding) in production —
    the surrounding Spark plumbing does not change."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    width = int(64 + (h[:8].sum() % 1984))
    height = int(64 + (h[8:16].sum() % 1984))
    feat = (h.reshape(8, 8).mean(axis=1) / 255.0).astype(np.float32)
    return width, height, feat


def image_features(media: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload") -> DataFrame:
    """media_ref + binary payload → typed image metadata + feature vector.

    mapInPandas: one Arrow batch in, one out; decode is vectorized over the
    batch (list comprehension over bytes objects — the decode itself is the
    unavoidable Python, everything around it is Arrow)."""
    from ..functions.sniff import _sniff_one

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            decoded = [_decode_image_stub(b if b is not None else b"") for b in payloads]
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "mime": [_sniff_one(b) for b in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                    "feat": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256,
                  ref_col: str = "media_ref", payload_col: str = "payload") -> DataFrame:
    """Resize stub: production would decode → thumbnail → re-encode; the
    deterministic fake truncates the payload proportionally so output sizes
    are testable. Plumbing (schema, batch iteration) is the real pattern."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [
                (b[: max(1, len(b) * max_side // 2048)] if b else b"")
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_ref": pdf[ref_col], "resized": out_payload})

    return media.mapInPandas(gen, "media_ref string, resized binary")


def sample_frames(media: DataFrame, every_n: int = 10,
                  ref_col: str = "media_ref", payload_col: str = "payload") -> DataFrame:
    """Video frame-sampling stub: emits one fake 'frame' per every_n KB of
    payload (production: pyav keyframe iteration). Demonstrates the 1→N
    row fan-out shape under mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, frames = [], [], []
            for ref, b in zip(pdf[ref_col], pdf[payload_col]):
                b = b or b""
                n_frames = max(1, len(b) // (every_n * 1024))
                for i in range(n_frames):
                    refs.append(ref)
                    idxs.append(i)
                    frames.append(b[i * 16 : i * 16 + 16])
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(gen, FRAME_SAMPLE_SCHEMA)


def media_payloads_from_docs(docs: DataFrame) -> DataFrame:
    """Extract media spans from interleaved documents and synthesize their
    payload bytes deterministically from the media_ref (sandbox stand-in
    for reading the payload store)."""
    media = docs.select(F.explode("spans").alias("span")).filter(
        F.col("span.kind") == "media"
    )
    ref = F.col("span.media_ref")
    seed = F.abs(F.xxhash64(ref))
    magic = (
        F.when(F.pmod(seed, F.lit(4)) == 0, F.lit(b"\x89PNG\r\n\x1a\n"))
        .when(F.pmod(seed, F.lit(4)) == 1, F.lit(b"\xff\xd8\xff\xe0"))
        .when(F.pmod(seed, F.lit(4)) == 2, F.lit(b"GIF89a"))
        .otherwise(F.lit(b"RIFF1234WEBP"))
    )
    body = F.concat(magic.cast("binary"), F.encode(F.repeat(ref, 8), "utf-8"))
    return media.select(ref.alias("media_ref"), body.alias("payload")).distinct()
