"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested. Decoding is REAL for the
two formats that need no external library — uncompressed BMP
(BITMAPINFOHEADER, 24/32bpp BI_RGB) and binary PPM (P6) — parsed by hand
in ``_decode_bmp``/``_decode_ppm``; compressed formats (PNG/JPEG/...)
remain STUBBED with a deterministic fake (this container ships no image
libraries) behind ``_decode_image_stub`` — swap in PIL/libav by replacing
that one function. Batch shape: mapInPandas receives an iterator of Arrow
batches; we yield one output frame per input frame to keep memory bounded
regardless of payload size — the pattern that matters at 100 TB, where a
single partition can hold GBs of media bytes.
"""

from __future__ import annotations

import struct
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
    """DETERMINISTIC FAKE decoder for compressed formats (no PIL in this
    container): derives a (width, height, 8-dim feature) from the payload
    bytes. Replace with a real decode (PIL.Image.open + thumbnail +
    embedding) in production — the surrounding Spark plumbing does not
    change."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    width = int(64 + (h[:8].sum() % 1984))
    height = int(64 + (h[8:16].sum() % 1984))
    feat = (h.reshape(8, 8).mean(axis=1) / 255.0).astype(np.float32)
    return width, height, feat


def _pixel_features(px: np.ndarray, width: int, height: int, maxval: int = 255) -> np.ndarray:
    """8-dim feature from an (n, 3) RGB pixel array: per-channel means,
    gray std/min/max, aspect, bias — all float32-deterministic.
    ``maxval`` is the sample ceiling (255 for BMP/PNG; PPM declares its
    own) so a P6 with maxval 15 normalizes to the same [0,1] range instead
    of coming out ~maxval/255 too dark."""
    f = px.astype(np.float32) / np.float32(maxval)
    gray = f.mean(axis=1)
    return np.array(
        [
            float(f[:, 0].mean()), float(f[:, 1].mean()), float(f[:, 2].mean()),
            float(gray.std()), float(gray.min()), float(gray.max()),
            width / float(width + height), 1.0,
        ],
        dtype=np.float32,
    )


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL decode of an uncompressed BI_RGB BMP (BITMAPINFOHEADER+,
    24/32bpp, bottom-up or top-down). Returns None when the payload isn't
    one — the caller falls back to the stub."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        pix_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            return None  # BITMAPCOREHEADER not supported
        width, height = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = ((width * bpp // 8) + 3) & ~3
    need = pix_off + stride * height
    if planes != 1 or need > len(payload) or width * height > 1 << 24:
        return None
    rows = []
    step = bpp // 8
    for r in range(height):
        row_idx = r if top_down else height - 1 - r
        off = pix_off + row_idx * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=width * step, offset=off)
        # BMP stores BGR(A); emit RGB
        rows.append(row.reshape(width, step)[:, 2::-1])
    px = np.concatenate(rows)
    return width, height, _pixel_features(px, width, height)


def _decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL decode of a binary PPM (P6, maxval ≤ 255, '#' comments)."""
    if payload[:2] != b"P6":
        return None
    i, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j : j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3 or i >= n or not payload[i : i + 1].isspace():
        return None
    i += 1  # single whitespace after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not 0 < maxval <= 255 or width * height > 1 << 24:
        return None
    need = width * height * 3
    if n - i < need:
        return None
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i).reshape(-1, 3)
    return width, height, _pixel_features(px, width, height, maxval=maxval)


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Dispatch: real BMP/PPM decode when the bytes are one; deterministic
    stub otherwise (compressed formats, garbage, truncation)."""
    out = _decode_bmp(payload)
    if out is None:
        out = _decode_ppm(payload)
    return out if out is not None else _decode_image_stub(payload)


def image_features(media: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload") -> DataFrame:
    """media_ref + binary payload → typed image metadata + feature vector.

    mapInPandas: one Arrow batch in, one out; decode is vectorized over the
    batch (list comprehension over bytes objects — the decode itself is the
    unavoidable Python, everything around it is Arrow)."""
    from ..functions.sniff import _sniff_one

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            decoded = [decode_image(b if b is not None else b"") for b in payloads]
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


# a valid 54-byte header for a 4×4 24bpp BI_RGB BMP (stride 12, no pad):
# the synthesized payloads below append 48 pixel bytes derived from the
# media_ref, producing REAL decodable bitmaps for the bmp bucket
_BMP_4X4_HEADER = (
    b"BM" + struct.pack("<IHHI", 102, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 48, 0, 0, 0, 0)
)


def media_payloads_from_docs(docs: DataFrame) -> DataFrame:
    """Extract media spans from interleaved documents and synthesize their
    payload bytes deterministically from the media_ref (sandbox stand-in
    for reading the payload store). One bucket in four is a REAL
    uncompressed BMP whose pixels derive from the ref — exercising the
    genuine decode path; the rest carry compressed-format magics that
    reach the documented stub."""
    media = docs.select(F.explode("spans").alias("span")).filter(
        F.col("span.kind") == "media"
    )
    ref = F.col("span.media_ref")
    seed = F.abs(F.xxhash64(ref))
    ref_bytes = F.encode(F.repeat(ref, 8), "utf-8")
    bmp = F.concat(
        F.lit(_BMP_4X4_HEADER).cast("binary"), F.substring(ref_bytes, 1, 48)
    )
    body = (
        F.when(F.pmod(seed, F.lit(4)) == 0, F.concat(F.lit(b"\x89PNG\r\n\x1a\n").cast("binary"), ref_bytes))
        .when(F.pmod(seed, F.lit(4)) == 1, F.concat(F.lit(b"\xff\xd8\xff\xe0").cast("binary"), ref_bytes))
        .when(F.pmod(seed, F.lit(4)) == 2, bmp)
        .otherwise(F.concat(F.lit(b"RIFF1234WEBP").cast("binary"), ref_bytes))
    )
    return media.select(ref.alias("media_ref"), body.alias("payload")).distinct()
