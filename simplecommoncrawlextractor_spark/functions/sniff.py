"""Vectorized magic-byte MIME sniffer.

Replaces the reference's two paths:
- Tika detect on the first 1000 bytes, escalating to a full-payload detect
  only for application/octet-stream (cc/warc/Extractor.java:110-139,
  sniff budget cc/warc/ExtractorConfig.java:36);
- `file -b --mime-type` subprocess fan-out (cc/BatchFileIder.java:42-274).

One Arrow-batched pandas UDF over binary prefixes; no subprocesses, no
per-row Python UDFs. The two-phase escalation is expressed at the operator
level with an ``F.when`` split so only octet-stream rows pay the full-body
pass (see operators/extraction.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

SNIFF_BUDGET_BYTES = 1000  # ExtractorConfig.java:36

# (magic bytes, offset, mime) — ordered; first hit wins.
_MAGIC: list[tuple[bytes, int, str]] = [
    (b"%PDF", 0, "application/pdf"),
    (b"PK\x03\x04", 0, "application/zip"),
    (b"\x89PNG\r\n\x1a\n", 0, "image/png"),
    (b"GIF87a", 0, "image/gif"),
    (b"GIF89a", 0, "image/gif"),
    (b"\xff\xd8\xff", 0, "image/jpeg"),
    (b"\x1f\x8b", 0, "application/gzip"),
    (b"<!DOCTYPE html", 0, "text/html"),
    (b"<html", 0, "text/html"),
    (b"{\\rtf", 0, "application/rtf"),
    (b"OggS", 0, "audio/ogg"),
    (b"ID3", 0, "audio/mpeg"),
    (b"RIFF", 0, "audio/x-wav"),  # refined below via WAVE/AVI tag at offset 8
    (b"ftyp", 4, "video/mp4"),
    (b"\x00\x00\x00\x0c\x6a\x50", 0, "image/jp2"),
]


def _sniff_one(b: bytes | None) -> str | None:
    if b is None:
        return None
    if len(b) == 0:
        return "application/octet-stream"
    for magic, off, mime in _MAGIC:
        if b[off : off + len(magic)] == magic:
            if magic == b"RIFF":
                tag = b[8:12]
                if tag == b"AVI ":
                    return "video/x-msvideo"
                if tag == b"WEBP":
                    return "image/webp"
                return "audio/x-wav"
            return mime
    # two-byte magics validated structurally (too short to trust alone):
    # BMP requires a full file header, PPM requires whitespace after 'P6'
    if b[:2] == b"BM" and len(b) >= 54:
        return "image/bmp"
    if b[:2] == b"P6" and len(b) > 2 and b[2:3].isspace():
        return "image/x-portable-pixmap"
    # printable-ish heuristic for text (Tika's fallback territory)
    sample = b[:256]
    printable = sum(32 <= c < 127 or c in (9, 10, 13) for c in sample)
    if printable >= 0.95 * len(sample):
        return "text/plain"
    return "application/octet-stream"


@F.pandas_udf(StringType())
def sniff_mime(prefix: pd.Series) -> pd.Series:
    """Detect MIME from the first ``SNIFF_BUDGET_BYTES`` of a payload."""
    return prefix.map(_sniff_one)


def with_detected_mime(df, payload_col: str = "payload", out_col: str = "detected_mime"):
    """Attach the two-phase sniffed MIME as ONE ``mapInPandas`` pass.

    Why not the ``withColumn(sniff prefix) + F.when(octet, sniff full)``
    operator split (round 6): ExtractPythonUDFs hoists python UDFs out of
    conditional branches and out of filters, so the previous plan
    (a) evaluated the FULL-payload sniff unconditionally for every row —
    the ``F.when`` only selected between two already-computed results,
    defeating the 1000-byte budget the reference's escalation exists for
    (cc/warc/Extractor.java:110-139) — and (b) duplicated both sniffs
    into a second ArrowEvalPython node when the F6 selection filter was
    pushed below the projection (two nodes each carrying
    ``sniff_mime(substring(payload,1,1000))`` AND ``sniff_mime(payload)``
    — captured in OPTIMIZATION_r06.md). Inside one pandas batch the
    escalation is a per-row conditional for real: only rows whose prefix
    sniff says octet-stream touch bytes past the budget, and the barrier
    is opaque to pushdown so nothing re-evaluates. Same per-row result:
    null payload → null, else full sniff iff the prefix sniff returned
    application/octet-stream."""

    def sniff_rows(batches):
        for pdf in batches:
            pdf = pdf.copy()
            payloads = pdf[payload_col]
            phase1 = payloads.map(
                lambda b: _sniff_one(b[:SNIFF_BUDGET_BYTES] if b is not None else None)
            )
            esc = phase1 == "application/octet-stream"
            if esc.any():
                phase1 = phase1.where(~esc, payloads[esc].map(_sniff_one))
            pdf[out_col] = phase1
            yield pdf

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(sniff_rows, f"{fields}, `{out_col}` string")
