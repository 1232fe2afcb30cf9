"""S3 for real: a WARC (ISO 28500) reader over Spark's binaryFile source.

The reference consumes WARC files via jwarc record iteration
(cc/warc/Extractor.java:96-139: WarcReader → response records → HTTP
payload bytes). This module reads the same format with the stdlib only:
``binaryFile`` scan → one mapInPandas pass that inflates (multi-member
gzip, the Common Crawl convention, or plain) and walks records by their
Content-Length framing.

Split model: a WARC file is splittable only at gzip-member boundaries,
which a generic scan can't see — so the task unit is the FILE (Common
Crawl shards are ~1 GB, a sane task size; the same decision jwarc's
stream reader forces on the reference). ``spread()`` upstream gives one
task per file; record parsing is sequential within a file, parallel
across files.

``warc_response_records`` adapts response records to the exact input
contract of ``operators.extraction.extract`` — read_warc →
warc_response_records → extract → write_repository IS the reference's
end-to-end pipeline (fetch excluded) on real WARC bytes.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "warc_file string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "content_length long, http_status int, http_content_type string, "
    "truncated string, payload binary"
)


def _inflate(buf: bytes) -> bytes:
    """Whole-file inflate: multi-member gzip (each WARC record its own
    member, the CC convention), single-member gzip, or already-plain.
    gzip.GzipFile streams across members without re-copying the tail per
    member (a decompressobj/unused_data loop is QUADRATIC in member
    count — 240× slower on an 8000-member file); trailing non-gzip bytes
    end the stream like a truncated record tail does."""
    if buf[:2] != b"\x1f\x8b":
        return buf
    out = []
    try:
        with gzip.GzipFile(fileobj=io.BytesIO(buf)) as g:
            while True:
                chunk = g.read(1 << 20)
                if not chunk:
                    break
                out.append(chunk)
    except (OSError, EOFError):
        pass  # damaged tail: keep the members already inflated
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("utf-8", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def parse_warc_bytes(raw: bytes) -> Iterator[dict]:
    """Iterate records of one (inflated) WARC byte stream: version line,
    CRLF headers, Content-Length payload bytes, CRLF CRLF trailer.
    Tolerant of trailing garbage (stops at the first non-record bytes,
    like the reference's stream reader)."""
    pos, n, idx = 0, len(raw), 0
    while pos < n:
        # skip inter-record blank lines
        while raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if not raw[pos : pos + 5] == b"WARC/":
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(raw[pos : hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            # crafted negative Content-Length could rewind pos to (or
            # before) the record start and loop forever — untrusted-input
            # guard, same class as the image decoders' pixel budgets
            break
        body = raw[hdr_end + 4 : hdr_end + 4 + length]
        if len(body) < length:
            break  # truncated file tail
        yield {
            "record_idx": idx,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "truncated": headers.get("warc-truncated"),
            "body": body,
        }
        idx += 1
        pos = hdr_end + 4 + length


def _split_http(body: bytes) -> tuple[int | None, str | None, bytes]:
    """An application/http body → (status, content-type, payload bytes)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body[:5] in (b"HTTP/",):
        return None, None, body
    head = body[:sep]
    status = None
    first = head.split(b"\r\n", 1)[0].split()
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    ct = _parse_headers(head).get("content-type")
    return status, ct, body[sep + 4 :]


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → one row per record, with HTTP payloads unwrapped for
    response records. Task unit = file (see module docstring)."""
    from .tables import spread

    # spread: binaryFile packs many small archives into few splits
    # (openCost accounting), which would serialize the inflate+parse pass
    # below on a couple of tasks; the repartition moves each archive's
    # bytes once and is a metadata no-op when the scan already carries
    # enough splits (guide §2.5)
    files = spread(
        spark.read.format("binaryFile").load(path).select("path", "content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                raw = _inflate(bytes(content))
                for rec in parse_warc_bytes(raw):
                    is_http = (rec["content_type"] or "").startswith(
                        "application/http"
                    )
                    if is_http:
                        status, http_ct, payload = _split_http(rec["body"])
                    else:
                        status, http_ct, payload = None, None, rec["body"]
                    rows.append(
                        (
                            path_, rec["record_idx"], rec["warc_type"],
                            rec["target_uri"], rec["warc_date"],
                            rec["record_id"], rec["content_type"],
                            rec["content_length"], status, http_ct,
                            rec["truncated"], payload,
                        )
                    )
                # one output frame per input FILE keeps peak memory at
                # O(one inflated file), the bound that matters at 100 TB
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "warc_file", "record_idx", "warc_type", "target_uri",
                        "warc_date", "record_id", "content_type",
                        "content_length", "http_status", "http_content_type",
                        "truncated", "payload",
                    ],
                )
                rows = []

    return files.mapInPandas(gen, WARC_SCHEMA)


def warc_response_records(records: DataFrame) -> DataFrame:
    """Response records → the exact ``extract()`` input contract
    (url, header_mime, payload, truncated, length) — the reference's
    record-type filter F3 (Extractor.java:99-104) plus column mapping."""
    return records.filter(F.col("warc_type") == "response").select(
        F.col("target_uri").alias("url"),
        F.col("http_content_type").alias("header_mime"),
        F.col("payload"),
        F.col("truncated"),
        F.length("payload").cast("long").alias("length"),
    )


def _warc_record_bytes(
    uri: str, payload: bytes, http_content_type: str | None,
    warc_date: str, record_id: str, truncated: str | None = None,
) -> bytes:
    """Serialize one response record (HTTP-wrapped payload, one gzip
    member — the CC layout read_warc round-trips)."""
    ct = http_content_type or "application/octet-stream"
    # UTF-8 throughout (WARC/1.1 sanctions it; harvested IRIs with
    # non-latin characters must not kill the archive task)
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8") + payload
    head = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: <" + record_id.encode("utf-8") + b">",
        b"WARC-Date: " + warc_date.encode("utf-8"),
        b"WARC-Target-URI: " + uri.encode("utf-8"),
        b"Content-Type: application/http;msgtype=response",
    ]
    if truncated:
        head.append(b"WARC-Truncated: " + truncated.encode("utf-8"))
    head.append(b"Content-Length: " + str(len(http)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + http + b"\r\n\r\n"


def write_warc(
    fetched: DataFrame,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "payload",
    mime_col: str = "header_mime",
    truncated_col: str = "truncated",
    warc_date: str = "2026-01-01T00:00:00Z",
    compresslevel: int = 9,
) -> int:
    """The crawl's archive sink: (url, payload, mime) rows → per-partition
    ``part-NNNNN.warc.gz`` files (one gzip member per record, the CC
    layout), written with write-then-rename so a killed task never leaves
    a half-file behind. Record ids derive from the url (deterministic —
    any rerun emits byte-identical archives given the same partitioning);
    returns the number of records written. ``read_warc`` round-trips the
    output bit-for-bit, so crawl → archive → re-extract is closed.

    Rows reach the task through Arrow batches (mapInPandas), not the
    RDD/Pyrolite row pickler — at 8000 members the batched transfer is
    the difference between pickling every Row through the JVM↔Python
    socket one at a time and shipping three columnar buffers; each member
    still compresses with ONE zlib C call (``zlib.compress(wbits=31)``,
    byte-identical to ``gzip.compress(mtime=0)`` at level 9 — no
    wall-clock in the bytes, so reruns stay identical)."""
    import glob as _glob
    import hashlib
    import os as _os
    import zlib as _zlib

    # a rerun with fewer partitions must not leave stale part files mixed
    # into the directory the reader globs
    _os.makedirs(out_dir, exist_ok=True)
    for old in _glob.glob(_os.path.join(out_dir, "part-*.warc.gz")):
        _os.remove(old)
    # sweep attempt-unique tmp leftovers from killed/speculative attempts
    # (readers skip dotfiles, but they leak disk across reruns)
    for old in _glob.glob(_os.path.join(out_dir, ".part-*.warc.gz.tmp")):
        _os.remove(old)
    has_trunc = truncated_col in fetched.columns
    cols = [url_col, payload_col, mime_col] + ([truncated_col] if has_trunc else [])

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        # attempt-unique tmp: concurrent attempts (speculation, zombie
        # retry) each write their own file; os.replace is atomic and
        # last-wins with a COMPLETE file either way
        tmp = _os.path.join(out_dir, f".part-{pid:05d}.{attempt}.warc.gz.tmp")
        final = _os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n = 0
        f = None
        for pdf in batches:
            if f is None and len(pdf):
                _os.makedirs(out_dir, exist_ok=True)  # task-side: executors
                f = open(tmp, "wb")
            trunc_vals = (
                pdf[truncated_col] if has_trunc else [None] * len(pdf)
            )
            for uri, payload, mime, trunc in zip(
                pdf[url_col], pdf[payload_col], pdf[mime_col], trunc_vals
            ):
                rid = "urn:ccspark:" + hashlib.sha1(uri.encode()).hexdigest()
                f.write(
                    _zlib.compress(
                        _warc_record_bytes(
                            uri, bytes(payload), mime, warc_date, rid,
                            # nulls arrive as None (Arrow) — but guard
                            # against pandas NaN, which is truthy
                            truncated=trunc if isinstance(trunc, str) else None,
                        ),
                        compresslevel,
                        31,  # gzip container, no mtime: rerun-identical
                    )
                )
                n += 1
        if f is not None:
            f.close()
            _os.replace(tmp, final)
        yield pd.DataFrame({"n": [n]})

    counts = (
        fetched.select(*cols)
        .sortWithinPartitions(url_col)  # shuffle order is not a contract
        .mapInPandas(write_partition, "n long")
        .collect()
    )
    return int(sum(r["n"] for r in counts))
