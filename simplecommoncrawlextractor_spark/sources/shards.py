"""S6/S7: the index-shard downloader and the shard-size HEAD probe.

The reference runs these as thread-pool wget/curl scripts over the 300
``cdx-NNNNN.gz`` shards of a crawl collection
(cc/index/CCIndexWGetter.java:30-117: work queue of shard numbers, N
threads, ``wget -O {collection}-cdx-{num}.gz {base}/{collection}/indexes/
cdx-{num}.gz``, 360 s timeout, failures logged;
CCIndexSizeGetter.java:33-132: ``curl -sI`` + ``Content-Length:\\s+(\\d+)``
regex). Spark-first: the shard list is a DataFrame and the fetch runs as a
``mapInPandas`` stage — each executor core plays one of the reference's
threads, retries/timeouts stay per-row, and the result is a table (status,
bytes, path) instead of stdout.

Transport is injectable: this sandbox has no network, so the default
transport synthesizes deterministic gzip bytes per URL (clearly marked);
``wget_transport`` shells out exactly like the reference when a network
exists.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import re
import subprocess
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AWS_URL_BASE = "https://commoncrawl.s3.amazonaws.com/cc-index/collections/"
AWS_URL_INDICES = "/indexes/cdx-"
N_SHARDS = 300  # hardcoded loop bound, CCIndexWGetter.java:52
TIMEOUT_SEC = 360  # CCIndexWGetter.java:104

_CONTENT_LENGTH_RE = re.compile(r"(?s)Content-Length:\s+(\d+)", re.IGNORECASE)


def shard_manifest(
    spark: SparkSession, collection: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """One row per index shard: (shard_num, shard_url, output_name) — the
    reference's work queue as a DataFrame."""
    num = F.format_string("%05d", F.col("id").cast("int"))
    return spark.range(n_shards).select(
        F.col("id").cast("int").alias("shard_num"),
        F.concat(
            F.lit(AWS_URL_BASE + collection + AWS_URL_INDICES), num, F.lit(".gz")
        ).alias("shard_url"),
        F.concat(F.lit(collection + "-cdx-"), num, F.lit(".gz")).alias("output_name"),
    )


def shard_payload_size(shard_num: int) -> int:
    """The byte size simulated_transport returns for a shard — PURE
    ARITHMETIC in the shard number, so the driver's DuckDB oracle can
    replay S6/S7 end-to-end: fixed-width 75-byte lines, 40+(num%23) lines
    per shard, and gzip level-0 stored-block framing (10-byte header +
    5-byte block header + 8-byte trailer = 23 bytes for payloads under
    one 64 KiB deflate block)."""
    return 23 + 75 * (40 + shard_num % 23)


_SHARD_NUM_RE = re.compile(r"(\d+)\.gz$")


def simulated_transport(url: str) -> bytes:
    """SANDBOX TRANSPORT: deterministic gzip'd CDX-ish lines derived from
    the url's shard number — stands in for the S3 GET (no network in this
    container). Level-0 (stored) gzip keeps the output size the closed
    form in shard_payload_size; content stays valid gzip'd CDX lines."""
    m = _SHARD_NUM_RE.search(url)
    num = int(m.group(1)) if m else int(hashlib.sha1(url.encode()).hexdigest(), 16) % 100000
    lines = "".join(
        f'com,example)/{num % 100000:05d}/{i:04d} 20260101 '
        f'{{"url": "https://example.com/{num % 100000:05d}/{i:04d}"}}\n'
        for i in range(40 + num % 23)
    )
    data = lines.encode()
    out = gzip.compress(data, compresslevel=0, mtime=0)
    assert len(out) == shard_payload_size(num) or len(data) >= 65000
    return out


def wget_transport(url: str, timeout_sec: int = TIMEOUT_SEC) -> bytes:
    """The reference's actual transport (wget, per-shard timeout) — usable
    only where a network exists."""
    out = subprocess.run(
        ["wget", "-q", "-O", "-", url], capture_output=True, timeout=timeout_sec
    )
    if out.returncode != 0:
        raise IOError(f"failed to get: {url}")
    return out.stdout


def download_shards(
    manifest: DataFrame,
    out_dir: str,
    transport: Callable[[str], bytes] = simulated_transport,
) -> DataFrame:
    """Distributed S6: fetch every shard in the manifest, write
    ``out_dir/{output_name}``, return (output_name, status, n_bytes, path).
    Each task handles its partition's shards sequentially — parallelism is
    the executor-core count, the Spark analog of the reference's thread
    pool; a failed shard becomes a 'failed' row, not a crashed job.

    ``out_dir`` must be storage every executor can reach (shared FS /
    fuse mount); on a multi-node cluster with plain local paths each task
    writes to ITS OWN node's disk and the returned paths are
    executor-local — the mkdir below runs task-side so that mode at
    least works per-node."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)  # task-side: executors need it too
        for pdf in batches:
            names, statuses, sizes, paths = [], [], [], []
            for url, name in zip(pdf["shard_url"], pdf["output_name"]):
                path = os.path.join(out_dir, name)
                try:
                    blob = transport(url)
                    with open(path, "wb") as f:
                        f.write(blob)
                    statuses.append("ok")
                    sizes.append(len(blob))
                except Exception as e:  # noqa: BLE001 — per-shard isolation
                    statuses.append(f"failed: {e}")
                    sizes.append(0)
                names.append(name)
                paths.append(path)
            yield pd.DataFrame(
                {"output_name": names, "status": statuses, "n_bytes": sizes, "path": paths}
            )

    return manifest.repartition("shard_num").mapInPandas(
        fetch, "output_name string, status string, n_bytes long, path string"
    )


def simulated_head(url: str) -> str:
    """SANDBOX HEAD: header block whose Content-Length matches what
    simulated_transport would return for the same url."""
    return (
        "HTTP/1.1 200 OK\r\n"
        f"Content-Length: {len(simulated_transport(url))}\r\n"
        "Content-Type: application/octet-stream\r\n\r\n"
    )


def curl_head_transport(url: str, timeout_sec: int = TIMEOUT_SEC) -> str:
    out = subprocess.run(
        ["curl", "-sI", url], capture_output=True, timeout=timeout_sec, text=True
    )
    if out.returncode != 0:
        raise IOError(f"failed to get: {url}")
    return out.stdout


def head_shard_sizes(
    manifest: DataFrame,
    head: Callable[[str], str] = simulated_head,
) -> DataFrame:
    """Distributed S7: HEAD-probe every shard, parse Content-Length with
    the reference's regex, return (output_name, content_length) — null
    when the header is missing or the probe fails."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, lengths = [], []
            for url, name in zip(pdf["shard_url"], pdf["output_name"]):
                try:
                    m = _CONTENT_LENGTH_RE.search(head(url))
                    lengths.append(int(m.group(1)) if m else None)
                except Exception:  # noqa: BLE001
                    lengths.append(None)
                names.append(name)
            yield pd.DataFrame({"output_name": names, "content_length": lengths})

    return manifest.repartition("shard_num").mapInPandas(
        probe, "output_name string, content_length long"
    )
