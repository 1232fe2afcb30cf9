"""S6/S7: shard manifest, distributed download, HEAD size probe
(CCIndexWGetter.java:30-117, CCIndexSizeGetter.java:33-132)."""

from __future__ import annotations

import gzip
import os

from simplecommoncrawlextractor_spark.sources.shards import (
    download_shards,
    head_shard_sizes,
    shard_manifest,
    simulated_transport,
)


def test_shard_manifest_shape(spark):
    m = shard_manifest(spark, "CC-MAIN-2026-08", n_shards=300)
    rows = m.orderBy("shard_num").collect()
    assert len(rows) == 300
    assert rows[0]["shard_url"] == (
        "https://commoncrawl.s3.amazonaws.com/cc-index/collections/"
        "CC-MAIN-2026-08/indexes/cdx-00000.gz"
    )
    assert rows[299]["output_name"] == "CC-MAIN-2026-08-cdx-00299.gz"


def test_download_and_head_agree(spark, tmp_path):
    out = str(tmp_path / "shards")
    m = shard_manifest(spark, "CC-MAIN-2026-08", n_shards=24)
    got = {r["output_name"]: r for r in download_shards(m, out).collect()}
    assert len(got) == 24 and all(r["status"] == "ok" for r in got.values())
    # files exist, are valid gzip, and byte counts match the report
    for name, r in got.items():
        p = os.path.join(out, name)
        assert os.path.getsize(p) == r["n_bytes"]
        assert gzip.decompress(open(p, "rb").read()).startswith(b"com,example)/")
    # S7 HEAD probe reports the same sizes the downloads produced
    heads = {r["output_name"]: r["content_length"] for r in head_shard_sizes(m).collect()}
    assert heads == {n: r["n_bytes"] for n, r in got.items()}


def test_download_isolates_failures(spark, tmp_path):
    def flaky(url: str) -> bytes:
        if url.endswith("3.gz"):
            raise IOError("simulated 404")
        return simulated_transport(url)

    m = shard_manifest(spark, "CC-TEST", n_shards=10)
    rows = {r["output_name"]: r["status"] for r in
            download_shards(m, str(tmp_path / "s"), transport=flaky).collect()}
    assert rows["CC-TEST-cdx-00003.gz"].startswith("failed")
    assert sum(1 for s in rows.values() if s == "ok") == 9


def test_simulated_transport_size_closed_form():
    """The oracle's arithmetic (23 + 75·(40+num%23)) must match the real
    bytes produced, and the payload must stay valid gzip'd CDX lines."""
    from simplecommoncrawlextractor_spark.sources.shards import shard_payload_size

    for num in (0, 1, 7, 22, 23, 299):
        url = f"https://commoncrawl.s3.amazonaws.com/x/indexes/cdx-{num:05d}.gz"
        blob = simulated_transport(url)
        assert len(blob) == shard_payload_size(num) == 23 + 75 * (40 + num % 23)
        text = gzip.decompress(blob).decode()
        lines = text.splitlines(keepends=True)
        assert len(lines) == 40 + num % 23
        assert all(len(ln) == 75 for ln in lines)
