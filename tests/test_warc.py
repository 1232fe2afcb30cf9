"""Real-WARC reader: in-test-built WARC files (plain, single-gzip, and
per-record-gzip-member — the Common Crawl convention) round-trip through
read_warc, and response records feed extract() end-to-end."""

from __future__ import annotations

import gzip
import io

import pytest

from simplecommoncrawlextractor_spark.operators.extraction import (
    ExtractorConfig,
    extract,
)
from simplecommoncrawlextractor_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_response_records,
)


def _record(wtype, uri, body, content_type="application/http;msgtype=response",
            truncated=None):
    h = [b"WARC/1.0",
         b"WARC-Type: " + wtype.encode(),
         b"WARC-Record-ID: <urn:uuid:0000-" + wtype.encode() + b">",
         b"WARC-Date: 2026-01-01T00:00:00Z"]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    if content_type:
        h.append(b"Content-Type: " + content_type.encode())
    if truncated:
        h.append(b"WARC-Truncated: " + truncated.encode())
    h.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http_response(payload, ctype="text/html", status=200):
    head = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload


HTML = b"<html><body>hello warc</body></html>"
PDF = b"%PDF-1.4 fake pdf body"


def _records():
    return [
        _record("warcinfo", None, b"software: test\r\n",
                content_type="application/warc-fields"),
        _record("request", "http://ex.com/a", b"GET /a HTTP/1.1\r\n\r\n",
                content_type="application/http;msgtype=request"),
        _record("response", "http://ex.com/a", _http_response(HTML)),
        _record("response", "http://ex.com/b.pdf",
                _http_response(PDF, ctype="application/pdf")),
        _record("response", "http://ex.com/trunc", _http_response(b"cut"),
                truncated="length"),
    ]


@pytest.mark.parametrize("mode", ["plain", "gzip_whole", "gzip_members"])
def test_read_warc_roundtrip(spark, tmp_path, mode):
    recs = _records()
    if mode == "plain":
        data = b"".join(recs)
        name = "f.warc"
    elif mode == "gzip_whole":
        data = gzip.compress(b"".join(recs))
        name = "f.warc.gz"
    else:  # one gzip member per record — the Common Crawl layout
        data = b"".join(gzip.compress(r) for r in recs)
        name = "f.warc.gz"
    p = tmp_path / name
    p.write_bytes(data)
    df = read_warc(spark, str(p))
    rows = {(r["warc_type"], r["target_uri"]): r for r in df.collect()}
    assert len(rows) == 5, mode
    resp = rows[("response", "http://ex.com/a")]
    assert bytes(resp["payload"]) == HTML
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html"
    assert rows[("response", "http://ex.com/trunc")]["truncated"] == "length"
    assert rows[("warcinfo", None)]["http_status"] is None


def test_warc_to_extract_end_to_end(spark, tmp_path):
    """The reference's pipeline on real WARC bytes: read → F3 response
    filter → extract (sniff, select, digest) — HTML sniffed and selected,
    PDF excluded by config, truncated dropped by F4."""
    p = tmp_path / "cc.warc.gz"
    p.write_bytes(b"".join(gzip.compress(r) for r in _records()))
    records = warc_response_records(read_warc(spark, str(p)))
    out = extract(
        records, ExtractorConfig(include_detected_mimes="^text/html")
    ).collect()
    assert len(out) == 1
    assert out[0]["url"] == "http://ex.com/a"
    assert bytes(out[0]["payload"]) == HTML
    assert out[0]["ext"] == ".html"


def test_parse_warc_tolerates_truncated_tail():
    recs = _records()
    blob = b"".join(recs)[: len(b"".join(recs)) - 30]  # cut mid-record
    parsed = list(parse_warc_bytes(blob))
    assert 0 < len(parsed) < 5  # stops cleanly at the damaged tail


def test_write_warc_round_trips_through_read_warc(spark, tmp_path):
    """crawl → archive → re-extract closed: write_warc emits CC-layout
    gzip members that read_warc round-trips bit-for-bit; payloads,
    mimes, and urls survive; reruns are byte-identical."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "url": [f"http://h{i%3}.ex.com/p/{i}" for i in range(40)],
            "payload": [f"body-{i}".encode() for i in range(40)],
            "header_mime": ["text/html" if i % 2 else "application/pdf"
                            for i in range(40)],
        }
    )
    from simplecommoncrawlextractor_spark.sources.warc import write_warc

    df = spark.createDataFrame(rows).repartition(4, "url")
    out1 = tmp_path / "arch1"
    n = write_warc(df, str(out1))
    assert n == 40
    back = read_warc(spark, str(out1 / "*.warc.gz")).collect()
    got = {r["target_uri"]: (bytes(r["payload"]), r["http_content_type"])
           for r in back}
    assert len(got) == 40
    for i in range(40):
        u = f"http://h{i%3}.ex.com/p/{i}"
        assert got[u] == (f"body-{i}".encode(),
                          "text/html" if i % 2 else "application/pdf")
    # determinism: same partitioning -> byte-identical archive files
    out2 = tmp_path / "arch2"
    write_warc(spark.createDataFrame(rows).repartition(4, "url"), str(out2))
    f1 = sorted(p.name for p in out1.iterdir())
    f2 = sorted(p.name for p in out2.iterdir())
    assert f1 == f2
    for name in f1:
        assert (out1 / name).read_bytes() == (out2 / name).read_bytes()


def test_write_warc_unicode_urls_truncated_header_and_rerun_cleanup(spark, tmp_path):
    """Round 3 review regressions pinned: non-latin IRIs archive and
    round-trip; truncated rows carry WARC-Truncated (so re-extract's F4
    still drops them); a rerun with fewer partitions leaves no stale
    part files."""
    import pandas as pd

    from simplecommoncrawlextractor_spark.sources.warc import write_warc

    rows = pd.DataFrame(
        {
            "url": ["http://ex.com/日本語/ページ", "http://ex.com/ok"],
            "payload": [b"unicode body", b"plain body"],
            "header_mime": ["text/html", "text/html"],
            "truncated": [None, "length"],
        }
    )
    out = tmp_path / "arch"
    n = write_warc(spark.createDataFrame(rows).repartition(6), str(out))
    assert n == 2
    back = {r["target_uri"]: r for r in read_warc(spark, str(out / "*.warc.gz")).collect()}
    assert bytes(back["http://ex.com/日本語/ページ"]["payload"]) == b"unicode body"
    assert back["http://ex.com/ok"]["truncated"] == "length"
    # the re-extract loop drops the truncated row again (F4)
    kept = warc_response_records(read_warc(spark, str(out / "*.warc.gz")))
    got = extract(kept, ExtractorConfig(include_detected_mimes=".")).collect()
    assert {r["url"] for r in got} == {"http://ex.com/日本語/ページ"}
    n_files_1 = len(list(out.glob("part-*.warc.gz")))
    # rerun with ONE partition: stale higher-numbered parts must vanish
    write_warc(spark.createDataFrame(rows).coalesce(1), str(out))
    files = sorted(p.name for p in out.glob("part-*.warc.gz"))
    assert len(files) == 1 and n_files_1 >= 1
    assert read_warc(spark, str(out / "*.warc.gz")).count() == 2


def test_inflate_many_members_linear():
    """8000 gzip members inflate in linear time (the decompressobj/
    unused_data loop was quadratic — minutes for this input)."""
    import gzip
    import time

    from simplecommoncrawlextractor_spark.sources.warc import _inflate

    member = gzip.compress(b"x" * 4096)
    blob = member * 8000
    t0 = time.time()
    out = _inflate(blob)
    dt = time.time() - t0
    assert len(out) == 4096 * 8000
    assert dt < 5.0, f"multi-member inflate too slow: {dt:.1f}s"


def test_parse_warc_rejects_negative_content_length():
    """A crafted record with Content-Length = -(header block + 4) rewinds
    pos to the record start — without the guard the generator yields the
    same record forever (r4 ADVICE finding). Must terminate and keep only
    the records before the malformed one."""
    good = _record("response", "http://ex.com/a", _http_response(b"ok"))
    bad_hdr = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://ex.com/evil\r\n")
    # length that rewinds pos exactly to the record start
    evil_len = -(len(bad_hdr) + len(b"Content-Length: -000\r\n") + 4)
    bad = bad_hdr + b"Content-Length: " + str(evil_len).encode() + b"\r\n\r\n"
    parsed = list(parse_warc_bytes(good + bad + good))
    assert len(parsed) == 1
    assert parsed[0]["target_uri"] == "http://ex.com/a"


def test_write_warc_sweeps_stale_attempt_tmp_files(spark, tmp_path):
    """Killed/speculative attempts leave .part-*.warc.gz.tmp files; the
    rerun cleanup must sweep them too (r4 ADVICE finding)."""
    import pandas as pd

    from simplecommoncrawlextractor_spark.sources.warc import write_warc

    out = tmp_path / "arch"
    out.mkdir()
    stale = out / ".part-00007.12345.warc.gz.tmp"
    stale.write_bytes(b"half-written attempt")
    rows = pd.DataFrame({"url": ["http://ex.com/x"], "payload": [b"b"],
                         "header_mime": ["text/html"]})
    write_warc(spark.createDataFrame(rows).coalesce(1), str(out))
    assert not stale.exists()
    assert sorted(p.name for p in out.iterdir()) == ["part-00000.warc.gz"]


def test_write_warc_8000_member_throughput_floor(spark, tmp_path):
    """Sink throughput guard on the 8000-member fixture: the Arrow-batched
    writer must stay within a generous wall-clock budget (catches a
    quadratic or per-row-pickling regression; the measured steady state
    is ~70k members/s on 8 tasks — see BASELINE.md round 5). Also pins
    that level-9 zlib members equal gzip.compress(mtime=0) bytes, the
    cross-version byte-compat the round-4 archives rely on."""
    import gzip
    import time
    import zlib

    import pandas as pd

    from simplecommoncrawlextractor_spark.sources.warc import write_warc

    rec = b"determinism probe " * 64
    assert zlib.compress(rec, 9, 31) == gzip.compress(rec, mtime=0)

    n = 8000
    rows = pd.DataFrame(
        {
            "url": [f"http://h{i%50}.ex.com/p/{i}" for i in range(n)],
            "payload": [f"body {i} ".encode() * 40 for i in range(n)],
            "header_mime": ["text/html"] * n,
        }
    )
    df = spark.createDataFrame(rows).repartition(8, "url")
    out = tmp_path / "arch8000"
    t0 = time.time()
    written = write_warc(df, str(out))
    dt = time.time() - t0
    assert written == n
    assert dt < 20.0, f"8000-member archive took {dt:.1f}s (expected ~1s)"
