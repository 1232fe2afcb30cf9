"""Tests for outlink extraction, RFC 3986 canonicalization, the URL filter
chain, hashing, sniffing, and the synthetic interleaved documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.functions import (
    b32_sha1,
    canonicalize_url,
    extract_urls,
    url_filter_ok,
)
from simplecommoncrawlextractor_spark.functions.hashing import bucket_of, url_hash64
from simplecommoncrawlextractor_spark.functions.sniff import sniff_mime
from simplecommoncrawlextractor_spark.sources import interleaved_documents


def test_extract_urls(spark):
    df = spark.createDataFrame(
        [
            ("see https://a.com/x and //b.com/y end",),
            ("no links here",),
            (None,),
        ],
        "v string",
    )
    got = [r[0] for r in df.select(extract_urls("v")).collect()]
    assert got[0] == ["https://a.com/x", "http://b.com/y"]  # protocol-relative -> http:
    assert got[1] == []
    assert got[2] == []
    # non-http schemes must NOT be harvested as fabricated http URLs
    ftp = spark.createDataFrame(
        [("get ftp://files.ex.com/a.tar or wss://s.ex.com/ws now",)], "v string"
    )
    assert ftp.select(extract_urls("v")).collect()[0][0] == []


def test_canonicalize_url(spark):
    cases = {
        "https://a.com/x": "https://a.com/x",                      # fast path: unchanged
        "HTTP://WWW.Ex.COM:80/Index.HTML#frag": "http://www.ex.com/Index.HTML",
        "https://ex.com:8443/a": "https://ex.com:8443/a",           # non-default port kept
        "https://ex.com:443/a": "https://ex.com/a",                 # default port dropped
        "https://ex.com/p?b=2&a=1": "https://ex.com/p?a=1&b=2",     # params sorted
        "https://ex.com": "https://ex.com/",                        # path defaults to /
        "https://ex.com//a///b": "https://ex.com/a/b",              # slash collapse
        "ftp://ex.com/a": None,                                     # non-http dropped
        "nonsense": None,
        # RFC 3986 §6.2.2.2: percent-decode unreserved; §6.2.2.1 uppercase
        # the escapes that stay encoded
        "https://ex.com/%7Euser/%41x": "https://ex.com/~user/Ax",
        "https://ex.com/a%2fb%3a": "https://ex.com/a%2Fb%3A",
        # §5.2.4 dot-segment resolution (incl. a %2E-smuggled one)
        "https://ex.com/a/./b": "https://ex.com/a/b",
        "https://ex.com/a/../b": "https://ex.com/b",
        "https://ex.com/a/b/..": "https://ex.com/a/",
        "https://ex.com/a/b/.": "https://ex.com/a/b/",
        "https://ex.com/../../x": "https://ex.com/x",
        "https://ex.com/a/%2E%2E/b": "https://ex.com/b",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = [r[0] for r in df.select(canonicalize_url("v")).collect()]
    assert got == list(cases.values())


def test_url_filter_chain(spark):
    df = spark.createDataFrame(
        [
            ("https://ok.example.com/a",),
            ("https://localhost/x",),
            ("https://monster.example.com/" + "x" * 3100,),
            (None,),
        ],
        "v string",
    )
    got = [r[0] for r in df.select(url_filter_ok(F.col("v"))).collect()]
    assert got == [True, False, False, False]


def test_b32_sha1(spark):
    import base64
    import hashlib

    df = spark.createDataFrame([("hello",)], "v string")
    got = df.select(b32_sha1("v")).collect()[0][0]
    want = base64.b32encode(hashlib.sha1(b"hello").digest()).decode()
    assert got == want
    assert len(got) == 32  # FIXTURES: 32-char base32 digests


def test_sniff_mime(spark):
    df = spark.createDataFrame(
        [
            (bytearray(b"%PDF-1.7 blah"),),
            (bytearray(b"\x89PNG\r\n\x1a\n...."),),
            (bytearray(b"plain old text content here"),),
            (bytearray(bytes(range(200, 256)) * 3),),
            (bytearray(b"RIFF1234WEBP"),),
        ],
        "v binary",
    )
    got = [r[0] for r in df.select(sniff_mime("v")).collect()]
    assert got == [
        "application/pdf",
        "image/png",
        "text/plain",
        "application/octet-stream",
        "image/webp",
    ]


def test_hash_and_bucket(spark):
    df = spark.createDataFrame([("https://a.com/",), ("https://b.com/",)], "v string")
    out = df.select(
        url_hash64("v").alias("h"), bucket_of(url_hash64("v"), 64).alias("b")
    ).collect()
    assert out[0]["h"] != out[1]["h"]
    assert all(0 <= r["b"] < 64 for r in out)
    # determinism across evaluations
    again = df.select(url_hash64("v").alias("h")).collect()
    assert [r["h"] for r in again] == [r["h"] for r in out]


def test_interleaved_documents_shape(spark, sf_dir):
    docs = interleaved_documents(spark, sf_dir)
    rows = docs.limit(10).collect()
    assert rows and rows[0]["doc_id"].startswith("doc-")
    for r in rows:
        spans = r["spans"]
        assert 2 <= len(spans) <= 5
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in spans:
            assert s["kind"] in ("text", "media")
            if s["kind"] == "media":
                assert s["text"] == "" and s["media_ref"].startswith("payloads/")
    # deterministic: same content on re-read
    a = docs.orderBy("doc_id").limit(5).collect()
    b = interleaved_documents(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    assert a == b
