"""Sampling (F10/F11) and field-mapper chain (F12-F14) unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.functions.mappers import (
    capture_field_mapper,
    filter_field_mapper,
    identity_field_mapper,
)
from simplecommoncrawlextractor_spark.operators.sampling import (
    ANY_TLD,
    resolve_rate,
    sample_tally,
    stratified_sample,
    tld_mime_rate,
)


def test_resolve_rate_exact_then_regex_then_default(spark):
    rates = {"text/html": 0.5, "/pdf/": 0.25, "/^image//": 0.75}
    df = spark.createDataFrame(
        [("text/html",), ("application/pdf",), ("image/png",), ("audio/ogg",)],
        "mime string",
    )
    got = [
        r[0] for r in df.select(resolve_rate(F.col("mime"), rates, 0.1)).collect()
    ]
    assert got == [0.5, 0.25, 0.75, 0.1]


def test_stratified_sample_seeded_and_deterministic(spark):
    df = spark.range(2000).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a/b' ELSE 'c/d' END AS mime"
    )
    rates = {"a/b": 1.0, "c/d": 0.0}
    out = stratified_sample(df, rates, "mime", seed=42)
    rows = out.collect()
    assert len(rows) == 1000 and all(r["mime"] == "a/b" for r in rows)
    # rate-in-(0,1) is seed-stable
    half = stratified_sample(df, {"a/b": 0.5, "c/d": 0.5}, "mime", seed=7)
    a = sorted(r["id"] for r in half.collect())
    b = sorted(r["id"] for r in half.collect())
    assert a == b and 0 < len(a) < 2000


def test_tld_mime_rate_any_tld_fallback(spark):
    table = {
        "com": {"text/html": 0.1},
        ANY_TLD: {"text/html": 0.9, "/.*/": 0.3},
    }
    df = spark.createDataFrame(
        [("com", "text/html"), ("org", "text/html"), ("org", "app/x")],
        "tld string, mime string",
    )
    got = [
        round(r[0], 2)
        for r in df.select(
            tld_mime_rate(F.col("tld"), F.col("mime"), table, 0.0)
        ).collect()
    ]
    assert got == [0.1, 0.9, 0.3]


def test_sample_tally(spark):
    df = spark.range(100)
    got = sample_tally(df, F.col("id") < 35).collect()[0]
    assert got["selected"] == 35 and got["total"] == 100


def test_capture_field_mapper_policies(spark):
    df = spark.createDataFrame([("abc123",), ("nope",)], "v string")
    skip = [
        r[0]
        for r in df.select(
            capture_field_mapper("v", r"([a-z]+)(\d+)", "n=$2,w=$1")
        ).collect()
    ]
    assert skip == ["n=123,w=abc", None]
    as_is = [
        r[0]
        for r in df.select(
            capture_field_mapper("v", r"(\d+)", "num:$1", fail_policy="STORE_AS_IS")
        ).collect()
    ]
    assert as_is == ["num:123", "nope"]


def test_filter_and_identity_mappers(spark):
    df = spark.createDataFrame(
        [("http://spam.example/x",), ("http://ok.example/y",)], "v string"
    )
    got = [r[0] for r in df.select(filter_field_mapper("v", "spam")).collect()]
    assert got == [None, "http://ok.example/y"]
    messy = spark.createDataFrame([("  a\n \n\n  b\t",)], "v string")
    # Java-parity: trim both ends (all <= 0x20), blank-line runs -> \n\n
    assert messy.select(identity_field_mapper("v")).collect()[0][0] == "a\n\nb"
