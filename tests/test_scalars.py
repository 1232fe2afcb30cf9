"""Golden tests for the scalar parity layer (SURVEY §2.7), with
reference-derived vectors. Citations in the function docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.functions import (
    clean_csv,
    clean_tsv,
    first_lang,
    get_tld,
    normalize_mime,
    offset_header,
    url_ext_index,
    url_ext_warc,
)


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn(F.col("v"))).collect()]


def test_normalize_mime(spark):
    # CCIndexRecord.normalizeMime: lower, strip one lead/trail quote,
    # collapse whitespace, trim; null -> null
    vals = ['"Text/HTML"', '  TEXT/HTML ', 'a  b\t c', None, '""', 'x"y']
    got = _apply(spark, normalize_mime, vals)
    assert got == ["text/html", "text/html", "a b c", None, "", 'x"y']


def test_get_tld(spark):
    vals = [
        "https://www.example.com/a",   # com
        "https://example.org",          # org
        "http://host",                  # no dot -> ''
        "https://example.com./x",       # trailing dot -> ''
        "https://example.404/x",        # all-digit tld -> ''
        "https://sub.example.co.uk/y",  # uk
        None,                            # ''
        "notaurl",                      # no host -> ''
    ]
    got = _apply(spark, get_tld, vals)
    assert got == ["com", "org", "", "", "", "uk", "", ""]


def test_url_ext_index(spark):
    # AbstractRecordProcessor.getExtension quirks:
    vals = [
        "http://x/y.html",     # html
        "http://x/y.HTML",     # html (lowered)
        "http://x/y.verylong", # >5 after dot -> null
        "http://x/y.123",      # all digits -> null
        "http://x/y.123/",     # digits+slash: find() misses -> '123'
        "http://x/y",          # wait: contains '.'? no dot after host... 'http://x/y' has no '.' at all -> null
        "http://x/y.",         # '' ext
        None,
    ]
    got = _apply(spark, url_ext_index, vals)
    assert got == ["html", "html", None, None, "123", None, "", None]


def test_url_ext_warc(spark):
    # intended semantics of AbstractExtractor.getExtension (the reference
    # returns literal ".ext" for everything but htm — documented bug,
    # AbstractExtractor.java:193-195; we return the real extension)
    vals = [
        "http://x/y.pdf",
        "http://x/y.htm",          # -> .html remap
        "http://x/y.pdf?q=1.doc",  # query cut first -> .pdf
        "http://x/y",              # no match -> null
        "http://x/y.toolongext9",  # 9>8 chars -> null
    ]
    got = _apply(spark, url_ext_warc, vals)
    assert got == [".pdf", ".html", ".pdf", None, None]


def test_clean_tsv(spark):
    vals = [" a\tb\nc\r ", None, "ok"]
    got = _apply(spark, clean_tsv, vals)
    assert got == ["a b c", "", "ok"]


def test_clean_csv(spark):
    # the reference's only real unit test, ported verbatim:
    # test/org/tallison/cc/TestCCGetter.java:11-15
    vals = ['"test', 'test"', 'te"st', None, " sp ace "]
    got = _apply(spark, clean_csv, vals)
    assert got == ["test", "test", '"te""st"', "", " sp ace "]


def test_first_lang(spark):
    vals = ["eng", "eng,fra", "", None, "zho,eng,rus"]
    got = _apply(spark, first_lang, vals)
    assert got == ["eng", "eng", "NULL", "NULL", "zho"]


def test_offset_header(spark):
    df = spark.createDataFrame([(100, 50)], "o long, l long")
    got = df.select(offset_header("o", "l")).collect()[0][0]
    # CCIndexRecord.getOffsetHeader: bytes=offset-(offset+length-1)
    assert got == "bytes=100-149"
