"""Property-based parity: the Column-expression scalar layer must agree
with direct Python transliterations of the Java semantics on arbitrary
inputs (hypothesis generates them; one batched Spark pass evaluates)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.functions import (
    clean_csv,
    clean_tsv,
    normalize_mime,
    url_ext_index,
)

# --- Python transliterations of the Java methods (parity oracles) ---------


def py_normalize_mime(s):
    # CCIndexRecord.normalizeMime:98-106
    if s is None:
        return None
    s = s.lower()
    s = re.sub(r'^"|"$', "", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def py_clean_tsv(s):
    # AbstractRecordProcessor.clean:58-63 (Java trim strips <= 0x20)
    if s is None:
        return ""
    s = re.sub(r"^[\x00-\x20]+|[\x00-\x20]+$", "", s)
    return re.sub(r"[\r\n\t]", " ", s)


def py_clean_csv(s):
    # CCGetter.clean:316-332
    if s is None:
        return ""
    if s.startswith('"'):
        s = s[1:]
    if s.endswith('"'):
        s = s[:-1]
    if '"' in s:
        s = '"' + s.replace('"', '""') + '"'
    return re.sub(r"\s", " ", s)


def py_url_ext_index(u):
    # AbstractRecordProcessor.getExtension:38-55
    if u is None or len(u) == 0:
        return None
    i = u.rfind(".")
    if i < 0 or i + 6 < len(u):
        return None
    ext = u[i + 1 :]
    ext = re.sub(r"^[\x00-\x20]+|[\x00-\x20]+$", "", ext)  # Java trim
    if re.search(r"^\d+$", ext):
        return None
    ext = ext.lower()
    return re.sub(r"/$", "", ext, count=1)


# whitespace limited to the chars both Java \s and our regexes agree on
_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x85  "
    ),
    max_size=30,
)


def _run_batch(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn(F.col("v"))).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(_TEXT, min_size=150, max_size=150))
def test_properties_batched(spark, vals):
    # mimes: sprinkle quotes/whitespace shapes hypothesis rarely makes
    vals = vals + ['"x"', '""', ' \t a \n b ', '"', 'A"B', "..", "a.b/", ".123/"]
    for spark_fn, py_fn in (
        (normalize_mime, py_normalize_mime),
        (clean_tsv, py_clean_tsv),
        (clean_csv, py_clean_csv),
    ):
        got = _run_batch(spark, spark_fn, vals)
        want = [py_fn(v) for v in vals]
        bad = [(v, g, w) for v, g, w in zip(vals, got, want) if g != w]
        assert not bad, (spark_fn, bad[:5])
    # extension parity over url-ish strings
    urls = [f"http://h/{v}" for v in vals] + vals
    got = _run_batch(spark, url_ext_index, urls)
    want = [py_url_ext_index(u) for u in urls]
    bad = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not bad, bad[:5]
