"""Index-analytics operators A1-A15 + filters F1-F9 + orderings O1-O2
(SURVEY §2.3-§2.6) as DataFrame transformations over the CDX record shape.

The reference runs each of these as a hand-rolled thread-pool MapReduce:
one mapper instance per thread accumulating a HashMap, flushed to TSV shards
(e.g. cc/index/mappers/CountMimes.java:34-78), merged by separate reducer
programs (cc/index/reducers/SingleKeyReducer.java:36-64,
DoubleKeyReducer.java:35-74). Spark's groupBy().agg() gives the partial →
exchange → final plan automatically; both reducer programs vanish.

Count outputs follow the reference's emit order: count desc, key asc
tiebreak (utils/MapUtil.java:57-80 = O1); two-key outputs outer asc,
inner count desc (DoubleKeyReducer.java:64-71 = O2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalars import first_lang, get_tld, normalize_mime, url_ext_index

NULL_KEY = "NULL"


def _nz(c) -> F.Column:
    return F.coalesce(c, F.lit(NULL_KEY))


def with_derived(cdx: DataFrame) -> DataFrame:
    """Attach the derived analytic columns every mapper recomputes per row."""
    return (
        cdx.withColumn("mime_norm", normalize_mime("mime"))
        .withColumn("tld", get_tld("url"))
        .withColumn("ext", url_ext_index("url"))
        .withColumn("lang1", first_lang("languages"))
    )


# --- filters (SURVEY §2.3) -------------------------------------------------

def f1_status_200(df: DataFrame) -> DataFrame:
    """F1: keep status==200 (CountMimesByTopLevelDomains.java:58-60)."""
    return df.filter(F.col("status") == 200)


def f2_drop_robots(df: DataFrame) -> DataFrame:
    """F2: drop url.endsWith('robots.txt') (:63-65)."""
    return df.filter(~F.col("url").endswith("robots.txt"))


def f5_length_gates(df: DataFrame, min_len: int = 10_000) -> DataFrame:
    """F5: keep length >= min (ExtractByMimeExt.java:132-134); zero-length
    always dropped (Extractor.java:70-73)."""
    return df.filter((F.col("length") >= min_len) & (F.col("length") > 0))


def f7_digest_semijoin(df: DataFrame, digests: DataFrame) -> DataFrame:
    """F7/J1: keep rows whose digest is in the list — broadcast left-semi
    (FindURLsFromDigests.java:54-90)."""
    return df.join(F.broadcast(digests), "digest", "left_semi")


def f9_seen_antijoin(df: DataFrame, seen: DataFrame) -> DataFrame:
    """F9/J2: drop rows whose digest is already in the repository —
    left-anti (Extractor.java:89-91). The frontier-scale variant with bloom
    acceleration lives in plans/state.py."""
    return df.join(F.broadcast(seen), "digest", "left_anti")


# --- aggregations (SURVEY §2.4), O1/O2 ordering ------------------------------

def _o1(df: DataFrame, key: str) -> DataFrame:
    return df.orderBy(F.desc("cnt"), F.asc(key))


def a1_count_mimes(cdx: DataFrame) -> DataFrame:
    """A1: count by normalized header mime (CountMimes.java:53-78)."""
    d = with_derived(cdx).select(_nz(F.col("mime_norm")).alias("mime"))
    return _o1(d.groupBy("mime").agg(F.count("*").alias("cnt")), "mime")


def a2_count_ext(cdx: DataFrame) -> DataFrame:
    """A2: count by url extension (CountExt.java:54-83)."""
    d = with_derived(cdx).select(_nz(F.col("ext")).alias("ext"))
    return _o1(d.groupBy("ext").agg(F.count("*").alias("cnt")), "ext")


def a3_count_ext_by_mime(cdx: DataFrame) -> DataFrame:
    """A3: (ext, mime) counts (CountExtByMime.java:38-77), O2 order."""
    d = with_derived(cdx).select(
        _nz(F.col("ext")).alias("ext"), _nz(F.col("mime_norm")).alias("mime")
    )
    return (
        d.groupBy("ext", "mime")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("ext"), F.desc("cnt"), F.asc("mime"))
    )


def a4_count_mime_by_ext(cdx: DataFrame) -> DataFrame:
    """A4: (mime, ext) counts (CountMimeByExt.java:37-100), O2 order."""
    d = with_derived(cdx).select(
        _nz(F.col("mime_norm")).alias("mime"), _nz(F.col("ext")).alias("ext")
    )
    return (
        d.groupBy("mime", "ext")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("mime"), F.desc("cnt"), F.asc("ext"))
    )


def a5_count_tlds(cdx: DataFrame) -> DataFrame:
    """A5: count by TLD — NO status filter (CountTopLevelDomains.java:53-77)."""
    d = with_derived(cdx).select(F.col("tld"))
    return _o1(d.groupBy("tld").agg(F.count("*").alias("cnt")), "tld")


def a6_count_tld_mime_200(cdx: DataFrame) -> DataFrame:
    """A6: (tld, mime) counts, 200-only, robots dropped
    (CountMimesByTopLevelDomains.java:55-92)."""
    d = with_derived(f2_drop_robots(f1_status_200(cdx)))
    return (
        d.groupBy("tld", _nz(F.col("mime_norm")).alias("mime"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("tld"), F.desc("cnt"), F.asc("mime"))
    )


def a7_count_tld_mime_detected(cdx: DataFrame) -> DataFrame:
    """A7: (tld, detected mime) counts, 200-only, robots dropped
    (CountDetectedMimesByTopLevelDomains.java:55-92)."""
    d = with_derived(f2_drop_robots(f1_status_200(cdx)))
    return (
        d.groupBy("tld", _nz(normalize_mime("mime_detected")).alias("mime_detected"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("tld"), F.desc("cnt"), F.asc("mime_detected"))
    )


def a8_count_tld_charset(cdx: DataFrame) -> DataFrame:
    """A8: (tld, charset) counts, blank tlds AND blank charsets dropped
    (CountCharsetByTopLevelDomains.java:67-70: skips
    StringUtils.isBlank(tld) || isBlank(charset); getTLD returns '' for
    unparseable/trailing-dot/numeric hosts)."""
    d = with_derived(f2_drop_robots(f1_status_200(cdx))).filter(
        F.col("charset").isNotNull() & (F.trim(F.col("charset")) != "")
        & F.col("tld").isNotNull() & (F.trim(F.col("tld")) != "")
    )
    return (
        d.groupBy("tld", "charset")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("tld"), F.desc("cnt"), F.asc("charset"))
    )


def a9_count_tld_charset_lang(cdx: DataFrame) -> DataFrame:
    """A9: (tld, charset, first language), html/text DETECTED mimes only
    (CountCharsetAndLangByTopLevelDomains.java:57-112: the filter is
    normalizeMime(getMimeDetected()) null-mapped to 'NULL' then
    contains(html|text); charset maps empty→'UNK' via
    StringUtils.isEmpty — null or '', NOT whitespace-blank)."""
    d = with_derived(f2_drop_robots(f1_status_200(cdx)))
    mime_det = _nz(normalize_mime("mime_detected"))
    d = d.withColumn("__mdn", mime_det).filter(
        F.col("__mdn").contains("html") | F.col("__mdn").contains("text")
    )
    charset = (
        F.when(F.col("charset").isNull() | (F.col("charset") == ""), F.lit("UNK"))
        .otherwise(F.col("charset"))
    )
    return (
        d.groupBy("tld", charset.alias("charset"), F.col("lang1").alias("lang"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("tld"), F.asc("charset"), F.desc("cnt"), F.asc("lang"))
    )


def a10_mime_confusion(cdx: DataFrame) -> DataFrame:
    """A10: (header mime, detected mime) confusion matrix
    (CountMimesByMimesDetected.java:53-89)."""
    d = with_derived(cdx).select(
        _nz(F.col("mime_norm")).alias("mime"),
        _nz(normalize_mime("mime_detected")).alias("mime_detected"),
    )
    return (
        d.groupBy("mime", "mime_detected")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("mime"), F.asc("mime_detected"))
    )


def a11_run_stats(cdx: DataFrame) -> DataFrame:
    """A11: one-pass run statistics (ExtractorStats.java:30-103): records
    visited, 200-count, truncated count, distinct warc files, total bytes."""
    return cdx.agg(
        F.count("*").alias("visited"),
        F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("n_200"),
        F.sum(F.when(F.col("truncated").isNotNull(), 1).otherwise(0)).alias("n_truncated"),
        F.countDistinct("filename").alias("n_warcs"),
        F.sum("length").alias("total_bytes"),
    )


def o2_double_key_sort(cdx: DataFrame) -> DataFrame:
    """O2 standalone: two-level sort outer key asc, inner count desc
    (DoubleKeyReducer.java:64-71) over (filename, status)."""
    return (
        cdx.groupBy("filename", "status")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("filename"), F.desc("cnt"), F.asc("status"))
    )


def o4_politeness_topk(cdx: DataFrame, k: int = 3) -> DataFrame:
    """O4: per-host top-k priority window over the CDX-derived frontier —
    the SQL-checkable twin of plans/frontier.politeness_schedule (which
    adds the salting phase; same results by construction)."""
    # regexp host extraction, not parse_url: parse_url nulls out hosts with
    # a trailing dot, which would merge them all into one window partition
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    d = cdx.select(
        F.col("url"),
        host.alias("host"),
        (F.col("length") % 1000).alias("priority"),
        F.col("rec_id"),
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("rec_id")
    )
    return (
        d.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= k)
        .select("host", "fetch_rank", "url", "priority")
        .orderBy("host", "fetch_rank")
    )
