"""Simulated ranged fetch + FETCH_STATUS classification + fetch_log.

Reference: cc/CCGetter.java:133-251 fetches WARC payload slices from S3 with
HTTP Range headers, classifies the outcome into the 8-value FETCH_STATUS
enum (:69-78), re-digests the payload, stores it in the digest-addressed
repo, and appends a 14-column status row (:253-302). The threaded cousin
WReGetter shells out to wget with a 120 s timeout and 50 MB cap (:44-46).

Here the fetch stage is a single vectorized pass: the scheduled batch gets
deterministic simulated response columns (sources/synth.py — in production
this stage is a ``mapInPandas`` issuing real ranged GETs per Arrow batch;
the surrounding plan is identical), then MIME sniff, digest, classification
and the typed fetch_log projection — all column expressions and Arrow UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import b32_sha1
from ..functions.sniff import sniff_mime
from ..sources.synth import simulated_payload_columns

# Parity: cc/CCGetter.java:69-78
FETCH_STATUS = (
    "BAD_URL",                                   # 0
    "FETCHED_IO_EXCEPTION",                      # 1
    "FETCHED_NOT_200",                           # 2
    "FETCHED_IO_EXCEPTION_READING_ENTITY",       # 3
    "FETCHED_IO_EXCEPTION_SHA1",                 # 4
    "ALREADY_IN_REPOSITORY",                     # 5
    "FETCHED_EXCEPTION_COPYING_TO_REPOSITORY",   # 6
    "ADDED_TO_REPOSITORY",                       # 7
)

MAX_FETCH_BYTES = 50_000_000  # WReGetter.java:45

# Parity: the 14 columns of CCGetter.writeStatus (:264-268)
FETCH_LOG_COLUMNS = (
    "URL",
    "CC_MIME",
    "CC_MIME_DETECTED",
    "CC_LANGUAGES",
    "CC_CHARSET",
    "CC_DIGEST",
    "COMPUTED_DIGEST",
    "HEADER_ENCODING",
    "HEADER_TYPE",
    "HEADER_LANGUAGE",
    "HEADER_LENGTH",
    "ACTUAL_LENGTH",
    "WARC_IS_TRUNCATED",
    "FETCH_STATUS",
)


def simulate_fetch(scheduled: DataFrame) -> DataFrame:
    """Scheduled batch → fetched batch with response columns, sniffed MIME,
    computed digest and FETCH_STATUS. Input needs url_canon + url_hash."""
    cols = simulated_payload_columns(F.col("url_hash"))
    df = scheduled
    for name, col in cols.items():
        df = df.withColumn(name, col)
    df = df.withColumn("mime_detected", sniff_mime(F.col("body_prefix")))
    df = df.withColumn("computed_digest", b32_sha1(F.col("body_prefix")))
    status = (
        F.when(F.col("url_canon").isNull(), F.lit("BAD_URL"))
        .when(F.col("fetch_http_status") == -1, F.lit("FETCHED_IO_EXCEPTION"))
        .when(F.col("fetch_http_status") != 200, F.lit("FETCHED_NOT_200"))
        .when(F.col("body_len") > MAX_FETCH_BYTES, F.lit("FETCHED_IO_EXCEPTION_READING_ENTITY"))
        .otherwise(F.lit("ADDED_TO_REPOSITORY"))
    )
    return df.withColumn("fetch_status", status)


def fetch_log(fetched: DataFrame, extra=()) -> DataFrame:
    """Project the typed 14-column fetch log (K5). Unknown-in-simulation
    header fields are empty strings, exactly like the reference's
    clean(null) → '' (CCGetter.java:269-302). ``extra`` prepends audit
    columns (round, host, fetch_rank) for the crawl-ordering trail."""
    empty = F.lit("")
    return fetched.select(
        *extra,
        F.col("url_canon").alias("URL"),
        empty.alias("CC_MIME"),
        F.col("mime_detected").alias("CC_MIME_DETECTED"),
        empty.alias("CC_LANGUAGES"),
        empty.alias("CC_CHARSET"),
        empty.alias("CC_DIGEST"),
        F.col("computed_digest").alias("COMPUTED_DIGEST"),
        empty.alias("HEADER_ENCODING"),
        F.col("mime_detected").alias("HEADER_TYPE"),
        empty.alias("HEADER_LANGUAGE"),
        F.col("body_len").cast("string").alias("HEADER_LENGTH"),
        F.col("body_len").cast("string").alias("ACTUAL_LENGTH"),
        F.col("truncated").cast("string").alias("WARC_IS_TRUNCATED"),
        F.col("fetch_status").alias("FETCH_STATUS"),
    )


def synthetic_outlinks(fetched: DataFrame, max_fanout: int = 4) -> DataFrame:
    """Deterministic child URLs of successfully fetched pages (the sandbox
    stand-in for harvesting outlinks from the fetched payload — the real
    path runs harvest_outlinks over extracted spans). Fanout and cross-host
    hops derive from url_hash only, so every run/parallelism agrees."""
    ok = fetched.filter(F.col("fetch_status") == "ADDED_TO_REPOSITORY")
    fan = F.pmod(F.col("url_hash"), F.lit(max_fanout + 1)).cast("int")
    # NB: sequence(1, fan) would yield a DESCENDING [1, 0] when fan = 0
    # (Spark defaults step to -1 when start > stop) — slice a fixed ramp
    # instead so fan = 0 explodes to nothing.
    ramp = F.sequence(F.lit(1), F.lit(max_fanout))
    kids = ok.select(
        "url_canon",
        "url_hash",
        "host",
        F.explode(F.slice(ramp, 1, fan)).alias("i"),
    )
    child_host = F.when(
        F.pmod(F.col("url_hash") + F.col("i"), F.lit(5)) == 0,
        F.concat(F.lit("x"), F.conv((F.pmod(F.col("url_hash") + F.col("i"), F.lit(499))).cast("string"), 10, 16), F.lit(".example.com")),
    ).otherwise(F.col("host"))
    return kids.select(
        F.concat(
            F.lit("https://"),
            child_host,
            F.lit("/d/"),
            F.conv(F.abs(F.col("url_hash")).cast("string"), 10, 36),
            F.lit("/"),
            F.col("i").cast("string"),
        ).alias("url")
    )
