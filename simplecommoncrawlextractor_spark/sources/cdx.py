"""CDX index scan + parse.

Reference: cc/index/CCIndexReader.java:39-65 streams gzipped index files
line-by-line (UTF-8, bad rows swallowed); cc/index/CCIndexRecord.java:149-206
parses ``SURT-key timestamp {json}`` rows (whole-row JSON also accepted,
:169-171) into an 11-field record, returning 0-or-1 records per line.

Spark-first shape: ``spark.read.text`` over the .gz glob (gzip is
unsplittable, so one file = one input partition — the same parallelism unit
as the reference's file-per-thread model; at 100 TB you list 300 shards per
crawl × many crawls and get full cluster width for free). The JSON suffix is
located with a greedy ``\\{.*\\}`` extract (equivalent to the reference's
"last candidate '}' wins" retry loop — it survives '}' inside field values,
e.g. the mime ``{$ext[1]}`` golden row from
test/org/tallison/cc/index/TestCCIndexRecord.java:10-19), parsed with
``from_json`` in PERMISSIVE mode, unparseable rows dropped — exactly the
reference's skip semantics.

We additionally keep the CDX timestamp the reference throws away
(CCIndexRecord.java:167-168 skips it): ``fetch_ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw JSON schema: CDX JSON carries numerics as strings; Gson coerces them
# (CCIndexRecord.java:42-52 binds status/length/offset to Integer). We parse
# as string then cast — identical tolerance.
_CDX_JSON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("mime-detected", StringType()),
        StructField("status", StringType()),
        StructField("digest", StringType()),
        StructField("length", StringType()),
        StructField("offset", StringType()),
        StructField("filename", StringType()),
        StructField("charset", StringType()),
        StructField("languages", StringType()),
        StructField("truncated", StringType()),
    ]
)

CDX_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("mime_detected", StringType()),
        StructField("status", StringType()),  # cast to int in parse
        StructField("digest", StringType()),
        StructField("length", LongType()),
        StructField("offset", LongType()),
        StructField("filename", StringType()),
        StructField("charset", StringType()),
        StructField("languages", StringType()),
        StructField("truncated", StringType()),
    ]
)


def parse_cdx_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """``SURT-key timestamp {json}`` lines → typed CDX records.

    Bad rows (no JSON object, or JSON missing a url) are dropped — parity
    with CCIndexRecord.parseRecords returning an empty list (:165-205).
    """
    v = F.col(value_col)
    js = F.regexp_extract(v, r"(\{.*\})", 1)
    # the token before the JSON is the 14-digit CDX timestamp (when present)
    ts_raw = F.regexp_extract(v, r"^\S+\s+(\d{14})\s+\{", 1)
    rec = F.from_json(js, _CDX_JSON_SCHEMA)
    out = (
        lines.select(
            rec.alias("r"),
            F.when(ts_raw != "", F.to_timestamp(ts_raw, "yyyyMMddHHmmss")).alias("fetch_ts"),
        )
        .select(
            F.col("r.url").alias("url"),
            F.col("r.mime").alias("mime"),
            F.col("r.`mime-detected`").alias("mime_detected"),
            F.col("r.status").cast("int").alias("status"),
            F.col("r.digest").alias("digest"),
            F.col("r.length").cast("bigint").alias("length"),
            F.col("r.offset").cast("bigint").alias("offset"),
            F.col("r.filename").alias("filename"),
            F.col("r.charset").alias("charset"),
            F.col("r.languages").alias("languages"),
            F.col("r.truncated").alias("truncated"),
            F.col("fetch_ts"),
        )
        .filter(F.col("url").isNotNull())
    )
    return out


def read_cdx(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan gzipped (or plain) CDX index files and parse to typed records.

    Deterministic input order is the plan's job, not the scheduler's —
    downstream consumers order by explicit keys (SURVEY §2.5 O3), never by
    arrival. The reference instead sorts the file list
    (CCIndexReader.java:78)."""
    return parse_cdx_lines(spark.read.text(path_glob))
