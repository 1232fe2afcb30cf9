"""Synthetic CDX view: one shared ANSI-SQL derivation that runs VERBATIM in
both Spark SQL and DuckDB, projecting the driver's ``orders`` table into the
11-field CDX record shape (cc/index/CCIndexRecord.java:42-52, FIXTURES.md §2).

Why SQL instead of DataFrame here: the correctness gate compares our Spark
results against DuckDB on the same inputs; deriving the synthetic columns
from one shared string removes any possibility of derivation skew. The
*operators* on top are idiomatic DataFrame code (operators/analytics.py).

Every quirk the scalar layer must handle is represented: quoted/mixed-case/
padded/null mimes (normalizeMime), numeric TLDs / trailing-dot hosts (getTLD
edge cases), robots.txt rows, >5-char and all-digit extensions, colliding
digests, 404/301/503 statuses, blank charsets, comma-joined languages,
truncated markers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table, spread

CDX_SQL = """
SELECT
  o_orderkey AS rec_id,
  'https://' ||
    CASE WHEN o_orderkey % 17 = 0 THEN 'hot.example.com'
         WHEN o_orderkey % 11 = 0 THEN 'host' || CAST(o_custkey % 199 AS STRING) || '.example.404'
         WHEN o_orderkey % 11 = 1 THEN 'host' || CAST(o_custkey % 199 AS STRING) || '.example.com.'
         ELSE 'host' || CAST(o_custkey % 199 AS STRING) || '.example.' ||
              CASE o_orderkey % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END
    END ||
    '/p/' || CAST(o_orderkey AS STRING) ||
    CASE o_orderkey % 7 WHEN 0 THEN '/robots.txt' WHEN 1 THEN '.html' WHEN 2 THEN '.PDF'
         WHEN 3 THEN '.verylongext' WHEN 4 THEN '.123' WHEN 5 THEN '.x2/' ELSE '' END
    AS url,
  CASE o_orderkey % 6 WHEN 0 THEN '"Text/HTML"' WHEN 1 THEN ' TEXT/HTML  ' WHEN 2 THEN 'application/pdf'
       WHEN 3 THEN 'image/png' WHEN 4 THEN NULL ELSE 'text/plain' END AS mime,
  CASE o_orderkey % 5 WHEN 0 THEN 'text/html' WHEN 1 THEN 'application/pdf' WHEN 2 THEN 'image/png'
       WHEN 3 THEN 'application/octet-stream' ELSE 'text/plain' END AS mime_detected,
  CASE o_orderkey % 10 WHEN 0 THEN 404 WHEN 1 THEN 301 WHEN 2 THEN 503 ELSE 200 END AS status,
  md5(CAST(o_orderkey % 1201 AS STRING)) AS digest,
  CAST(floor(o_totalprice) AS BIGINT) AS length,
  (o_orderkey % 900007) * 1000 AS offset,
  'crawl-data/CC-MAIN-2026-08/seg-' || CAST(o_custkey % 20 AS STRING) || '.warc.gz' AS filename,
  CASE o_orderkey % 8 WHEN 0 THEN '' WHEN 1 THEN NULL WHEN 2 THEN 'UTF-8' WHEN 3 THEN 'ISO-8859-1'
       WHEN 4 THEN 'utf-8' ELSE 'windows-1252' END AS charset,
  CASE o_orderkey % 9 WHEN 0 THEN NULL WHEN 1 THEN '' WHEN 2 THEN 'eng' WHEN 3 THEN 'eng,fra'
       WHEN 4 THEN 'zho,eng,rus' ELSE 'deu' END AS languages,
  CASE o_orderkey % 12 WHEN 0 THEN 'length' WHEN 1 THEN 'time' WHEN 2 THEN 'disconnect' ELSE NULL END AS truncated
FROM orders
""".strip()


def cdx_view(spark: SparkSession, sf_dir: str, spread_scan: bool = True) -> DataFrame:
    """Materialize the shared CDX derivation as a DataFrame (registers the
    ``orders`` temp view first).

    The base scan is ``spread`` (round 6): the benchmark parquet arrives
    as a single row group, so every per-row derivation here (md5 digest,
    four regexes, parse_url) would otherwise run inside one or two scan
    tasks — the round-robin exchange of the three narrow source columns
    is far cheaper than serializing the derivation (guide §2.5 input
    skew: repartition immediately after a too-few-splits read). At real
    scale the scan carries enough splits that spread is a metadata-only
    no-op.

    ``spread_scan=False`` keeps the raw scan for the handful of cheap
    aggregate consumers (a1/a11/f9/f10) whose per-row derivation is
    lighter than the exchange itself — measured +0.1-0.3 s each at sf1.0
    with the spread, a strict loss for them; the derivation-heavy family
    (a6/a10/o4/p1/p2/...) keeps the default. Row values are identical
    either way (the exchange only reorders rows), which the DuckDB oracle
    replay pins."""
    orders = load_table(spark, sf_dir, "orders").select(
        # project BEFORE the exchange: the derivation reads exactly these
        # three columns, and an unprojected repartition would ship the
        # whole row (o_comment included) through the shuffle (guide §2.3)
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    if spread_scan:
        orders = spread(orders)
    orders.createOrReplaceTempView("orders")
    return spark.sql(CDX_SQL)


def oracle_cte(body_sql: str) -> str:
    """Wrap an oracle query body with the shared CDX CTE for DuckDB."""
    return f"WITH cdx AS ({CDX_SQL})\n{body_sql}"
