"""Frontier pipeline stages: harvest → canonicalize → candidate dedup →
politeness schedule.

Replaces: the reference's outlink harvester (wikilinks/
ExternalLinkExtractor.java:106-158 — URL extraction + regex mapper chain +
URI-validity), and its single FIFO work queue (no politeness exists in the
reference; the north rule adds the per-host priority queue).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import url_hash64
from ..functions.urls import extract_urls, url_filter_ok

FRONTIER_SCHEMA = (
    "url string, url_canon string, url_hash long, host string, "
    "priority double, discovered_at timestamp"
)


def harvest_outlinks(docs: DataFrame) -> DataFrame:
    """Interleaved documents → (doc_id, span_order, url).

    posexplode keeps span order (the per-row invariant is span-sequence
    equality on (kind, text, media_ref, order)); only text spans are
    scanned; extraction is one Arrow-batched pandas UDF over the span text.
    """
    from ..sources.tables import spread

    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("span_order", "span")
    ).filter(F.col("span.kind") == "text")
    # spread AFTER projecting down to the span text: a narrow benchmark
    # scan then shuffles only (doc_id, span_order, text) — not the full
    # span arrays — before the Arrow-UDF extraction fans out across cores
    spans = spread(
        spans.select("doc_id", "span_order", F.col("span.text").alias("__t"))
    )
    return spans.select(
        "doc_id",
        "span_order",
        F.explode(extract_urls(F.col("__t"))).alias("url"),
    )


def canonical_candidates(
    urls: DataFrame,
    url_col: str = "url",
    priority: Column | None = None,
    discovered_at: Column | None = None,
) -> DataFrame:
    """Candidate frontier rows: canonicalize (RFC 3986 UDF) → filter chain
    (fused JVM predicate, evaluated on the canonical form) → xxhash64 →
    within-batch dedup (first occurrence by deterministic order).

    Priority/discovered_at default to key-derived deterministic values, so
    any parallelism level yields the same frontier (north_rule resume +
    scaling clauses both need this).

    The canonical form is attached through ``with_canonical_url``'s
    mapInPandas barrier (round 6): with a plain ``withColumn``, pushing
    the F12 filter below the projection made ExtractPythonUDFs emit TWO
    ArrowEvalPython canonicalize nodes — every URL was canonicalized
    twice (plan nodes 11+14 in plans/r06/frontier_schedule_prod_before).
    """
    from ..functions.urls import with_canonical_url

    if priority is None and discovered_at is None:
        # the defaulted priority/discovered_at derive only from url_hash
        # and every output column is rebuilt from url/url_canon, so the
        # canonicalize barrier (opaque to column pruning, guide §4.1)
        # should carry ONLY the url column — harvest lineage
        # (doc_id, span_order) would otherwise ride through the Python
        # worker and die unread at the min_by dedup. Callers that inject
        # custom priority columns may reference other input columns, so
        # those keep the full row.
        urls = urls.select(url_col)
    c = with_canonical_url(urls, url_col)
    c = c.filter(url_filter_ok(F.col("url_canon")))
    c = c.withColumn("url_hash", url_hash64("url_canon")).withColumn(
        "host", F.parse_url("url_canon", F.lit("HOST"))
    )
    pr = priority if priority is not None else (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0)
    ts = (
        discovered_at
        if discovered_at is not None
        else F.timestamp_seconds(F.lit(1735689600) + F.pmod(F.col("url_hash"), F.lit(86400)))
    )
    c = c.withColumn("priority", pr.cast("double")).withColumn("discovered_at", ts)
    return dedup_by_hash(c)


def dedup_by_hash(c: DataFrame) -> DataFrame:
    """One row per url_hash, deterministic winner (best priority, earliest
    discovery, smallest canonical URL). ``min_by`` on a lexicographic key
    struct instead of a row_number window: aggregation gets map-side
    partial combine, so the shuffle carries one row per (partition,
    url_hash) instead of every duplicate — the difference between O(dups)
    and O(distinct) shuffle bytes at crawl scale."""
    key = F.struct(
        (-F.col("priority")).alias("np"),
        F.col("discovered_at").alias("d"),
        F.col("url_canon").alias("u"),
        # raw url last: canonical twins ('?a=1&b=2' vs '?b=2&a=1') share
        # url_canon AND the hash-derived priority/discovered_at, so without
        # this the retained 'url' would be partition-order dependent
        F.col("url").alias("w"),
    )
    row = F.struct("url", "url_canon", "host", "priority", "discovered_at")
    return (
        c.groupBy("url_hash")
        .agg(F.min_by(row, key).alias("r"))
        .select(
            F.col("r.url").alias("url"),
            F.col("r.url_canon").alias("url_canon"),
            F.col("url_hash"),
            F.col("r.host").alias("host"),
            F.col("r.priority").alias("priority"),
            F.col("r.discovered_at").alias("discovered_at"),
        )
    )


def politeness_schedule(
    frontier: DataFrame,
    host_budget: int = 10,
    salt_k: int = 8,
    budget_table: DataFrame | None = None,
) -> DataFrame:
    """Per-host politeness priority queue: at most ``host_budget`` URLs per
    host per round, best-priority first (SURVEY §2.5 O4 — the engine's only
    window function).

    Hot-host skew (north_rule clause): a naive
    ``Window.partitionBy(host)`` puts a 30%-hot host in ONE task. Two-phase
    top-k instead: (1) pre-rank within (host, salt) where
    salt = pmod(url_hash, salt_k) — the hot host spreads over salt_k tasks
    and each keeps only host_budget rows; (2) exact final rank over host on
    the ≤ salt_k × host_budget survivors. Ordering keys are data-derived
    only (priority, discovered_at, url_hash) — never partition ids — so the
    schedule is identical at any parallelism (N vs 4N clause).

    ``budget_table`` (host, host_budget) overrides the flat budget per host
    — the robots Crawl-delay input (plans/robots.py); broadcast-joined, so
    the frontier pays no extra shuffle.
    """
    if budget_table is not None:
        frontier = frontier.join(F.broadcast(budget_table), "host", "left")
        budget_col = F.coalesce(F.col("host_budget"), F.lit(host_budget))
    else:
        budget_col = F.lit(host_budget)
    order = [F.desc("priority"), F.asc("discovered_at"), F.asc("url_hash")]
    salted = frontier.withColumn("__salt", F.pmod(F.col("url_hash"), F.lit(salt_k)))
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    pre = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= budget_col)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    out = (
        pre.withColumn("fetch_rank", F.row_number().over(w2))
        .filter(F.col("fetch_rank") <= budget_col)
    )
    return out.drop("host_budget") if budget_table is not None else out
