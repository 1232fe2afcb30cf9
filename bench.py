"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Also measures the north-rule scaling evidence when SPARK_GRAFT_SCALING=1:
the same frontier job at local[8] vs local[32] on identical input, with
throughput at both and the scaling efficiency (see BENCH notes in
BASELINE.md). Scaling mode spawns fresh JVMs per parallelism via
subprocess, because one SparkContext pins its master for the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: the frontier pipeline + the widest-coverage analytics.
BENCH_QUERIES = [
    "a1_count_mimes",
    "a6_count_tld_mime_200",
    "a10_mime_confusion",
    "a11_run_stats",
    "o4_politeness_topk",
    "f9_seen_antijoin",
    "f10_downsample_strata",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_lsh_bucketed",
    "ann_multiprobe_top1",
    "text_quality",
    "events_sessionize",
    "frontier_schedule_batch",
    "s9_wiki_external_links",
    "dedup_simhash_prod",  # xxhash64 production path, segment-capped
    "dedup_minhash_prod",  # xxhash64 production path, band-capped
    "frontier_schedule_prod",  # default xxhash64-priority path, no sort
    "semantic_dedup_pairs",  # SemDeDup: quantized k-means + cluster cosine
    "warc_roundtrip_records",  # real gzip+WARC archive write → re-read
]


def _extra_bench_queries() -> dict:
    """Bench-only variants not in the driver gate: the gate runs the md5
    (oracle-replayable) hash modes; the bench also measures the xxhash64
    production paths with the same caps, so a regression there is
    caught even though they have no gate row."""
    from simplecommoncrawlextractor_spark.operators import dedup as D
    from simplecommoncrawlextractor_spark.sources.tables import load_table

    from simplecommoncrawlextractor_spark.plans.frontier import (
        canonical_candidates,
        harvest_outlinks,
        politeness_schedule,
    )
    from simplecommoncrawlextractor_spark.sources import interleaved_documents

    def frontier_schedule_prod(s, d):
        # the PRODUCTION frontier batch: default xxhash64-derived priority
        # and no output sort — the gate entry of the same name injects an
        # oracle-replayable md5 priority and orders its output, which is a
        # (slightly costlier) different plan; this keeps the round-over-
        # round continuity number for the real path
        cand = canonical_candidates(harvest_outlinks(interleaved_documents(s, d)))
        return politeness_schedule(cand, host_budget=5, salt_k=4).select(
            "host", "fetch_rank", "url_canon", "url_hash", "priority"
        )

    from simplecommoncrawlextractor_spark.operators import similarity as SIM

    def _emb(s, d):
        return load_table(s, d, "embeddings")

    return {
        # gate seat retired round 5 (seat now carries warc_roundtrip_records);
        # benched here so the round-over-round continuity number survives
        "ann_multiprobe_top1": lambda s, d: SIM.ann_multiprobe_top1(
            _emb(s, d), dim=64, n_planes=4, n_tables=4, max_bucket=512
        ),
        "dedup_simhash_prod": lambda s, d: D.simhash_near_dups(
            load_table(s, d, "documents"), max_hamming=8
        ),
        "dedup_minhash_prod": lambda s, d: D.minhash_lsh_candidates(
            load_table(s, d, "documents"), hash_mode="xxhash64"
        ),
        "frontier_schedule_prod": frontier_schedule_prod,
    }


def run_bench() -> dict:
    import __spark_entry__ as entrymod
    from simplecommoncrawlextractor_spark import get_spark

    spark = get_spark(
        app_name="ccspark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    queries = {**entrymod.queries(), **_extra_bench_queries()}
    timings: dict[str, float] = {}
    # warm the JVM (codegen JIT) and the Arrow python workers once — the
    # steady-state number is the one that predicts 100 TB behavior; cold
    # start is a per-process constant, not a per-row cost
    from pyspark.sql import functions as F

    from simplecommoncrawlextractor_spark.functions import canonicalize_url

    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    spark.range(100_000).select(
        canonicalize_url(F.concat(F.lit("HTTP://W.Ex.COM:80/p/"), F.col("id").cast("string")))
    ).count()
    # warm the actual query shapes (codegen JIT + python workers for their
    # UDF stages) against the smallest sibling scale factor — a plain
    # count() would prune the CDX CASE derivations and warm nothing
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for wq in ("a1_count_mimes", "frontier_schedule_batch", "ann_lsh_bucketed"):
        queries[wq](spark, warm_dir).count()
    # per-query best-of-N: this box is multi-tenant, so a single timed pass
    # can record a co-tenant's load spike as "our" regression (it did, in
    # round 3). Best-of-N suppresses that; the recorded load averages make
    # any residual noisy window visible in the artifact itself.
    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))
    load_before = round(os.getloadavg()[0], 2)
    all_runs: dict[str, list[float]] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = queries[name]
        best, runs, n = None, [], 0
        for _ in range(trials):
            t0 = time.time()
            n = fn(spark, SF_DIR).count()
            dt = time.time() - t0
            runs.append(round(dt, 3))
            if best is None or dt < best:
                best = dt
        timings[name] = round(best, 3)
        all_runs[name] = runs
        total += best
        print(f"# {name}: best {best:.3f}s of {runs} ({n} rows)", file=sys.stderr)
    # the north-rule metric, IN the per-round artifact: one compact
    # frontier-dedup kernel measurement (canonicalize → bloom probe →
    # exact confirm → politeness top-k) at this session's parallelism.
    # Small n + best-of-2 keeps it ~15 s; the full two-cluster-size
    # methodology lives in tools/scaling_kernel.py + BASELINE.md.
    # sample load BEFORE the kernel so before/after still brackets the
    # headline-query window the pair was added to diagnose
    load_after = round(os.getloadavg()[0], 2)
    kernel = run_dedup_throughput(
        n_urls=int(os.environ.get("SPARK_GRAFT_KERNEL_URLS", "2000000")),
        trials=2,
        reuse_session=True,
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(CPUS),
        "trials": trials,
        "runs": all_runs,
        "load1_before": load_before,
        "load1_after": load_after,
        "kernel_urls_per_sec": kernel["urls_per_sec"],
        "kernel_n_urls": kernel["n_urls"],
        "kernel_load1": kernel["load1"],
    }


def run_scheduler_throughput(n_seeds: int, rounds: int) -> dict:
    """URLs scheduled/sec + dedup rows/sec for the frontier drain loop —
    invoked in a fresh interpreter per parallelism level."""
    import shutil
    import tempfile

    from simplecommoncrawlextractor_spark import get_spark
    from simplecommoncrawlextractor_spark.plans import CrawlScheduler, StateStore
    from simplecommoncrawlextractor_spark.sources import seed_frontier

    spark = get_spark(
        app_name="ccspark-scaling",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    root = tempfile.mkdtemp(prefix="ccspark-bench-state-")
    try:
        store = StateStore(root)
        sched = CrawlScheduler(
            spark,
            store,
            host_budget=int(os.environ.get("SPARK_GRAFT_BUDGET", "20")),
            salt_k=8,
            n_buckets=64,
        )
        sched.bootstrap(
            seed_frontier(
                spark,
                n=n_seeds,
                n_hosts=int(os.environ.get("SPARK_GRAFT_HOSTS", "997")),
            )
        )
        t0 = time.time()
        stats = sched.run(rounds)
        dt = time.time() - t0
        scheduled = sum(s["fetched"] for s in stats)
        return {
            "cpus": int(CPUS),
            "seconds": round(dt, 3),
            "urls_scheduled": scheduled,
            "urls_per_sec": round(scheduled / dt, 1),
            "load1": round(os.getloadavg()[0], 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_dedup_throughput(
    n_urls: int, trials: int = 3, reuse_session: bool = False
) -> dict:
    """The scaling-evidence kernel (north rule: same job at N and 4N
    parallelism): raw URLs → RFC 3986 canonicalize (Arrow UDF) → xxhash64 →
    bloom probe vs an n_urls-hash URL-seen set → exact-confirm anti-join →
    salted politeness top-k. Warmup run first (JIT + python-worker spin-up
    excluded), then best-of-``trials`` — the host is multi-tenant, so
    per-run noise is large and max throughput is the capability number.
    """
    from pyspark.sql import functions as F

    from simplecommoncrawlextractor_spark import get_spark
    from simplecommoncrawlextractor_spark.plans.frontier import (
        canonical_candidates,
        politeness_schedule,
    )
    from simplecommoncrawlextractor_spark.plans.state import BloomSeenSet

    if reuse_session:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
    else:
        spark = get_spark(
            app_name="ccspark-dedup-scaling",
            master=f"local[{CPUS}]",
            shuffle_partitions=int(CPUS) * 2,
        )
    seen_set = BloomSeenSet(n_buckets=256)
    k = F.col("id")
    host = F.when(k % 10 < 3, F.lit("HOT.Example.COM")).otherwise(
        F.concat(F.lit("h"), (k % 4999).cast("string"), F.lit(".Example.com"))
    )
    raw = F.concat(
        F.lit("HTTP://"), host, F.lit(":80/P/"), k.cast("string"), F.lit("?b=2&a=1#f")
    )
    urls = spark.range(n_urls).select(raw.alias("url")).cache()
    urls.count()
    # the seen set holds the CANONICAL form of the first half of the
    # candidates — 50% of probes are true bloom-positives that must be
    # confirmed by the exact anti-join (measuring only the bloom-negative
    # fast path would overstate dedup throughput)
    seen_host = F.when(k % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (k % 4999).cast("string"), F.lit(".example.com"))
    )
    seen_url = F.concat(
        F.lit("http://"), seen_host, F.lit("/P/"), k.cast("string"), F.lit("?a=1&b=2")
    )
    seen_rows = seen_set.bucketize(
        spark.range(n_urls // 2).select(F.xxhash64(seen_url).alias("url_hash"))
    ).select("bucket", "url_hash").cache()
    seen_rows.count()
    blooms = seen_set.build_blooms(seen_rows).cache()
    blooms.count()

    def kernel() -> int:
        cand = canonical_candidates(urls)
        fresh = seen_set.probe(cand, seen_rows, blooms)
        return politeness_schedule(fresh, host_budget=200, salt_k=16).count()

    kernel()  # warmup
    best, runs = None, []
    for _ in range(trials):
        t0 = time.time()
        n_sched = kernel()
        dt = time.time() - t0
        runs.append(round(dt, 3))
        if best is None or dt < best:
            best = dt
    return {
        "cpus": int(CPUS),
        "n_urls": n_urls,
        "runs_sec": runs,
        "best_sec": round(best, 3),
        "scheduled": n_sched,
        "urls_per_sec": round(n_urls / best, 1),
        "load1": round(os.getloadavg()[0], 2),
    }


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_SCALING") == "2":
        out = run_dedup_throughput(
            n_urls=int(os.environ.get("SPARK_GRAFT_CANDS", "4000000")),
            trials=int(os.environ.get("SPARK_GRAFT_TRIALS", "3")),
        )
    elif os.environ.get("SPARK_GRAFT_SCALING") == "1":
        out = run_scheduler_throughput(
            n_seeds=int(os.environ.get("SPARK_GRAFT_SEEDS", "60000")),
            rounds=int(os.environ.get("SPARK_GRAFT_ROUNDS", "3")),
        )
    else:
        out = run_bench()
    print(json.dumps(out))
