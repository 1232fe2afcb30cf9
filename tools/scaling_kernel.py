"""North-rule scaling evidence job: run the frontier-dedup kernel under
``spark-submit --master local-cluster[E,4,8192] --py-files dist/ccspark.zip``
at two executor counts (the sandbox analog of N vs 4N cluster sizes) and
print one KERNEL_RESULT JSON line.

Kernel (the 'corrected' version — half of all candidates are already in
the seen set, so bloom-positive probes pay the exact confirm):
raw URLs → RFC 3986 canonicalize (Arrow UDF) → xxhash64 → bloom probe +
exact-confirm anti-join vs a seen set holding the canonical form of 50%
of the candidates → salted per-host politeness top-k.

Usage: spark-submit ... tools/scaling_kernel.py [n_urls] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "ccspark.zip")

from simplecommoncrawlextractor_spark.plans.frontier import (  # noqa: E402
    canonical_candidates,
    politeness_schedule,
)
from simplecommoncrawlextractor_spark.plans.state import BloomSeenSet  # noqa: E402


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = SparkSession.builder.getOrCreate()

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
    seen_host = F.when(k % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (k % 4999).cast("string"), F.lit(".example.com"))
    )
    seen_url = F.concat(
        F.lit("http://"), seen_host, F.lit("/P/"), k.cast("string"), F.lit("?a=1&b=2")
    )
    seen_rows = (
        seen_set.bucketize(
            spark.range(n_urls // 2).select(F.xxhash64(seen_url).alias("url_hash"))
        )
        .select("bucket", "url_hash")
        .cache()
    )
    seen_rows.count()
    blooms = seen_set.build_blooms(seen_rows).cache()
    blooms.count()

    def kernel() -> int:
        cand = canonical_candidates(urls)
        fresh = seen_set.probe(cand, seen_rows, blooms)
        return politeness_schedule(fresh, host_budget=200, salt_k=16).count()

    kernel()  # warmup: codegen JIT + python worker spin-up
    runs = []
    for _ in range(trials):
        t0 = time.time()
        n_sched = kernel()
        runs.append(round(time.time() - t0, 3))
    best = min(runs)
    print(
        "KERNEL_RESULT "
        + json.dumps(
            {
                "defaultParallelism": spark.sparkContext.defaultParallelism,
                "n_urls": n_urls,
                "runs": runs,
                "best": best,
                "scheduled": n_sched,
                "urls_per_sec": round(n_urls / best, 1),
                "load1": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
