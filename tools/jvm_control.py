"""Same-window pure-JVM scaling control for the north-rule evidence.

A hash-aggregate + shuffle over (string host, long) rows with NO Python
anywhere — generated, grouped, and counted entirely in the JVM. If THIS
doesn't scale from 1 to 4 executors on this box, the bottleneck is the
shared memory bus, not our plan. Run under the exact same harness as the
kernel:

  spark-submit --master local-cluster[E,4,8192] \
      --conf spark.sql.shuffle.partitions=<4*E> \
      tools/jvm_control.py [n_rows] [trials]

Prints one CONTROL_RESULT JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = SparkSession.builder.getOrCreate()

    k = F.col("id")
    host = F.when(k % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (k % 4999).cast("string"), F.lit(".example.com"))
    )
    df = spark.range(n_rows).select(host.alias("host"), (k % 1000).alias("v"))

    def job() -> int:
        return (
            df.groupBy("host")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .count()
        )

    job()  # warmup
    runs = []
    for _ in range(trials):
        t0 = time.time()
        n = job()
        runs.append(round(time.time() - t0, 3))
    best = min(runs)
    print(
        "CONTROL_RESULT "
        + json.dumps(
            {
                "defaultParallelism": spark.sparkContext.defaultParallelism,
                "n_rows": n_rows,
                "runs": runs,
                "best": best,
                "groups": n,
                "rows_per_sec": round(n_rows / best, 1),
                "load1": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
