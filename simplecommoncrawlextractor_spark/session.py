"""SparkSession factory tuned for the engine.

Design notes (100 TB / multi-executor):
- AQE on (runtime coalesce, skew-join splitting) — the reference balances
  uneven gzip files with a hand-rolled work queue
  (cc-extractor/src/main/java/org/tallison/cc/index/CCIndexBatchReader.java:60-101);
  Spark's scheduler + AQE subsume it.
- Arrow on — every Python-side stage in this engine is a vectorized
  pandas UDF / mapInPandas / applyInPandas; zero per-row Python.
- shuffle.partitions defaults small for local test scale; production would
  size it to cluster cores × 2-3 or rely on AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "simplecommoncrawlextractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    pass ``local[8]`` vs ``local[32]`` to evidence scaling efficiency.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    # local-mode shuffle spills to tmpfs when available: at high local
    # parallelism the disk becomes the shuffle bottleneck long before CPU
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/ccspark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
