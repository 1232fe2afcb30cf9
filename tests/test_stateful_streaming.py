"""applyInPandasWithState: cross-batch per-host budget gate."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.streaming.stateful import host_budget_gate

CAND_SCHEMA = "host string, url_canon string, url_hash long, priority double"


def _drop(spark, path, rows):
    spark.createDataFrame(rows, CAND_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_host_budget_persists_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: host a gets 8 candidates (budget 5), host b gets 2
    _drop(spark, src, [("a.com", f"https://a.com/{i}", i, float(i)) for i in range(8)]
          + [("b.com", f"https://b.com/{i}", 100 + i, float(i)) for i in range(2)])

    stream = spark.readStream.schema(CAND_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    gated = host_budget_gate(stream, lifetime_budget=5)
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    per_host = {r["host"]: r["count"] for r in got.groupBy("host").count().collect()}
    assert per_host == {"a.com": 5, "b.com": 2}
    # best-priority-first admission for the capped host
    a_urls = {r["url_canon"] for r in got.filter(F.col("host") == "a.com").collect()}
    assert a_urls == {f"https://a.com/{i}" for i in (3, 4, 5, 6, 7)}

    # batch 2: more a.com (should be fully suppressed: budget exhausted)
    # and more b.com (3 remaining of its budget)
    _drop(spark, src, [("a.com", f"https://a.com/x{i}", 200 + i, 9.0) for i in range(4)]
          + [("b.com", f"https://b.com/y{i}", 300 + i, 9.0) for i in range(5)])
    q2 = (
        host_budget_gate(
            spark.readStream.schema(CAND_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src),
            lifetime_budget=5,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)  # SAME checkpoint: state resumes
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    time.sleep(1)
    got2 = spark.read.parquet(out)
    per_host2 = {r["host"]: r["count"] for r in got2.groupBy("host").count().collect()}
    assert per_host2 == {"a.com": 5, "b.com": 5}  # a capped, b topped up to 5