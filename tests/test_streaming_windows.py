"""Watermarked windowed aggregation: late rows inside the watermark update
their window; rows later than the watermark are dropped (append mode emits
each window exactly once)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.streaming.windows import windowed_fetch_rates

SCHEMA = "event_time timestamp, host string, ok boolean"


def _drop(spark, path, rows):
    df = spark.createDataFrame(rows, "t long, host string, ok boolean").select(
        F.timestamp_seconds("t").alias("event_time"), "host", "ok"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_fetch_rates(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_watermarked_windows(spark, tmp_path):
    from datetime import datetime, timezone

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    base = 1_700_000_040  # minute-aligned epoch (divisible by 60)
    # batch order is forced by running the stream to completion after each
    # drop (one shared checkpoint carries the watermark forward) — the file
    # source gives no intra-run ordering guarantee across dropped files.
    # run 1: two windows of a.com traffic + one b.com row
    _drop(spark, src, [
        (base + 10, "a.com", True),
        (base + 20, "a.com", False),
        (base + 70, "a.com", True),   # second window
        (base + 15, "b.com", True),
    ])
    _run(spark, src, out, ckpt)
    # run 2: advance the watermark far past window 1
    _drop(spark, src, [(base + 600, "a.com", True)])
    _run(spark, src, out, ckpt)
    # run 3: a row for window 1 arriving after the watermark passed
    _drop(spark, src, [(base + 5, "a.com", True)])
    _run(spark, src, out, ckpt)

    def win(t):
        return datetime.fromtimestamp(t - t % 60, tz=timezone.utc).replace(tzinfo=None)

    got = {
        (r["window_start"], r["host"]): (r["fetches"], r["ok_fetches"])
        for r in spark.read.parquet(out).collect()
    }
    # window 1 holds exactly the two in-time a.com rows — the too-late
    # base+5 row (behind the watermark by batch 3) was dropped
    assert got[(win(base + 10), "a.com")] == (2, 1)
    assert got[(win(base + 15), "b.com")] == (1, 1)
    assert got[(win(base + 70), "a.com")] == (1, 1)
    # the still-open base+600 window is NOT emitted (append semantics)
    assert (win(base + 600), "a.com") not in got
