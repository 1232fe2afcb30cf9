"""Watermarked windowed aggregation over a fetch/event stream.

The crawl engine's streaming metrics path: fetch-log events arrive with
event-time (fetch completion), possibly late; tumbling windows aggregate
per-host fetch rates; the watermark bounds state so a 10^10-URL crawl's
metrics pipeline doesn't accumulate unbounded window state. Append mode
emits a window only once its watermark passes — exactly-once metric rows
into the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_fetch_rates(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    time_col: str = "event_time",
    host_col: str = "host",
) -> DataFrame:
    """Streaming (or batch — same expression) per-host tumbling-window
    fetch counts with late-data tolerance = ``watermark``."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("win"),
            F.col(host_col),
        )
        .agg(
            F.count("*").alias("fetches"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("ok_fetches"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col(host_col),
            "fetches",
            "ok_fetches",
        )
    )
