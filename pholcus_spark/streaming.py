"""Structured Streaming surface — continuous crawl feeds.

The engine's main loop is already "Structured-Streaming-style"
micro-batch rounds over snapshot tables (crawler.py), which is the
right shape for frontier state. This module covers the genuinely
streaming entry points a production deployment adds around it:

- ``seed_stream`` + ``run_seed_stream``: a file-source seed feed —
  new seed files appearing in a directory are canonicalized, deduped
  and fetched per micro-batch via ``foreachBatch`` (the streaming
  analog of RuleTree.Root, reference ``app/spider/spider.go:287-297``);
  checkpointing gives exactly-once admission per seed file.
- ``windowed_fetch_metrics``: watermarked tumbling-window aggregation
  over a fetch/event stream — late rows beyond the watermark are
  dropped, the S9 metrics rollup as a live stream.

Both run with ``Trigger.AvailableNow`` in tests (drain-what-exists,
deterministic); on a cluster the same code runs continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED_STREAM_SCHEMA = "url string, cand_order long"


def seed_stream(spark: SparkSession, seed_dir: str) -> DataFrame:
    """File-source stream of raw seed rows (url, cand_order)."""
    return (
        spark.readStream.schema(SEED_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(seed_dir)
    )


def run_seed_stream(
    spark: SparkSession,
    seed_dir: str,
    checkpoint_dir: str,
    process_batch,
    available_now: bool = True,
):
    """Drive the seed feed through ``process_batch(df, batch_id)`` —
    typically a closure that canonicalizes, dedups against the frontier
    store and enqueues (CrawlEngine.bootstrap semantics per batch).
    The checkpoint makes each seed file admitted exactly once across
    restarts."""
    writer = (
        seed_stream(spark, seed_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q


def windowed_fetch_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup of a fetch/event stream:
    rows later than the watermark are dropped, per-window counters
    mirror the rounds lineage table (S9). ``events`` needs columns
    (ts timestamp, event_type string, value double)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def run_windowed_metrics_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string",
    query_name: str = "fetch_metrics",
):
    """Stream the events directory through the windowed rollup into an
    in-memory sink (swap format('memory') for a real sink on a
    cluster). Complete output mode: each trigger emits current window
    totals."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )
    agg = windowed_fetch_metrics(src)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
