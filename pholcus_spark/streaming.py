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


# --- custom stateful operator: cross-batch streaming URL dedup ---

DEDUP_STATE_SCHEMA = "seen binary"
DEDUP_OUT_SCHEMA = "url_key long, url string, cand_order long"


def _dedup_fn(key, pdf_iter, state):
    """applyInPandasWithState body: per-bucket running seen-set (a
    numpy int64 array in state), emit only first-seen rows. Vectorized
    membership via np.isin per Arrow batch."""
    import numpy as np
    import pandas as pd

    if state.exists:
        (blob,) = state.get
        seen = np.frombuffer(blob, dtype=np.int64)
    else:
        seen = np.empty(0, dtype=np.int64)
    out = []
    for pdf in pdf_iter:
        keys = pdf["url_key"].to_numpy(np.int64)
        # within-batch first-wins + cross-batch state check
        pdf = pdf.sort_values("cand_order")
        first_in_batch = ~pdf["url_key"].duplicated()
        fresh_mask = ~np.isin(pdf["url_key"].to_numpy(np.int64), seen)
        fresh = pdf[first_in_batch & fresh_mask]
        out.append(fresh[["url_key", "url", "cand_order"]])
        seen = np.union1d(seen, keys)
    state.update((seen.tobytes(),))
    if out:
        yield pd.concat(out)


def stateful_url_dedup(candidates: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Streaming frontier dedup as a custom stateful operator
    (applyInPandasWithState): candidates stream in, only first-ever
    occurrences stream out; the seen-set lives in Spark's state store,
    bucketed by ``pmod(url_key, n_buckets)`` so state shards across
    executors. The batch engine's equivalent is the url_seen anti-join;
    this is the continuous form (north rule: custom stateful operators
    via applyInPandasWithState)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = candidates.withColumn(
        "bucket", F.pmod(F.col("url_key"), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_dedup_stream(
    spark: SparkSession,
    cand_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Drive the stateful dedup over a file-source candidate stream
    into a parquet sink (the memory sink cannot recover from a
    checkpoint); the checkpoint persists the seen state across restarts
    (one file per trigger → cross-batch dedup is exercised)."""
    src = (
        spark.readStream.schema("url_key long, url string, cand_order long")
        .option("maxFilesPerTrigger", 1)
        .parquet(cand_dir)
    )
    return (
        stateful_url_dedup(src)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
