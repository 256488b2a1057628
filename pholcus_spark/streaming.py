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


GATE_STATE_SCHEMA = "emitted long, pending binary"
GATE_OUT_SCHEMA = "host string, url_key long, url string, cand_order long"


def politeness_gate(
    candidates: DataFrame,
    max_per_trigger: int = 2,
    budget_total: int | None = None,
    drain_interval_ms: int = 1000,
) -> DataFrame:
    """Continuous per-host politeness — the batch engine's
    ``select_batch`` host cap (F11, reference crawl-delay pacing) as a
    custom stateful streaming operator.

    Per micro-batch each host emits at most ``max_per_trigger`` rows in
    cand_order; rows over the cap are NOT dropped — they persist in the
    host's state and drain in later triggers (the reference re-scans
    its queue next round, ``matrix.go:101-124``). A host holding a
    backlog arms a PROCESSING-TIME TIMEOUT (``drain_interval_ms``), so
    it keeps draining even when no new candidates for it ever arrive —
    with NoTimeout the state function only runs for keys present in
    the batch, and a quiet host's backlog would sit in the checkpoint
    forever. ``budget_total`` additionally caps a host's lifetime
    emissions (page-budget analog); once exhausted, arrivals stop
    accumulating.

    State shards by host across executors via the state store; a hot
    host costs only its own group. Per-batch work is vectorized pandas
    (concat/sort/head) — no per-row Python.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    cols = ["host", "url_key", "url", "cand_order"]

    def fn(key, pdf_iter, state):
        import pickle

        import pandas as pd

        if state.exists:
            emitted, blob = state.get
            backlog = pickle.loads(blob) if blob else None
        else:
            emitted, backlog = 0, None
        parts = [] if backlog is None else [backlog]
        # on a timeout invocation pdf_iter is empty: the pool is just
        # the checkpointed backlog, draining another cap's worth
        parts.extend(pdf[cols] for pdf in pdf_iter)
        if not parts:
            return
        pool = (
            pd.concat(parts, ignore_index=True)
            .sort_values("cand_order", kind="mergesort")
            .drop_duplicates("url_key")
        )
        cap = max_per_trigger
        if budget_total is not None:
            cap = min(cap, max(0, budget_total - emitted))
        allow = pool.head(cap)
        rest = pool.iloc[len(allow):]
        if budget_total is not None:
            # arrivals beyond the lifetime budget can never emit — drop
            # them from state so a dead host's backlog does not grow
            rest = rest.head(max(0, budget_total - emitted - len(allow)))
        state.update((
            int(emitted + len(allow)),
            pickle.dumps(rest) if len(rest) else None,
        ))
        if len(rest):
            # re-arm: timeouts reset every invocation, so a standing
            # backlog must keep scheduling its own next drain tick
            state.setTimeoutDuration(drain_interval_ms)
        if len(allow):
            yield allow

    return candidates.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=GATE_OUT_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_politeness_gate_stream(
    spark: SparkSession,
    cand_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_per_trigger: int = 2,
    budget_total: int | None = None,
    processing_time: str | None = None,
):
    """Drive the politeness gate over a file-source candidate stream
    (one file per trigger) into a parquet sink; the checkpoint persists
    per-host emitted counts AND the deferred backlog across restarts.

    Default trigger is availableNow (drain what exists, then stop —
    the batch-oriented test/CLI mode; timeout-driven backlog drain then
    continues on the NEXT run from the checkpoint). Pass
    ``processing_time`` (e.g. ``"500 milliseconds"``) for a continuous
    query whose backlog timeouts fire in-process — the deployment
    shape, where quiet hosts drain with no new arrivals."""
    src = (
        spark.readStream.schema(
            "host string, url_key long, url string, cand_order long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(cand_dir)
    )
    writer = (
        politeness_gate(src, max_per_trigger, budget_total)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
