"""Structured Streaming surface: exactly-once seed-file admission via
foreachBatch + checkpoint, and watermarked windowed metrics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pholcus_spark import streaming


def _write_seed_file(spark, seed_dir, urls, start_order):
    rows = [(u, start_order + i) for i, u in enumerate(urls)]
    spark.createDataFrame(rows, streaming.SEED_STREAM_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(seed_dir)


def test_seed_stream_exactly_once(spark, tmp_store_dir):
    seed_dir = os.path.join(tmp_store_dir, "seeds")
    ckpt = os.path.join(tmp_store_dir, "ckpt")
    out: list[tuple[int, list[str]]] = []

    _write_seed_file(spark, seed_dir, ["http://H1.example.com/a#frag"], 0)
    _write_seed_file(spark, seed_dir, ["http://h2.example.com/b"], 10)

    def process(df, batch_id):
        urls = sorted(r["url"] for r in df.collect())
        out.append((batch_id, urls))

    q = streaming.run_seed_stream(spark, seed_dir, ckpt, process)
    q.awaitTermination(120)
    seen_first = sorted(u for _b, us in out for u in us)
    assert seen_first == [
        "http://H1.example.com/a#frag",
        "http://h2.example.com/b",
    ]

    # restart with one NEW file: only the new file is processed
    out.clear()
    _write_seed_file(spark, seed_dir, ["http://h3.example.com/c"], 20)
    q2 = streaming.run_seed_stream(spark, seed_dir, ckpt, process)
    q2.awaitTermination(120)
    assert sorted(u for _b, us in out for u in us) == ["http://h3.example.com/c"]


def test_windowed_metrics_matches_batch(spark, tmp_store_dir):
    """Stream rollup over the driver events table == batch rollup."""
    events_src = "/root/testdata/sf0.001/events.parquet"
    events_dir = os.path.join(tmp_store_dir, "events_stream")
    spark.read.parquet(events_src).coalesce(2).write.mode("overwrite").parquet(
        events_dir
    )
    ckpt = os.path.join(tmp_store_dir, "ckpt_metrics")
    q = streaming.run_windowed_metrics_stream(
        spark, events_dir, ckpt, query_name="fm_test"
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in spark.sql("SELECT * FROM fm_test").collect()
    }
    batch = streaming.windowed_fetch_metrics(
        spark.read.parquet(events_src)
    )
    # batch path: same expression tree without the stream source
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in batch.collect()
    }
    assert got == expected and len(got) > 10


def test_stateful_dedup_across_batches(spark, tmp_store_dir):
    """applyInPandasWithState seen-set: duplicates are dropped both
    within a trigger and ACROSS triggers (state persists), and across
    stream restarts (checkpoint)."""
    import os

    from pholcus_spark import streaming as st

    cand_dir = os.path.join(tmp_store_dir, "cands")
    ckpt = os.path.join(tmp_store_dir, "ckpt_dedup")

    def write_file(rows):
        spark.createDataFrame(
            rows, "url_key long, url string, cand_order long"
        ).coalesce(1).write.mode("append").parquet(cand_dir)

    # file 1: a, b, dup(a) within batch
    write_file([(1, "http://h/a", 0), (2, "http://h/b", 1), (1, "http://h/a", 2)])
    # file 2: dup(b) across batches + new c
    write_file([(2, "http://h/b", 3), (3, "http://h/c", 4)])

    out_dir = os.path.join(tmp_store_dir, "deduped")
    q = st.run_stateful_dedup_stream(spark, cand_dir, ckpt, out_dir)
    q.awaitTermination(180)
    got = {
        r["url_key"]: r["url"] for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: "http://h/a", 2: "http://h/b", 3: "http://h/c"}

    # restart with another file: state survived the checkpoint —
    # c is recognized as seen, only d comes through
    write_file([(3, "http://h/c", 5), (4, "http://h/d", 6)])
    q2 = st.run_stateful_dedup_stream(spark, cand_dir, ckpt, out_dir)
    q2.awaitTermination(180)
    got2 = {r["url_key"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {1, 2, 3, 4}


def test_politeness_gate_paces_and_drains(spark, tmp_store_dir):
    """Continuous politeness: per-trigger host cap, deferred backlog
    persists in state (nothing dropped), drains across restarts."""
    import os

    from pholcus_spark import streaming as st

    cand_dir = os.path.join(tmp_store_dir, "gate_cands")
    ckpt = os.path.join(tmp_store_dir, "ckpt_gate")
    out_dir = os.path.join(tmp_store_dir, "gated")

    def write_file(rows):
        spark.createDataFrame(
            rows, "host string, url_key long, url string, cand_order long"
        ).coalesce(1).write.mode("append").parquet(cand_dir)

    write_file([("h", 0, "http://h/0", 0), ("h", 1, "http://h/1", 1),
                ("h", 2, "http://h/2", 2), ("c", 10, "http://c/0", 0)])
    write_file([("h", 3, "http://h/3", 3), ("h", 4, "http://h/4", 4)])

    q = st.run_politeness_gate_stream(
        spark, cand_dir, ckpt, out_dir, max_per_trigger=2
    )
    q.awaitTermination(180)
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(out_dir)
        .withColumn("_f", F.input_file_name())
        .collect()
    )
    by_host = {}
    per_batch: dict[tuple, int] = {}
    for r in rows:
        by_host.setdefault(r["host"], set()).add(r["cand_order"])
        key = (r["host"], r["_f"])
        per_batch[key] = per_batch.get(key, 0) + 1
    # pacing: no micro-batch file carries more than the per-trigger cap
    assert all(n <= 2 for n in per_batch.values())
    # two data triggers emit 2+2; the backlog timeout may drain the 5th
    # before availableNow stops (timing-dependent), never fewer than 4
    assert len(by_host["h"]) in (4, 5)
    assert by_host["c"] == {0}

    # restart: the checkpointed backlog drains alongside the new file
    write_file([("h", 5, "http://h/5", 5)])
    q2 = st.run_politeness_gate_stream(
        spark, cand_dir, ckpt, out_dir, max_per_trigger=2
    )
    q2.awaitTermination(180)
    rows2 = spark.read.parquet(out_dir).collect()
    h_orders = sorted(r["cand_order"] for r in rows2 if r["host"] == "h")
    assert h_orders == [0, 1, 2, 3, 4, 5]  # nothing lost, cand_order whole


def test_politeness_gate_budget_total(spark, tmp_store_dir):
    """Lifetime page budget: a host stops emitting at budget_total and
    its dead backlog does not accumulate in state."""
    import os

    from pholcus_spark import streaming as st

    cand_dir = os.path.join(tmp_store_dir, "budget_cands")
    spark.createDataFrame(
        [("b", i, f"http://b/{i}", i) for i in range(4)],
        "host string, url_key long, url string, cand_order long",
    ).coalesce(1).write.parquet(cand_dir)

    out_dir = os.path.join(tmp_store_dir, "budget_out")
    q = st.run_politeness_gate_stream(
        spark, cand_dir, os.path.join(tmp_store_dir, "ckpt_budget"),
        out_dir, max_per_trigger=10, budget_total=2,
    )
    q.awaitTermination(180)
    got = sorted(
        r["cand_order"] for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [0, 1]  # lowest cand_order first, hard stop at budget


def test_politeness_gate_drains_without_new_arrivals(spark, tmp_store_dir):
    """The review-found starvation case: a host whose candidates all
    arrive in ONE batch must still fully drain — the backlog's
    processing-time timeout re-invokes the state function with no new
    data for the key."""
    import os
    import time

    from pholcus_spark import streaming as st

    cand_dir = os.path.join(tmp_store_dir, "drain_cands")
    spark.createDataFrame(
        [("d", i, f"http://d/{i}", i) for i in range(3)],
        "host string, url_key long, url string, cand_order long",
    ).coalesce(1).write.parquet(cand_dir)

    out_dir = os.path.join(tmp_store_dir, "drain_out")
    q = st.run_politeness_gate_stream(
        spark, cand_dir, os.path.join(tmp_store_dir, "ckpt_drain"),
        out_dir, max_per_trigger=1,
        processing_time="500 milliseconds",
    )
    try:
        deadline = time.time() + 120
        got: list[int] = []
        while time.time() < deadline:
            try:
                got = sorted(
                    r["cand_order"]
                    for r in spark.read.parquet(out_dir).collect()
                )
            except Exception:
                got = []
            if len(got) == 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert got == [0, 1, 2]  # one per tick, drained with no new files


def test_harvest_runs_as_streaming_stage(spark, tmp_store_dir):
    """The harvest extractors are stateless projections, so the SAME
    functions run unmodified over readStream micro-batches — the shape
    a live crawl uses to harvest pairs as pages land. availableNow
    drains the backlog; the streamed result must equal the batch run
    row-for-row."""
    from pholcus_spark import harvest

    pages_dir = os.path.join(tmp_store_dir, "pages")
    ckpt = os.path.join(tmp_store_dir, "hckpt")
    rows = [
        (f"http://h{i % 3}.example.com/p/{i}",
         f'<img src="/i/{i}.jpg" alt="caption number {i}">'
         f'<img src="/skip.gif" alt="px" width="1" height="1">')
        for i in range(20)
    ]
    spark.createDataFrame(rows, "url string, html string").write.mode(
        "overwrite").parquet(pages_dir)

    stream = spark.readStream.schema("url string, html string").parquet(
        pages_dir)
    out: list = []
    q = (
        harvest.harvest_image_captions(stream)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: out.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    batch = harvest.harvest_image_captions(
        spark.read.parquet(pages_dir)).collect()
    key = lambda r: (r["page_url"], r["img_url"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, batch))
    assert len(out) == 20  # the tracking pixel dropped in-stream too


def test_main_text_runs_as_streaming_stage(spark, tmp_store_dir):
    """main_text is a stateless projection like the harvest
    extractors: the same function over readStream micro-batches must
    equal the batch run row-for-row (boilerplate gates included)."""
    from pholcus_spark import harvest

    pages_dir = os.path.join(tmp_store_dir, "mtpages")
    ckpt = os.path.join(tmp_store_dir, "mtckpt")
    rows = [
        (f"http://h{i % 3}.example.com/p/{i}",
         f"<nav><p>Long navigation paragraph that would pass the "
         f"length gate {i}</p></nav>"
         f"<p>Actual prose paragraph number {i} comfortably over the "
         f"length bar.</p>")
        for i in range(12)
    ]
    spark.createDataFrame(rows, "url string, html string").write.mode(
        "overwrite").parquet(pages_dir)
    stream = spark.readStream.schema("url string, html string").parquet(
        pages_dir)
    out: list = []
    q = (
        harvest.main_text(stream)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: out.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    batch = harvest.main_text(spark.read.parquet(pages_dir)).collect()
    key = lambda r: (r["url"], r["main_text"], r["n_kept"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, batch))
    assert all(r["n_kept"] == 1 for r in out)


def test_image_hash_pipeline_runs_as_streaming_stage(spark, tmp_store_dir):
    """The image-axis decode stage (perceptual_hashes: Arrow-batched
    mapInPandas) is stateless per row, so the SAME function runs
    unmodified over readStream micro-batches — the live-crawl shape
    where images are hashed as they land. The streamed hashes must
    equal the batch run value-for-value."""
    from pholcus_spark import multimodal, synthetic
    from pholcus_spark.imaging import encode_image

    img_dir = os.path.join(tmp_store_dir, "imgs")
    ckpt = os.path.join(tmp_store_dir, "ickpt")
    rows = []
    for i in range(24):
        arr, fmt = synthetic.image_for_doc(i)
        rows.append((f"doc-{i}", bytearray(encode_image(arr, fmt)), fmt))
    spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    ).write.mode("overwrite").parquet(img_dir)

    stream = spark.readStream.schema(
        "image_id string, bytes binary, fmt string"
    ).parquet(img_dir)
    out: list = []
    q = (
        multimodal.perceptual_hashes(stream)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: out.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    batch = multimodal.perceptual_hashes(
        spark.read.parquet(img_dir)
    ).collect()
    key = lambda r: (r["image_id"], r["phash"], r["dhash"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, batch))
    assert len(out) == 24 and all(r["decode_ok"] for r in out)


def test_feed_ingestion_runs_as_streaming_stage(spark, tmp_store_dir):
    """Feed discovery is the naturally STREAMING half of URL discovery
    (a scheduler polls feeds continuously), and parse_feeds is a
    stateless Arrow map — the same function must run unmodified over
    readStream micro-batches with value-identical output."""
    from pholcus_spark import sitemaps

    feed_dir = os.path.join(tmp_store_dir, "feeds")
    ckpt = os.path.join(tmp_store_dir, "fckpt")
    rss = (
        '<rss version="2.0"><channel>'
        "<item><title>t%d</title><link>http://s/%d</link></item>"
        "</channel></rss>"
    )
    rows = [(f"http://h{i}/feed.xml", rss % (i, i)) for i in range(12)]
    rows.append(("http://h-bad/feed.xml", "<rss><channel><item>"))
    spark.createDataFrame(rows, "url string, body string").write.mode(
        "overwrite"
    ).parquet(feed_dir)

    stream = spark.readStream.schema("url string, body string").parquet(
        feed_dir
    )
    out: list = []
    q = (
        sitemaps.parse_feeds(stream)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: out.extend(df.collect()))
        .start()
    )
    q.awaitTermination(120)
    batch = sitemaps.parse_feeds(spark.read.parquet(feed_dir)).collect()
    key = lambda r: (r["feed_url"], r["entry_url"], r["title"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, batch))
    assert len(out) == 12  # malformed feed dropped in both modes
