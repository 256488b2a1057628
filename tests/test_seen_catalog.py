"""Bucketed url_seen catalog: layout-width safety and compaction
manifest discipline.

The bucket count is part of the on-disk layout — Spark trusts the
declared HashPartitioning, so files written under one width must never
be re-registered under another (the confirm anti-join would
mis-co-partition and silently re-admit seen URLs). `seen_buckets` is
stamped in the manifest meta; reopening with a different width rewrites
into a fresh generation.
"""

from __future__ import annotations

import os

from pholcus_spark import synthetic
from pholcus_spark.crawler import CrawlEngine
from pholcus_spark.oracle import CrawlConfig, run_oracle
from pholcus_spark.tables import SnapshotStore

from tests.helpers import url_seen_set, visits_log


def test_reopen_with_new_bucket_width_rewrites_and_preserves_seen(
    spark, tmp_store_dir
):
    cfg8 = CrawlConfig(n_hosts=8, batch_size=10, limit=60, seen_buckets=8)
    seeds = synthetic.seed_urls(6, cfg8.n_hosts)
    store = SnapshotStore(tmp_store_dir)
    eng8 = CrawlEngine(spark, store, cfg8)
    eng8.run(seeds, max_rounds=2)
    seen_before = url_seen_set(eng8)
    assert seen_before
    meta = store.read_manifest().get("meta", {})
    assert int(meta.get("seen_buckets")) == 8

    # reopen at width 16: must rewrite into a new generation, not
    # re-register 8-bucket files as 16-bucket ones
    cfg16 = CrawlConfig(n_hosts=8, batch_size=10, limit=60, seen_buckets=16)
    eng16 = CrawlEngine(spark, store, cfg16)
    meta = store.read_manifest().get("meta", {})
    assert int(meta.get("seen_buckets")) == 16
    assert url_seen_set(eng16) == seen_before

    # the rewritten catalog must still dedup: finishing the crawl gives
    # exactly the oracle's final seen set (no re-admissions)
    orc = run_oracle(seeds, cfg16)
    eng16.run()
    assert url_seen_set(eng16) == orc.url_seen


def test_width_change_in_fresh_session(spark, tmp_store_dir):
    """The width-change rewrite must work when NO catalog tables from a
    previous engine exist — the process-restart scenario the rewrite
    targets. (A same-session reopen masks the bug: the first engine's
    registered tables satisfy bulk_load's refreshTable.) Simulated by
    dropping the catalog pair between the two opens."""
    cfg8 = CrawlConfig(n_hosts=8, batch_size=10, limit=60, seen_buckets=8)
    seeds = synthetic.seed_urls(6, cfg8.n_hosts)
    store = SnapshotStore(tmp_store_dir)
    eng8 = CrawlEngine(spark, store, cfg8)
    eng8.run(seeds, max_rounds=2)
    seen_before = url_seen_set(eng8)
    assert seen_before

    # process restart: a fresh session's catalog has no tables
    spark.sql(f"DROP TABLE IF EXISTS {eng8._seen_cat.table}")
    spark.sql(f"DROP TABLE IF EXISTS {eng8._seen_cat.delta_table}")

    cfg16 = CrawlConfig(n_hosts=8, batch_size=10, limit=60, seen_buckets=16)
    eng16 = CrawlEngine(spark, store, cfg16)
    assert url_seen_set(eng16) == seen_before
    orc = run_oracle(seeds, cfg16)
    eng16.run()
    assert url_seen_set(eng16) == orc.url_seen


def test_compact_reads_manifest_not_directory(spark, tmp_store_dir):
    """An orphan part file (torn commit: insert done, manifest flip
    aborted) must not be folded into the compacted generation."""
    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=40, seen_buckets=4)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)
    store = SnapshotStore(tmp_store_dir)
    eng = CrawlEngine(spark, store, cfg)
    eng.run(seeds, max_rounds=1)
    committed = url_seen_set(eng)
    assert committed

    manifest = store.read_manifest()
    files = manifest["tables"]["url_seen"]
    gen = int(manifest["meta"].get("seen_gen", 0))

    # simulate the torn commit: an extra insert lands on disk but is
    # never registered in any manifest
    orphan_keys = spark.createDataFrame(
        [(10**15 + i,) for i in range(50)], "url_key long"
    )
    eng._seen_cat.append(orphan_keys, gen)

    new_gen, new_files = eng._seen_cat.compact(gen, files)
    data_dir = os.path.join(store.root, "data")
    compacted = {
        r["url_key"]
        for r in spark.read.schema("url_key BIGINT")
        .parquet(*[os.path.join(data_dir, f) for f in new_files])
        .collect()
    }
    assert compacted == committed  # orphans NOT resurrected
