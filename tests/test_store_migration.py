"""Store-format migration: headers map<string,string> →
map<string,array<string>>.

Round 3 widened request headers to multi-value (http.Header is
map[string][]string, request.go:24) with no on-disk migration, so
resuming a store written before the change failed at parquet read of
pending/fetched. The engine now detects the legacy value type in the
parquet footer at open, wraps scalar values into one-element arrays,
rewrites the tables once, and stamps ``headers_format: 2`` so later
opens skip the check.
"""

from __future__ import annotations

from pyspark.sql import types as T

from pholcus_spark.crawler import FRONTIER_COLS, CrawlEngine
from pholcus_spark.oracle import CrawlConfig
from pholcus_spark.schemas import FRONTIER_SCHEMA
from pholcus_spark.tables import SnapshotStore
from pholcus_spark.urlnorm import canonicalize


def _legacy_frontier_schema() -> T.StructType:
    return T.StructType([
        T.StructField(
            f.name, T.MapType(T.StringType(), T.StringType()), f.nullable
        ) if f.name == "headers" else f
        for f in FRONTIER_SCHEMA.fields
    ])


def _legacy_pending_row(url: str) -> dict:
    cu = canonicalize(url)
    return {
        "url_key": 12345, "url": cu, "host": "h000.example.com",
        "spider": "imgspider", "rule": "root", "method": "GET",
        "priority": 0, "depth": 0, "seq": 0, "round_enqueued": 0,
        "parent_url": None, "temp": None,
        "headers": {"Accept": "image/*", "X-Tok": "abc"},
        "post_data": None, "reloadable": False, "try_times": 3,
        "attempt": 0, "status": "pending",
    }


def test_v1_headers_store_resumes_and_migrates(spark, tmp_store_dir):
    url = "http://h000.example.com/page/00000"
    store = SnapshotStore(tmp_store_dir)
    v1 = spark.createDataFrame(
        [_legacy_pending_row(url)], _legacy_frontier_schema()
    ).select(*FRONTIER_COLS)
    store.commit(0, {"pending": (v1, "overwrite")}, meta={"round": 0})

    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=20)
    eng = CrawlEngine(spark, store, cfg)  # open migrates in place
    rows = eng.load("pending", FRONTIER_SCHEMA).collect()
    assert len(rows) == 1
    assert rows[0]["headers"] == {"Accept": ["image/*"], "X-Tok": ["abc"]}
    meta = store.read_manifest().get("meta", {})
    assert int(meta["headers_format"]) == 2

    # idempotent: a second open leaves the snapshot id unchanged
    snap = store.current_snapshot_id()
    CrawlEngine(spark, store, cfg)
    assert store.current_snapshot_id() == snap

    # the migrated store must actually crawl: the pending row resolves
    eng2 = CrawlEngine(spark, store, cfg)
    eng2.run()
    assert eng2.fetched_df().filter("ok").count() >= 1


def test_v2_store_untouched(spark, tmp_store_dir):
    """A store already at the multi-value format gets no extra commit."""
    from pholcus_spark import synthetic

    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=20)
    store = SnapshotStore(tmp_store_dir)
    eng = CrawlEngine(spark, store, cfg)
    eng.run(synthetic.seed_urls(4, cfg.n_hosts), max_rounds=1)
    snap = store.current_snapshot_id()
    CrawlEngine(spark, store, cfg)
    assert store.current_snapshot_id() == snap
