"""SnapshotStore maintenance: snapshot expiration + only-dead file GC.

Iceberg ``expire_snapshots`` semantics (the store is the §7-step-8
stand-in for an Iceberg catalog): retained snapshots keep time-travel,
expired manifests disappear, and a data file is deleted iff every
manifest that referenced it expired. Appended files shared with a
retained snapshot must survive.
"""

import os
from dataclasses import replace

import pytest
from pyspark.sql import types as T

from pholcus_spark import synthetic
from pholcus_spark.crawler import CrawlEngine
from pholcus_spark.oracle import CrawlConfig, run_oracle
from pholcus_spark.tables import SnapshotStore

from tests.helpers import url_seen_set

SCHEMA = T.StructType([T.StructField("v", T.LongType(), False)])


def _commit(store, spark, round_no, n, mode):
    df = spark.createDataFrame([(i,) for i in range(n)], SCHEMA)
    return store.commit(round_no, {"t": (df, mode)})


def _data_files(store):
    out = set()
    for dirpath, _dirs, files in os.walk(os.path.join(store.root, "data")):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.join(dirpath, f))
    return out


def test_expire_keeps_window_and_deletes_old_manifests(spark, tmp_store_dir):
    store = SnapshotStore(tmp_store_dir)
    for r in range(5):
        _commit(store, spark, r, 3, "overwrite")
    assert store.snapshot_ids() == [0, 1, 2, 3, 4]
    res = store.expire_snapshots(keep_last=2)
    assert res["expired"] == [0, 1, 2]
    assert res["retained"] == [3, 4]
    assert store.snapshot_ids() == [3, 4]
    # retained time travel still works; expired raises
    assert store.load(spark, "t", SCHEMA, snapshot_id=3).count() == 3
    assert store.load(spark, "t", SCHEMA, snapshot_id=4).count() == 3
    with pytest.raises(FileNotFoundError):
        store.read_manifest(1)


def test_expire_gc_deletes_only_dead_files(spark, tmp_store_dir):
    """Overwritten tables: every expired snapshot's files become dead.
    Append-only tables: files appended in expired snapshots are still
    referenced by the retained manifests and must survive."""
    store = SnapshotStore(tmp_store_dir)
    for r in range(4):
        _commit(store, spark, r, 2, "append")
    before = _data_files(store)
    res = store.expire_snapshots(keep_last=1)
    assert res["expired"] == [0, 1, 2] and res["files_deleted"] == 0
    assert _data_files(store) == before  # append-only: all still live
    # rows from all four appends are still readable at the head
    assert store.load(spark, "t", SCHEMA).count() == 8

    store2 = SnapshotStore(tmp_store_dir + "_ow")
    for r in range(4):
        _commit(store2, spark, r, 2, "overwrite")
    res2 = store2.expire_snapshots(keep_last=1)
    assert res2["files_deleted"] > 0
    assert store2.load(spark, "t", SCHEMA).count() == 2
    # only the head snapshot's files remain on disk
    live = store2.read_manifest()["tables"]["t"]
    assert _data_files(store2) == {
        os.path.join(store2.root, "data", f) for f in live
    }


def test_expire_validates_and_is_idempotent(spark, tmp_store_dir):
    store = SnapshotStore(tmp_store_dir)
    with pytest.raises(ValueError):
        store.expire_snapshots(keep_last=0)
    _commit(store, spark, 0, 1, "overwrite")
    assert store.expire_snapshots(keep_last=3)["expired"] == []
    r1 = store.expire_snapshots(keep_last=1)
    assert r1["expired"] == [] and r1["retained"] == [0]


def test_crawl_resumes_after_expiry(spark, tmp_store_dir):
    """The operational point: a long crawl expires old snapshots
    mid-flight and a killed run still resumes from the retained head
    to the oracle's final seen set."""
    cfg = CrawlConfig(n_hosts=8, batch_size=12, limit=60)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)

    store = SnapshotStore(tmp_store_dir)
    eng = CrawlEngine(spark, store, cfg)
    eng.run(seeds, max_rounds=2)
    store.expire_snapshots(keep_last=1)
    # resumed engine runs with in-loop retention (snapshot_keep knob)
    cfg2 = replace(cfg, snapshot_keep=2)
    resumed_store = SnapshotStore(tmp_store_dir)
    resumed = CrawlEngine(spark, resumed_store, cfg2)
    resumed.run(seeds)
    assert url_seen_set(resumed) == orc.url_seen
    assert len(resumed_store.snapshot_ids()) <= 2


def test_read_appended_incremental_scan(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    s1 = _commit(store, spark, 1, 3, "append")     # rows 0..2
    s2 = _commit(store, spark, 2, 5, "append")     # rows 0..4 appended
    s3 = _commit(store, spark, 3, 2, "append")     # rows 0..1 appended

    # tail from s1 to current: exactly the s2+s3 appends
    inc = store.read_appended(spark, "t", SCHEMA, s1)
    assert sorted(r["v"] for r in inc.collect()) == sorted(
        list(range(5)) + list(range(2))
    )
    # bounded interval s1..s2: only the s2 append
    inc12 = store.read_appended(spark, "t", SCHEMA, s1, s2)
    assert sorted(r["v"] for r in inc12.collect()) == list(range(5))
    # empty interval: empty frame with the right schema
    inc33 = store.read_appended(spark, "t", SCHEMA, s3, s3)
    assert inc33.count() == 0 and inc33.schema == SCHEMA
    # unknown table at base snapshot behaves as all-new
    s4 = store.commit(4, {"u": (spark.createDataFrame([(9,)], SCHEMA),
                               "append")})
    assert store.read_appended(spark, "u", SCHEMA, s1, s4).count() == 1


def test_read_appended_refuses_overwrite(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    s1 = _commit(store, spark, 1, 3, "append")
    _commit(store, spark, 2, 4, "overwrite")
    with pytest.raises(ValueError, match="append-only"):
        store.read_appended(spark, "t", SCHEMA, s1)
