"""Bloom seen-sketch: soundness (no false negatives), incremental
update, prefilter equivalence with the exact anti-join, and end-to-end
engine equality with the bloom path enabled."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pholcus_spark import seen as S
from pholcus_spark.schemas import SEEN_SKETCH_SCHEMA, URL_SEEN_SCHEMA

from tests.helpers import url_seen_set, visits_log

PARAMS = S.BloomParams(n_buckets=8, bits_per_bucket=1 << 12, n_hashes=5)


def test_numpy_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    bitset = np.zeros(PARAMS.bits_per_bucket // 8, dtype=np.uint8)
    S.bitset_or_keys(bitset, keys, PARAMS)
    assert S.contains_keys(bitset, keys, PARAMS).all()


def test_numpy_bloom_fpr_sane():
    rng = np.random.default_rng(8)
    present = rng.integers(-(2**62), 2**62, 500, dtype=np.int64)
    absent = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    bitset = np.zeros(PARAMS.bits_per_bucket // 8, dtype=np.uint8)
    S.bitset_or_keys(bitset, present, PARAMS)
    fpr = S.contains_keys(bitset, absent, PARAMS).mean()
    # 500 keys in 4096 bits with 5 hashes → theoretical FPR ~4%
    assert fpr < 0.10


def test_build_and_update_sketch_roundtrip(spark):
    seen_keys = [(int(k),) for k in range(0, 1000, 3)]
    url_seen = spark.createDataFrame(seen_keys, URL_SEEN_SCHEMA)
    sketch = S.build_sketch(url_seen, PARAMS)
    assert sketch.count() <= PARAMS.n_buckets

    # incremental: adding new keys preserves old ones and covers new
    new_keys = spark.createDataFrame([(10**9 + i,) for i in range(50)], URL_SEEN_SCHEMA)
    updated = S.update_sketch(sketch, new_keys, PARAMS)
    all_keys = url_seen.unionByName(new_keys)
    tagged = S.prefilter(
        all_keys.withColumn("reloadable", F.lit(False)), updated, PARAMS
    )
    # every truly-seen key must be flagged maybe_seen (no false negatives)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_anti_join_bloom_equals_exact(spark):
    from pholcus_spark import frontier as FR
    from tests.test_frontier import CAND_SCHEMA, _cand  # reuse fixtures

    cands = spark.createDataFrame(
        [_cand(f"/{i}", "h1", i) for i in range(60)], CAND_SCHEMA
    )
    keyed = FR.with_url_key(cands)
    seen_keys = keyed.limit(25).select("url_key")
    sketch = S.build_sketch(seen_keys, PARAMS)
    exact = FR.anti_join_seen(keyed, seen_keys)
    bloom = S.anti_join_seen_bloom(keyed, seen_keys, sketch, PARAMS)
    assert {r["url_key"] for r in exact.collect()} == {
        r["url_key"] for r in bloom.collect()
    }


def test_engine_bloom_path_matches_exact(spark, tmp_store_dir):
    import tempfile

    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.tables import SnapshotStore

    seeds = synthetic.seed_urls(8, 10)
    base = dict(n_hosts=10, batch_size=12, limit=60, max_rounds=30)
    eng_exact = CrawlEngine(
        spark, SnapshotStore(tmp_store_dir), CrawlConfig(**base)
    )
    eng_exact.run(seeds)
    bloom_dir = tempfile.mkdtemp(prefix="pholcus_bloom_")
    eng_bloom = CrawlEngine(
        spark, SnapshotStore(bloom_dir), CrawlConfig(**base, use_bloom=True)
    )
    eng_bloom.run(seeds)
    try:
        assert url_seen_set(eng_exact) == url_seen_set(eng_bloom)
        assert visits_log(eng_exact) == visits_log(eng_bloom)
    finally:
        eng_bloom.store.destroy()


def test_cuckoo_filter_insert_contains_delete():
    cf = S.CuckooFilter(n_buckets=1 << 10)
    rng = np.random.default_rng(11)
    keys = [int(k) for k in rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)]
    for k in keys:
        assert cf.insert(k)
    assert all(cf.contains(k) for k in keys)
    # deletions actually remove (the capability bloom lacks)
    for k in keys[:500]:
        assert cf.delete(k)
    fpr = sum(cf.contains(k) for k in keys[:500]) / 500
    assert fpr < 0.05
    assert all(cf.contains(k) for k in keys[500:])


def test_cuckoo_filter_bytes_roundtrip():
    cf = S.CuckooFilter(n_buckets=1 << 8)
    for k in range(300):
        cf.insert(k * 7919)
    clone = S.CuckooFilter.from_bytes(cf.to_bytes(), n_buckets=1 << 8)
    assert all(clone.contains(k * 7919) for k in range(300))
    assert clone.delete(0)


def test_anti_join_bloom_broadcast_confirm_equals_exact(spark):
    """broadcast_confirm inverts the confirm join (url_seen scanned,
    never shuffled) — results must still equal the exact anti-join."""
    from pholcus_spark import frontier as FR
    from tests.test_frontier import CAND_SCHEMA, _cand

    cands = spark.createDataFrame(
        [_cand(f"/{i}", "h1", i) for i in range(80)], CAND_SCHEMA
    )
    keyed = FR.with_url_key(cands)
    seen_keys = keyed.limit(30).select("url_key")
    sketch = S.build_sketch(seen_keys, PARAMS)
    exact = {r["url_key"] for r in FR.anti_join_seen(keyed, seen_keys).collect()}
    bc = {
        r["url_key"]
        for r in S.anti_join_seen_bloom(
            keyed, seen_keys, sketch, PARAMS, broadcast_confirm=True
        ).collect()
    }
    assert bc == exact
