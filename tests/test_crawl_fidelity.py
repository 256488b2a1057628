"""End-to-end crawl-order fidelity + payload invariants + resume.

The fidelity contract (SURVEY.md §7): the Spark engine reproduces the
pure-Python reference-semantics oracle's per-round visit ordering and
final URL-seen set under the same seed list + politeness budget.
Payload invariants (BASELINE.json input_hint): decoded-pixel allclose
(PSNR ≥ 40 dB for lossy fmt) + exact caption equality per row.
"""

import numpy as np
import pytest

from pholcus_spark import synthetic
from pholcus_spark.crawler import CrawlEngine
from pholcus_spark.imaging import decode_image, psnr
from pholcus_spark.oracle import CrawlConfig, run_oracle
from pholcus_spark.tables import SnapshotStore


def _sorted_oracle_visits(orc):
    # engine rounds start at 1; order within a round is the dispatch
    # order (priority desc, seq asc)
    return [
        (v[0] + 1, v[1], v[2], v[3], v[4], v[5], v[6])
        for v in sorted(orc.visits, key=lambda v: (v[0], -v[3], v[4], v[5]))
    ]


@pytest.fixture(scope="module")
def crawl_pair(spark, tmp_path_factory):
    cfg = CrawlConfig(n_hosts=12, batch_size=16, limit=120)
    seeds = synthetic.seed_urls(10, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    store = SnapshotStore(str(tmp_path_factory.mktemp("fidelity_store")))
    eng = CrawlEngine(spark, store, cfg)
    eng.run(seeds)
    return cfg, seeds, orc, eng


def test_visit_order_fidelity(crawl_pair):
    _, _, orc, eng = crawl_pair
    assert eng.visits_log() == _sorted_oracle_visits(orc)


def test_url_seen_set_fidelity(crawl_pair):
    _, _, orc, eng = crawl_pair
    assert eng.url_seen_set() == orc.url_seen


def test_done_failed_sets_fidelity(crawl_pair):
    _, _, orc, eng = crawl_pair
    resolved = eng.resolved_df().collect()
    done = {r["url_key"] for r in resolved if r["status"] == "done"}
    failed = {r["url_key"] for r in resolved if r["status"] == "failed"}
    assert done == orc.done
    assert failed == orc.failed


def test_item_payload_invariants(crawl_pair):
    """Per-row: caption exact-equal; pixels allclose (PSNR≥40dB lossy,
    exact for png); phash matches the oracle's."""
    _, _, orc, eng = crawl_pair
    items = eng.items_df().collect()
    assert len(items) == len(orc.items)
    checked = 0
    for r in items:
        ref, _fmt = synthetic.image_for(r["url"])
        oitem = orc.items[
            [k for k, v in orc.items.items() if v["image_id"] == r["image_id"]][0]
        ]
        assert r["caption"] == oitem["caption"]
        assert r["phash"] == oitem["phash"]
        decoded = decode_image(bytes(r["bytes"]), r["fmt"])
        assert decoded.shape == (r["h"], r["w"], 3)
        if r["fmt"] == "png":
            assert (decoded == ref).all()
        else:
            assert psnr(ref, decoded) >= 40.0
            assert np.allclose(ref, decoded, atol=4)
        checked += 1
        if checked >= 40:  # bound test wall time; rows are iid
            break


def test_lineage_metrics_cover_all_visits(crawl_pair):
    _, _, orc, eng = crawl_pair
    rounds = eng.rounds_df()
    total_pulled = rounds.groupBy().sum("pulled").collect()[0][0]
    assert total_pulled == len(orc.visits)


def test_failure_retry_and_defer(spark, tmp_path):
    """High failure rate exercises: first-failure silent re-queue,
    second-failure record, drain-time single re-admission (F7/F8)."""
    cfg = CrawlConfig(n_hosts=6, batch_size=8, limit=40, failure_pct=45)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    assert orc.failed or any(v[5] > 0 for v in orc.visits), (
        "fixture should exercise retries"
    )
    store = SnapshotStore(str(tmp_path / "retry_store"))
    eng = CrawlEngine(spark, store, cfg)
    eng.run(seeds)
    assert eng.visits_log() == _sorted_oracle_visits(orc)
    assert eng.url_seen_set() == orc.url_seen
    resolved = eng.resolved_df().collect()
    failed = {r["url_key"] for r in resolved if r["status"] == "failed"}
    assert failed == orc.failed


def test_resume_from_snapshot(spark, tmp_path):
    """Kill mid-crawl, resume from the last snapshot → identical final
    state to an uninterrupted run (north-rule checkpoint resume)."""
    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=60)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)

    full_store = SnapshotStore(str(tmp_path / "full"))
    full = CrawlEngine(spark, full_store, cfg)
    full.run(seeds)

    part_store = SnapshotStore(str(tmp_path / "partial"))
    partial = CrawlEngine(spark, part_store, cfg)
    partial.run(seeds, max_rounds=3)  # "kill" after 3 rounds
    # a fresh engine object over the same store resumes
    resumed = CrawlEngine(spark, SnapshotStore(str(tmp_path / "partial")), cfg)
    resumed.run(seeds)

    assert resumed.visits_log() == full.visits_log()
    assert resumed.url_seen_set() == full.url_seen_set()
    assert (
        resumed.items_df().select("image_id").orderBy("image_id").collect()
        == full.items_df().select("image_id").orderBy("image_id").collect()
    )


def test_resume_ignores_orphan_files(spark, tmp_path):
    """A kill DURING a commit leaves data files without a manifest
    entry (the manifest pointer flip is the atomic step). Resume must
    read only manifest-listed files — orphans are invisible garbage."""
    import os

    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=40)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)

    full = CrawlEngine(spark, SnapshotStore(str(tmp_path / "full")), cfg)
    full.run(seeds)

    part_store = SnapshotStore(str(tmp_path / "partial"))
    partial = CrawlEngine(spark, part_store, cfg)
    partial.run(seeds, max_rounds=2)
    # simulate the torn commit: stray data files in several tables
    for table in ("fetched", "url_seen", "pending"):
        orphan = os.path.join(part_store.root, "data", table, "snap-99999999")
        os.makedirs(orphan, exist_ok=True)
        spark.range(5).selectExpr("id AS url_key").write.mode(
            "overwrite"
        ).parquet(orphan)

    resumed = CrawlEngine(spark, SnapshotStore(str(tmp_path / "partial")), cfg)
    resumed.run(seeds)
    assert resumed.visits_log() == full.visits_log()
    assert resumed.url_seen_set() == full.url_seen_set()


def test_resume_after_torn_adoption(spark, tmp_path):
    """A crash in commit() AFTER the scratch dir was adopted (renamed
    into data/fetched/snap-N) but BEFORE the manifest flip leaves a
    non-empty snap-N dir. The resumed crawl recomputes the same
    snapshot id — adoption must clear the stale dir, not fail
    ENOTEMPTY (ADVICE r1 high)."""
    import os

    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=40)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)

    full = CrawlEngine(spark, SnapshotStore(str(tmp_path / "full")), cfg)
    full.run(seeds)

    part_store = SnapshotStore(str(tmp_path / "partial"))
    partial = CrawlEngine(spark, part_store, cfg)
    partial.run(seeds, max_rounds=2)
    # plant the torn adoption at the NEXT snapshot id (what the resumed
    # round will compute): a non-empty fetched/snap-<next> dir
    next_snap = part_store.current_snapshot_id() + 1
    torn = os.path.join(
        part_store.root, "data", "fetched", f"snap-{next_snap:08d}"
    )
    os.makedirs(torn, exist_ok=True)
    spark.range(7).selectExpr("id AS url_key").write.mode(
        "overwrite"
    ).parquet(torn)

    resumed = CrawlEngine(spark, SnapshotStore(str(tmp_path / "partial")), cfg)
    resumed.run(seeds)
    assert resumed.visits_log() == full.visits_log()
    assert resumed.url_seen_set() == full.url_seen_set()


def test_bloom_enabled_mid_crawl_rebuilds_sketch(spark, tmp_path):
    """Turning use_bloom on over a store bootstrapped WITHOUT it must
    rebuild the sketch from url_seen — an empty sketch would mark all
    historical keys 'definitely new' and silently re-admit them
    (ADVICE r1 medium). Final state must equal a no-bloom full run."""
    import dataclasses

    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=60)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)

    full = CrawlEngine(spark, SnapshotStore(str(tmp_path / "full")), cfg)
    full.run(seeds)

    part_store = SnapshotStore(str(tmp_path / "partial"))
    CrawlEngine(spark, part_store, cfg).run(seeds, max_rounds=3)
    bloom_cfg = dataclasses.replace(cfg, use_bloom=True)
    resumed = CrawlEngine(
        spark, SnapshotStore(str(tmp_path / "partial")), bloom_cfg
    )
    resumed.run(seeds)
    assert resumed.visits_log() == full.visits_log()
    assert resumed.url_seen_set() == full.url_seen_set()


def test_post_head_method_fidelity(spark, tmp_path):
    """Method-aware crawl (surfer/param.go:61-84): POST seeds key
    content by (method, url, body) — a GET of the same URL is a
    distinct frontier entry; HEAD succeeds body-less (no item row);
    visit order + url_seen + items match the oracle exactly."""
    cfg = CrawlConfig(n_hosts=10, batch_size=12, limit=60)
    urls = synthetic.seed_urls(8, cfg.n_hosts)
    seeds = [
        {"url": urls[0], "method": "POST", "post_data": "q=alpha",
         "headers": {"Content-Type": "application/x-www-form-urlencoded"}},
        {"url": urls[0]},  # same URL via GET → distinct url_key
        {"url": urls[1], "method": "HEAD"},
        {"url": urls[2], "method": "POST-M", "post_data": "f=1"},
        *urls[3:],
    ]
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "methods")), cfg)
    eng.run(seeds)

    assert eng.visits_log() == _sorted_oracle_visits(orc)
    assert eng.url_seen_set() == orc.url_seen
    items = {r["image_id"] for r in eng.items_df().select("image_id").collect()}
    assert items == {v["image_id"] for v in orc.items.values()}

    from pyspark.sql import functions as F

    fetched = eng.fetched_df()
    heads = fetched.filter(F.col("method") == "HEAD").collect()
    assert heads and all(h["ok"] and h["image_id"] is None for h in heads)
    # POST and GET of the same URL both visited, with different payloads
    both = fetched.filter(F.col("url") == sorted({urls[0]})[0]).collect()
    by_method = {r["method"]: r for r in both}
    assert {"GET", "POST"} <= set(by_method)
    assert by_method["GET"]["image_id"] != by_method["POST"]["image_id"]
    # child links carry the auto-Referer header (context.go:141-207)
    child = fetched.filter(F.col("depth") > 0).select("headers", "parent_url").first()
    if child is not None:
        assert child["headers"]["Referer"] == child["parent_url"]


def test_inherit_flags_matrix(spark, tmp_path):
    """SuccessInherit / FailureInherit run boundaries
    (runtime/cache/cache.go:23-24, history.go:83-104):
    - success_inherit=True  -> crawled URLs stay seen, nothing re-runs
    - success_inherit=False -> history dropped, same seeds re-crawl
    - failure_inherit=True  -> failed requests re-admitted as pending
    - failure_inherit=False -> failures abandoned"""
    from pholcus_spark.schemas import FRONTIER_SCHEMA

    # try_times=1 + 60% transient failures → deterministic final
    # failures (verified via run_oracle: 9 failed keys)
    cfg = CrawlConfig(n_hosts=6, batch_size=8, limit=40, failure_pct=60,
                      try_times=1)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)

    def fresh(tag):
        eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / tag)), cfg)
        eng.run(seeds)
        return eng

    # success_inherit=True: same seeds are all already-seen -> no-op run
    eng = fresh("si_true")
    v0 = len(eng.visits_log())
    eng.start_new_run(seeds, success_inherit=True, failure_inherit=False)
    eng.run()
    assert len(eng.visits_log()) == v0

    # success_inherit=False: history dropped -> the run re-crawls
    eng = fresh("si_false")
    v0 = len(eng.visits_log())
    eng.start_new_run(seeds, success_inherit=False, failure_inherit=False)
    eng.run()
    assert len(eng.visits_log()) > v0
    assert eng.url_seen_set()  # rebuilt

    # failure_inherit matrix over a store that recorded failures
    eng = fresh("fi")
    failed0 = {r["url_key"] for r in eng.failures_df().collect()}
    assert failed0, "fixture should produce at least one final failure"

    abandon = CrawlEngine(spark, SnapshotStore(str(tmp_path / "fi")), cfg)
    abandon.start_new_run(success_inherit=True, failure_inherit=False)
    pend = abandon.load("pending", FRONTIER_SCHEMA).count()
    assert pend == 0  # failures NOT re-admitted

    inherit = CrawlEngine(spark, SnapshotStore(str(tmp_path / "fi")), cfg)
    inherit.start_new_run(success_inherit=True, failure_inherit=True)
    pend_keys = {
        r["url_key"]
        for r in inherit.load("pending", FRONTIER_SCHEMA).collect()
    }
    assert pend_keys == failed0  # every failed request back in the queue
    inherit.run()
    assert inherit.load("pending", FRONTIER_SCHEMA).count() == 0


def test_failure_export_roundtrip(spark, tmp_path):
    """Failure store export (failure.go:51-107): serialized failed
    requests written as JSON, re-loadable row-for-row."""
    cfg = CrawlConfig(n_hosts=6, batch_size=8, limit=40, failure_pct=60,
                      try_times=1)
    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "exp")), cfg)
    eng.run(synthetic.seed_urls(8, cfg.n_hosts))
    failed = {r["url_key"] for r in eng.failures_df().collect()}
    assert failed, "fixture should produce failures"
    out = str(tmp_path / "failures_json")
    n = eng.export_failures(out)
    assert n == len(failed)
    back = spark.read.json(out)
    assert {r["url_key"] for r in back.collect()} == failed


def test_multi_spider_fidelity(spark, tmp_path):
    """Engine-level multi-spider crawl (spiderqueue.go:56-90): two
    spiders with different rule trees share one frontier; fair-share
    batching + per-spider page budgets; visit order, url_seen and
    per-spider dispatch match the oracle exactly."""
    rules = {
        ("spA", "root"): {"child_rule": "page", "max_depth": 2,
                          "child_priority": 0},
        ("spA", "page"): {"child_rule": "page", "max_depth": 2,
                          "child_priority": 0},
        ("spB", "root"): {"child_rule": "page", "max_depth": 1,
                          "child_priority": 2},
        ("spB", "page"): {"child_rule": None, "max_depth": 0},
    }
    cfg = CrawlConfig(spiders=("spA", "spB"), rules=rules, n_hosts=10,
                      batch_size=10, limit=40)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "multi")), cfg)
    eng.run(seeds)
    assert eng.visits_log() == _sorted_oracle_visits(orc)
    assert eng.url_seen_set() == orc.url_seen
    spiders = {
        r["spider"] for r in eng.fetched_df().select("spider").distinct().collect()
    }
    assert spiders == {"spA", "spB"}


def test_keyin_fanout_engine_fidelity(spark, tmp_path):
    """F13 keyin fan-out at ENGINE level (spiderqueue.go:56-90 +
    KeyinsParse): one spider × two keyins → two instances with
    substituted seed URLs, each with its own budget and history
    namespace (distinct url_keys)."""
    rules = {
        ("spA", "root"): {"child_rule": "page", "max_depth": 1,
                          "child_priority": 0},
        ("spA", "page"): {"child_rule": None, "max_depth": 0},
    }
    cfg = CrawlConfig(spiders=("spA",), keyins=("alpha", "beta"),
                      rules=rules, n_hosts=10, batch_size=10, limit=20)
    seeds = [f"http://h{i:03d}.example.com/search/{{keyin}}/{i}"
             for i in range(4)]
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "keyin")), cfg)
    eng.run(seeds)
    assert eng.visits_log() == _sorted_oracle_visits(orc)
    assert eng.url_seen_set() == orc.url_seen
    urls = [r["url"] for r in eng.fetched_df().select("url").collect()]
    assert any("/search/alpha/" in u for u in urls)
    assert any("/search/beta/" in u for u in urls)
    spiders = {
        r["spider"]
        for r in eng.fetched_df().select("spider").distinct().collect()
    }
    assert spiders == {"spA@alpha", "spA@beta"}
