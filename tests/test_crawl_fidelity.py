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
