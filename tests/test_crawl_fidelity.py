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

from tests.helpers import url_seen_set, visits_log


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
    assert visits_log(eng) == _sorted_oracle_visits(orc)


def test_url_seen_set_fidelity(crawl_pair):
    _, _, orc, eng = crawl_pair
    assert url_seen_set(eng) == orc.url_seen


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
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    resolved = eng.resolved_df().collect()
    failed = {r["url_key"] for r in resolved if r["status"] == "failed"}
    assert failed == orc.failed


@pytest.fixture(scope="module")
def resume_world(spark, tmp_path_factory):
    """Shared ground truth for the resume-shaped tests: one full crawl
    + one partially-run ("killed") store per config. Each test copies
    the partial store byte-for-byte before damaging/resuming it — the
    engine is deterministic, so the copies are exactly the state the
    per-test crawls used to rebuild, at a fraction of the wall time."""
    base = tmp_path_factory.mktemp("resume_world")
    cfg60 = CrawlConfig(n_hosts=8, batch_size=10, limit=60)
    seeds60 = synthetic.seed_urls(8, cfg60.n_hosts)
    full60 = CrawlEngine(spark, SnapshotStore(str(base / "full60")), cfg60)
    full60.run(seeds60)
    CrawlEngine(spark, SnapshotStore(str(base / "partial60")), cfg60).run(
        seeds60, max_rounds=3
    )  # "kill" after 3 rounds
    cfg40 = CrawlConfig(n_hosts=8, batch_size=10, limit=40)
    seeds40 = synthetic.seed_urls(6, cfg40.n_hosts)
    full40 = CrawlEngine(spark, SnapshotStore(str(base / "full40")), cfg40)
    full40.run(seeds40)
    CrawlEngine(spark, SnapshotStore(str(base / "partial40")), cfg40).run(
        seeds40, max_rounds=2
    )
    return {
        "base": base,
        "cfg60": cfg60, "seeds60": seeds60, "full60": full60,
        "cfg40": cfg40, "seeds40": seeds40, "full40": full40,
    }


def _copy_partial(world, which: int, name: str) -> str:
    import shutil

    dst = str(world["base"] / name)
    shutil.copytree(str(world["base"] / f"partial{which}"), dst)
    return dst


def test_resume_from_snapshot(spark, resume_world):
    """Kill mid-crawl, resume from the last snapshot → identical final
    state to an uninterrupted run (north-rule checkpoint resume)."""
    w = resume_world
    part = _copy_partial(w, 60, "resume_plain")
    # a fresh engine object over the (copied) killed store resumes
    resumed = CrawlEngine(spark, SnapshotStore(part), w["cfg60"])
    resumed.run(w["seeds60"])

    full = w["full60"]
    assert visits_log(resumed) == visits_log(full)
    assert url_seen_set(resumed) == url_seen_set(full)
    assert (
        resumed.items_df().select("image_id").orderBy("image_id").collect()
        == full.items_df().select("image_id").orderBy("image_id").collect()
    )


def test_resume_ignores_orphan_files(spark, resume_world):
    """A kill DURING a commit leaves data files without a manifest
    entry (the manifest pointer flip is the atomic step). Resume must
    read only manifest-listed files — orphans are invisible garbage."""
    import os

    w = resume_world
    part = _copy_partial(w, 40, "resume_orphans")
    # simulate the torn commit: stray data files in several tables
    for table in ("fetched", "url_seen", "pending"):
        orphan = os.path.join(part, "data", table, "snap-99999999")
        os.makedirs(orphan, exist_ok=True)
        spark.range(5).selectExpr("id AS url_key").write.mode(
            "overwrite"
        ).parquet(orphan)

    resumed = CrawlEngine(spark, SnapshotStore(part), w["cfg40"])
    resumed.run(w["seeds40"])
    assert visits_log(resumed) == visits_log(w["full40"])
    assert url_seen_set(resumed) == url_seen_set(w["full40"])


def test_resume_after_torn_adoption(spark, resume_world):
    """A crash in commit() AFTER the scratch dir was adopted (renamed
    into data/fetched/snap-N) but BEFORE the manifest flip leaves a
    non-empty snap-N dir. The resumed crawl recomputes the same
    snapshot id — adoption must clear the stale dir, not fail
    ENOTEMPTY (ADVICE r1 high)."""
    import os

    w = resume_world
    part = _copy_partial(w, 40, "resume_torn")
    part_store = SnapshotStore(part)
    # plant the torn adoption at the NEXT snapshot id (what the resumed
    # round will compute): a non-empty fetched/snap-<next> dir
    next_snap = part_store.current_snapshot_id() + 1
    torn = os.path.join(part, "data", "fetched", f"snap-{next_snap:08d}")
    os.makedirs(torn, exist_ok=True)
    spark.range(7).selectExpr("id AS url_key").write.mode(
        "overwrite"
    ).parquet(torn)

    resumed = CrawlEngine(spark, part_store, w["cfg40"])
    resumed.run(w["seeds40"])
    assert visits_log(resumed) == visits_log(w["full40"])
    assert url_seen_set(resumed) == url_seen_set(w["full40"])


def test_bloom_enabled_mid_crawl_rebuilds_sketch(spark, resume_world):
    """Turning use_bloom on over a store bootstrapped WITHOUT it must
    rebuild the sketch from url_seen — an empty sketch would mark all
    historical keys 'definitely new' and silently re-admit them
    (ADVICE r1 medium). Final state must equal a no-bloom full run."""
    import dataclasses

    w = resume_world
    part = _copy_partial(w, 60, "resume_bloom")
    bloom_cfg = dataclasses.replace(w["cfg60"], use_bloom=True)
    resumed = CrawlEngine(spark, SnapshotStore(part), bloom_cfg)
    resumed.run(w["seeds60"])
    assert visits_log(resumed) == visits_log(w["full60"])
    assert url_seen_set(resumed) == url_seen_set(w["full60"])


def test_post_head_method_fidelity(spark, tmp_path):
    """Method-aware crawl (surfer/param.go:61-84): POST seeds key
    content by (method, url, body) — a GET of the same URL is a
    distinct frontier entry; HEAD succeeds body-less (no item row);
    visit order + url_seen + items match the oracle exactly."""
    cfg = CrawlConfig(n_hosts=10, batch_size=12, limit=60)
    urls = synthetic.seed_urls(8, cfg.n_hosts)
    seeds = [
        {"url": urls[0], "method": "POST", "post_data": "q=alpha",
         "headers": {"Content-Type": "application/x-www-form-urlencoded",
                     # repeated header (http.Header is
                     # map[string][]string, request.go:24) — must
                     # survive the round trip losslessly
                     "Accept": ["text/html", "image/png"]}},
        {"url": urls[0]},  # same URL via GET → distinct url_key
        {"url": urls[1], "method": "HEAD"},
        {"url": urls[2], "method": "POST-M", "post_data": "f=1"},
        *urls[3:],
    ]
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "methods")), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
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
        assert child["headers"]["Referer"] == [child["parent_url"]]
    # multi-value + scalar seed headers round-trip losslessly
    post_row = by_method["POST"]
    assert post_row["headers"]["Accept"] == ["text/html", "image/png"]
    assert post_row["headers"]["Content-Type"] == [
        "application/x-www-form-urlencoded"
    ]


def test_inherit_flags_matrix(spark, tmp_path):
    """SuccessInherit / FailureInherit run boundaries
    (runtime/cache/cache.go:23-24, history.go:83-104):
    - success_inherit=True  -> crawled URLs stay seen, nothing re-runs
    - success_inherit=False -> history dropped, same seeds re-crawl
    - failure_inherit=True  -> failed requests re-admitted as pending
    - failure_inherit=False -> failures abandoned"""
    from pholcus_spark.schemas import FRONTIER_SCHEMA

    import shutil

    # try_times=1 + 60% transient failures → deterministic final
    # failures (verified via run_oracle: 9 failed keys)
    cfg = CrawlConfig(n_hosts=6, batch_size=8, limit=40, failure_pct=60,
                      try_times=1)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)

    # one template crawl; each matrix branch reopens a byte-for-byte
    # copy of its store (the engine is deterministic, so this is the
    # same state three fresh crawls would produce — at a third of the
    # wall time)
    tpl = str(tmp_path / "tpl")
    tpl_eng = CrawlEngine(spark, SnapshotStore(tpl), cfg)
    tpl_eng.run(seeds)
    v0 = len(visits_log(tpl_eng))

    def fresh(tag):
        shutil.copytree(tpl, str(tmp_path / tag))
        return CrawlEngine(spark, SnapshotStore(str(tmp_path / tag)), cfg)

    # success_inherit=True: same seeds are all already-seen -> no-op run
    eng = fresh("si_true")
    eng.start_new_run(seeds, success_inherit=True, failure_inherit=False)
    eng.run()
    assert len(visits_log(eng)) == v0

    # success_inherit=False: history dropped -> the run re-crawls
    eng = fresh("si_false")
    eng.start_new_run(seeds, success_inherit=False, failure_inherit=False)
    eng.run()
    assert len(visits_log(eng)) > v0
    assert url_seen_set(eng)  # rebuilt

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
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
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
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    urls = [r["url"] for r in eng.fetched_df().select("url").collect()]
    assert any("/search/alpha/" in u for u in urls)
    assert any("/search/beta/" in u for u in urls)
    spiders = {
        r["spider"]
        for r in eng.fetched_df().select("spider").distinct().collect()
    }
    assert spiders == {"spA@alpha", "spA@beta"}


def test_cookie_jar_engine_fidelity(spark, tmp_path):
    """EnableCookie end-to-end (reference request.go:28 +
    context.go:110-112 + Surf jar surfer/param.go:47-108): login pages
    set a session cookie; later rounds' fetches on that host carry it
    and receive DIFFERENT content (cookie-keyed synthetic pages).
    Engine must match the oracle's visits, seen set, item captions, and
    final jar exactly — and the run must differ observably from a
    cookie-off crawl of the same seeds."""
    cfg = CrawlConfig(n_hosts=8, batch_size=12, limit=90, enable_cookie=True)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    assert orc.cookies, "fixture must actually set cookies"

    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "cookie")), cfg)
    eng.run(seeds)
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen

    # item captions match the cookie-aware oracle content exactly
    eng_caps = {
        r["image_id"]: r["caption"] for r in eng.items_df().collect()
    }
    orc_caps = {v["image_id"]: v["caption"] for v in orc.items.values()}
    assert eng_caps == orc_caps

    # committed jar == oracle jar
    eng_jar: dict = {}
    for r in eng.cookies_df().collect():
        eng_jar.setdefault((r["spider"], r["host"]), {})[r["name"]] = r["value"]
    assert eng_jar == orc.cookies

    # observability: cookie-off oracle over the same seeds yields
    # different content for at least one fetched URL on a jar host
    orc_off = run_oracle(
        seeds,
        CrawlConfig(n_hosts=8, batch_size=12, limit=90, enable_cookie=False),
    )
    off_caps = {v["image_id"] for v in orc_off.items.values()}
    assert set(orc_caps) != off_caps


def test_proxy_assignment_engine_fidelity(spark, tmp_path):
    """F12 proxy pool (reference app/aid/proxy/proxy.go:141-197): the
    pool is speed-filtered + speed-ranked (deterministic synthetic
    latencies); every request's routed proxy is recorded and must match
    the oracle's assignment exactly; dead/slow proxies get no traffic;
    a crawl without a pool records NULL."""
    from pyspark.sql import functions as F

    pool = tuple(f"http://proxy{i}.example.net:8080" for i in range(10))
    cfg = CrawlConfig(n_hosts=8, batch_size=12, limit=60, proxy_pool=pool)
    seeds = synthetic.seed_urls(8, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    assert orc.proxies

    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "proxy")), cfg)
    eng.run(seeds)
    assert visits_log(eng) == _sorted_oracle_visits(orc)

    got = {
        r["url_key"]: r["proxy"]
        for r in eng.fetched_df().select("url_key", "proxy").collect()
    }
    assert got == orc.proxies
    # only live (latency <= cap) proxies carry traffic, and the slow
    # ones were actually filtered (the fixture pool must exercise both)
    live = {p for p, _ in synthetic.live_proxies(list(pool), 300)}
    assert set(got.values()) <= live
    assert len(live) < len(pool), "fixture should have dead proxies"


def test_downloader_dispatch_fidelity(spark, tmp_path):
    """D2 downloader dispatch across ALL THREE reference routes
    (downloader_surfer.go:35-74, surfer/request.go:83-87: 0=surf,
    1=phantomjs, 2=chrome): one crawl mixes rules pinned to each
    downloader; visit order + items must match the oracle, and the
    three renderers must observably produce pairwise-DIFFERENT content
    for the same URL (phantom.go and chrome.go are different browser
    engines — a rendered page differs per engine and from the raw
    surf response)."""
    rules = {
        ("spA", "root"): {"child_rule": "page", "max_depth": 2,
                          "child_priority": 0},
        ("spA", "page"): {"child_rule": "deep", "max_depth": 2,
                          "child_priority": 0, "downloader": "chrome"},
        ("spA", "deep"): {"child_rule": None, "max_depth": 0,
                          "downloader": "phantom"},
    }
    cfg = CrawlConfig(spiders=("spA",), rules=rules, n_hosts=8,
                      batch_size=24, limit=150)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(str(tmp_path / "dl")), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    caps = {r["image_id"]: r["caption"] for r in eng.items_df().collect()}
    assert caps == {v["image_id"]: v["caption"] for v in orc.items.values()}

    # every route actually fetched pages in this crawl
    from pyspark.sql import functions as F

    fetched_rules = {
        r["rule"]
        for r in eng.fetched_df().filter(F.col("ok"))
        .select("rule").distinct().collect()
    }
    assert {"root", "page", "deep"} <= fetched_rules

    # dispatch observability: surf / phantom / chrome responses for
    # the SAME URL are pairwise distinct
    child = eng.fetched_df().filter(
        (F.col("rule") == "page") & F.col("ok")
    ).select("url").first()
    assert child is not None
    by_dl = {
        dl: synthetic.fetch_one(
            child["url"], 1, 10**6, cfg.n_hosts, 0, downloader=dl
        ).image_id
        for dl in ("surf", "phantom", "chrome")
    }
    assert len(set(by_dl.values())) == 3, by_dl


def test_downloader_xml_and_request_routing(tmp_path):
    """The spec surface of the three routes: <Downloader> accepts
    names and reference numeric ids (surfer/request.go:83-87) and
    rejects unknowns loudly; JsAddQueue's DownloaderID coerces
    non-1/2 ids to surf (request.go:125-126) with an explicit id
    beating the rule default."""
    import pytest

    from pholcus_spark.jsrules import _norm_queue_req
    from pholcus_spark.spiderspec import load_spider_xml

    def spec(dl):
        return (
            "<Spider><Name>s</Name>"
            "<Rule name=\"root\"><Links rule=\"child\" maxDepth=\"1\"/>"
            "</Rule>"
            f"<Rule name=\"child\"><Downloader>{dl}</Downloader></Rule>"
            "</Spider>"
        )

    for raw, want in [("surf", "surf"), ("0", "surf"),
                      ("phantom", "phantom"), ("PhantomJS", "phantom"),
                      ("1", "phantom"), ("chrome", "chrome"),
                      ("2", "chrome")]:
        sp = load_spider_xml(spec(raw))
        assert sp.rules[("s", "child")]["downloader"] == want, raw
    with pytest.raises(ValueError):
        load_spider_xml(spec("firefox"))

    for did, want in [(0, "surf"), (1, "phantom"), (2, "chrome"),
                      (7, "surf"), (-1, "surf")]:
        req = _norm_queue_req({"URL": "http://x/", "DownloaderID": did})
        assert req["downloader"] == want, did
    assert _norm_queue_req({"URL": "http://x/"})["downloader"] is None


def test_shuffle_width_does_not_change_the_crawl(spark, tmp_path):
    """cfg.shuffle_partitions is a pure performance knob: the visit
    set, items, and round count must be IDENTICAL at any reduce
    width (the same bit-determinism the scaling campaigns rely on)."""
    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.tables import SnapshotStore

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for i, width in enumerate([None, 4]):
            cfg = CrawlConfig(
                n_hosts=8, batch_size=16, limit=50,
                shuffle_partitions=width,
            )
            eng = CrawlEngine(
                spark, SnapshotStore(str(tmp_path / f"w{i}")), cfg
            )
            rounds = eng.run(synthetic.seed_urls(6, cfg.n_hosts))
            visits = sorted(
                r["url"] for r in eng.fetched_df().select("url").collect()
            )
            outs.append((rounds, visits))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert outs[0] == outs[1]
    assert len(outs[0][1]) > 0
