"""CrawlMonitor HTTP status surface (web UI replacement).

Covers: every endpoint against a real finished crawl, totals agreeing
with the engine's own tables, per-snapshot caching (a second poll does
no recompute), and 404/400 handling. Reference counterpart:
/root/reference/web/pholcus-web.go (run status UI).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from pholcus_spark.crawler import CrawlEngine
from pholcus_spark.monitor import CrawlMonitor
from pholcus_spark.oracle import CrawlConfig
from pholcus_spark.tables import SnapshotStore
from pholcus_spark import synthetic


def _get(port: int, path: str):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as resp:
        assert resp.headers["Content-Type"] == "application/json"
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def crawled_engine(spark, tmp_path_factory):
    store = tmp_path_factory.mktemp("monitor_store")
    cfg = CrawlConfig(n_hosts=6, batch_size=16, limit=48)
    eng = CrawlEngine(spark, SnapshotStore(str(store)), cfg)
    eng.run(synthetic.seed_urls(8, cfg.n_hosts))
    return eng


def test_monitor_endpoints(crawled_engine):
    eng = crawled_engine
    with CrawlMonitor(eng) as mon:
        port = mon.port

        status = _get(port, "/status")
        assert status["snapshot_id"] == eng.store.current_snapshot_id()
        assert status["items"] == eng.items_df().count()
        assert status["fetched"] == eng.fetched_df().count()
        assert status["rounds"] >= 1
        assert status["bytes"] > 0

        rounds = _get(port, "/rounds?n=5")
        assert 1 <= len(rounds) <= 5
        assert rounds[-1]["round"] == status["rounds"]  # newest last
        assert {"pulled", "fetched", "items", "wall_ms"} <= set(rounds[0])

        # wall_ms is stamped per (round, partition): /status must sum
        # one value per round, not every partition copy
        all_rounds = _get(port, "/rounds?n=100000")
        assert status["wall_ms"] == sum(r["wall_ms"] for r in all_rounds)

        parts = _get(port, f"/partitions?round={rounds[-1]['round']}")
        assert parts
        assert sum(p["fetched"] for p in parts) == rounds[-1]["fetched"]

        spiders = _get(port, "/spiders")
        assert len(spiders) == 1
        assert spiders[0]["resolved"] > 0


def test_monitor_caches_per_snapshot(crawled_engine):
    mon = CrawlMonitor(crawled_engine)
    port = mon.start()
    try:
        first = _get(port, "/status")
        # poison the compute path: a cached second poll never reaches it
        orig, crawled_engine.rounds_df = crawled_engine.rounds_df, None
        try:
            assert _get(port, "/status") == first
        finally:
            crawled_engine.rounds_df = orig
    finally:
        mon.stop()


def test_monitor_errors(crawled_engine):
    with CrawlMonitor(crawled_engine) as mon:
        # a failing Spark query must answer 500, not drop the connection
        for path, code in [("/nope", 404), ("/partitions", 400),
                           ("/rounds?n=-1", 500)]:
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(mon.port, path)
            assert exc.value.code == code


def _post(port: int, path: str):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST", data=b""
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_run_controls_stop_is_graceful_and_resumable(spark, tmp_store_dir):
    """POST /stop (web/websocket_controller.go:196-218): the engine
    exits at the next round boundary with a committed snapshot; after
    /run the SAME store continues to the identical final state an
    uninterrupted run reaches (stop == kill+resume, which F5 pins)."""
    from tests.helpers import url_seen_set, visits_log

    cfg = CrawlConfig(n_hosts=6, batch_size=10, limit=40)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)

    full = CrawlEngine(
        spark, SnapshotStore(tmp_store_dir + "/full"), cfg
    )
    full.run(seeds)

    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir + "/ctl"), cfg)
    eng.bootstrap(seeds)
    eng.run(max_rounds=2)  # part-way in
    with CrawlMonitor(eng) as mon:
        assert _post(mon.port, "/stop") == {"operate": "stop"}
    assert eng.store.read_control() == "stop"
    assert eng.run() == 0  # graceful no-op exit, state intact

    with CrawlMonitor(eng) as mon:
        assert _post(mon.port, "/run") == {"operate": "run"}
    eng.run()
    assert visits_log(eng) == visits_log(full)
    assert url_seen_set(eng) == url_seen_set(full)


def test_run_controls_pause_recover_toggle(spark, tmp_store_dir):
    """POST /pauseRecover toggles pause<->run (reference semantics): a
    paused engine makes no progress between rounds; recovering lets
    the crawl finish."""
    import threading
    import time as _time

    cfg = CrawlConfig(n_hosts=6, batch_size=10, limit=30,
                      control_poll_s=0.05)
    seeds = synthetic.seed_urls(5, cfg.n_hosts)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.bootstrap(seeds)

    with CrawlMonitor(eng) as mon:
        r = _post(mon.port, "/pauseRecover")
        assert r == {"operate": "pauseRecover", "command": "pause"}

        done = {}
        t = threading.Thread(
            target=lambda: done.setdefault("rounds", eng.run())
        )
        t.start()
        _time.sleep(1.0)
        assert "rounds" not in done  # held at the pause gate
        snap_paused = eng.store.current_snapshot_id()

        r = _post(mon.port, "/pauseRecover")
        assert r == {"operate": "pauseRecover", "command": "run"}
        t.join(timeout=300)
        assert not t.is_alive()
    assert done["rounds"] > 0
    assert eng.store.current_snapshot_id() > snap_paused
    assert eng.items_df().count() == cfg.limit
