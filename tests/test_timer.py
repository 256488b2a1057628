"""Timer gating (F15) — Clock arithmetic vs timer.go, registry
semantics, and engine round-gating with an injected clock."""

from pholcus_spark import synthetic
from pholcus_spark.timer import (
    DAY_S,
    Bell,
    Clock,
    Timer,
    alarm_duration_s,
)

# a fixed "now": 10:00:00 into some UTC day
NOW = 1_700_000_000.0 - (1_700_000_000.0 % DAY_S) + 10 * 3600


def test_alarm_duration_reference_arithmetic():
    """Clock.duration alarm arm (timer.go:141-152)."""
    # bell later today, tol=1 → sleep to today's bell
    assert alarm_duration_s(NOW, Bell(11, 0, 0), 1) == 3600
    # bell already rang today, tol=1 → tomorrow's bell
    assert alarm_duration_s(NOW, Bell(9, 30, 0), 1) == 23 * 3600 + 1800
    # tol=2 counts occurrences: future bell → +24h, past bell → +48h
    assert alarm_duration_s(NOW, Bell(11, 0, 0), 2) == 3600 + DAY_S
    assert alarm_duration_s(NOW, Bell(9, 30, 0), 2) == 23 * 3600 + 1800 + DAY_S
    # bell exactly now: NOT strictly before → fires immediately at tol=1
    assert alarm_duration_s(NOW, Bell(10, 0, 0), 1) == 0


def test_clock_validation_and_countdown():
    """newClock (timer.go:103-125): tol must be positive; bell fields
    range-checked; countdown duration is tol itself."""
    assert Clock.new("x", 0) is None
    assert Clock.new("x", -1) is None
    assert Clock.new("x", 1, Bell(24, 0, 0)) is None
    assert Clock.new("x", 1, Bell(0, 60, 0)) is None
    c = Clock.new("x", 2.5)
    assert c is not None and c.duration_s(NOW) == 2.5
    a = Clock.new("x", 1, Bell(11, 0, 0))
    assert a is not None and a.duration_s(NOW) == 3600


def test_timer_registry_semantics():
    """Timer.set/sleep/drop (timer.go:24-77)."""
    slept = []
    t = Timer(clock=lambda: NOW, sleeper=slept.append)
    assert not t.sleep("missing")
    assert t.set("pace", 0.25)
    assert t.sleep("pace") and slept == [0.25]
    assert t.set("bell", 1, Bell(11, 0, 0))
    assert t.sleep("bell") and slept == [0.25, 3600]
    assert not t.set("bad", 0)
    t.drop()
    assert t.closed and not t.sleep("pace") and not t.set("pace", 1)


def test_engine_round_gating(spark, tmp_store_dir):
    """A rule carrying timer=<id> pauses each round's dispatch by the
    clock's computed duration (RunTimer per batch); pacing never
    changes visit order or content."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    rules = {
        ("timed", "root"): {"child_rule": "page", "max_depth": 1,
                            "child_priority": 0, "timer": "pace"},
        ("timed", "page"): {"child_rule": None, "max_depth": 1},
    }
    cfg = CrawlConfig(
        spider="timed", rules=rules, n_hosts=6, batch_size=10, limit=40,
        timers={"pace": {"tol_s": 0.015}},
    )
    seeds = synthetic.seed_urls(6, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    slept = []
    eng.timer._sleeper = slept.append
    eng.run(seeds)
    # root requests span ≥1 round (retries can extend); each such round
    # slept the countdown exactly once
    root_rounds = {
        r["visit_round"]
        for r in eng.fetched_df().filter("rule = 'root'")
        .select("visit_round").collect()
    }
    assert slept == [0.015] * len(root_rounds)
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen


def test_alarm_formula_matches_query_fixture():
    """timer.alarm_duration_s equals the q_timer_duration column/SQL
    arithmetic pointwise over the query's (doc_id-derived) grid."""
    for doc_id in range(0, 500, 7):
        now_s = 1700000000 + doc_id * 7919
        bell = Bell(doc_id % 24, (doc_id * 7) % 60, (doc_id * 13) % 60)
        tol = doc_id % 3 + 1
        day_start = now_s - (now_s % 86400)
        bell_s = day_start + bell.seconds_into_day()
        exp = (
            bell_s + 86400 * (tol if bell_s < now_s else tol - 1) - now_s
        )
        assert alarm_duration_s(float(now_s), bell, tol) == exp
