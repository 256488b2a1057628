"""Revisit-schedule arithmetic on hand-built histories."""

from __future__ import annotations

from datetime import datetime

from pholcus_spark import recrawl

MAXI = 30 * 86400
MINI = 3600


def _hist(spark, rows):
    return spark.createDataFrame(rows, ["url", "host", "ts", "content_fp"])


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def _ts(s):
    return datetime.fromisoformat(s)


def test_never_changes_gets_max_interval(spark):
    h = _hist(
        spark,
        [
            ("u", "h", _ts("2024-01-01T00:00:00"), "a"),
            ("u", "h", _ts("2024-01-02T00:00:00"), "a"),
            ("u", "h", _ts("2024-01-03T00:00:00"), "a"),
        ],
    )
    r = _one(recrawl.revisit_schedule(h))
    assert (r["n_visits"], r["n_changes"]) == (3, 0)
    assert r["interval_s"] == MAXI
    # next due = last visit + interval
    last_us = int(_ts("2024-01-03T00:00:00").timestamp() * 1_000_000)
    assert r["next_due_us"] == last_us + MAXI * 1_000_000


def test_always_changes_gets_min_interval(spark):
    h = _hist(
        spark,
        [
            ("u", "h", _ts("2024-01-01T00:00:00"), "a"),
            ("u", "h", _ts("2024-01-02T00:00:00"), "b"),
            ("u", "h", _ts("2024-01-03T00:00:00"), "c"),
        ],
    )
    r = _one(recrawl.revisit_schedule(h))
    assert (r["n_changes"], r["interval_s"]) == (2, MINI)


def test_half_changes_interpolates(spark):
    h = _hist(
        spark,
        [
            ("u", "h", _ts("2024-01-01T00:00:00"), "a"),
            ("u", "h", _ts("2024-01-02T00:00:00"), "b"),
            ("u", "h", _ts("2024-01-03T00:00:00"), "b"),
        ],
    )
    r = _one(recrawl.revisit_schedule(h))
    assert r["interval_s"] == MINI + (MAXI - MINI) * 1 // 2


def test_single_visit_probes_soon(spark):
    h = _hist(spark, [("u", "h", _ts("2024-01-01T00:00:00"), "a")])
    r = _one(recrawl.revisit_schedule(h))
    assert (r["n_visits"], r["n_changes"], r["interval_s"]) == (1, 0, MINI)


def test_due_now_filters(spark):
    h = _hist(
        spark,
        [
            ("u1", "h", _ts("2024-01-01T00:00:00"), "a"),
            ("u2", "h", _ts("2025-01-01T00:00:00"), "a"),
        ],
    )
    sched = recrawl.revisit_schedule(h)
    cutoff = int(_ts("2024-06-01T00:00:00").timestamp() * 1_000_000)
    due = recrawl.due_now(sched, cutoff).collect()
    assert [r["url"] for r in due] == ["u1"]


def test_cache_policy_directive_precedence_and_clamps(spark):
    from pholcus_spark import recrawl

    now = 1_000_000
    rows = [
        ("a", "max-age=3600", None),
        ("b", "No-Cache, max-age=9999", None),       # case-insensitive
        ("c", "s-maxage=1800, max-age=60", None),
        ("d", None, now + 5000),
        ("e", None, now - 1),                         # past Expires
        ("f", None, None),
        ("g", "immutable, max-age=100000000", None),  # clamps down
    ]
    df = spark.createDataFrame(
        rows, "url string, cache_control string, expires_epoch long"
    )
    out = {r["url"]: r for r in recrawl.cache_policy_schedule(
        df, now_epoch=now).collect()}
    assert out["a"]["ttl_s"] == 3600 and out["a"]["source"] == "max-age"
    assert out["b"]["ttl_s"] == 300 and out["b"]["source"] == "no-cache"
    assert out["c"]["ttl_s"] == 1800 and out["c"]["source"] == "s-maxage"
    assert out["d"]["ttl_s"] == 5000 and out["d"]["source"] == "expires"
    assert out["e"]["ttl_s"] == 300      # past Expires floors, not negative
    assert out["f"]["ttl_s"] == 86400 and out["f"]["source"] == "default"
    assert out["g"]["ttl_s"] == 2_592_000
    assert all(r["next_fetch_epoch"] == now + r["ttl_s"]
               for r in out.values())
