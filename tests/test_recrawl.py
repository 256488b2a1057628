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
