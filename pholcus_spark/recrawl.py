"""Freshness-driven recrawl scheduling.

The reference crawls each URL once per run (success history only
dedups; history.go keeps no change signal). An incremental crawler at
web scale instead schedules REVISITS from each page's observed change
rate (Cho & Garcia-Molina, "Effective Page Refresh Policies for Web
Crawlers"): pages that changed on every past visit get the minimum
interval, pages that never changed drift to the maximum, and the next
due time feeds straight back into the frontier as ordinary enqueues.

Scale shape: one lag-window over (url, ts) detects content-fingerprint
transitions, then a per-url aggregate folds them — both keyed by url,
so the aggregate reuses the window's hash partitioning and the whole
schedule costs a single shuffle of (url, fp, ts) triples. All
arithmetic is integer (seconds scaled from transition counts), exactly
mirrorable in the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_INTERVAL_S = 3600
MAX_INTERVAL_S = 30 * 86400


def revisit_schedule(
    history: DataFrame,
    min_interval_s: int = MIN_INTERVAL_S,
    max_interval_s: int = MAX_INTERVAL_S,
    order_cols: Sequence[str] = ("ts",),
) -> DataFrame:
    """Per-URL revisit schedule from visit history.

    ``history`` carries (url, host, ts, content_fp) — one row per past
    visit; ``order_cols`` must order visits deterministically within a
    url (pass a tiebreaker alongside ``ts`` if timestamps can collide).

    interval_s = min + (max - min) · stable_transitions / transitions
    (floored; single-visit URLs get the minimum — one observation says
    nothing, so probe soon). next_due_us = last visit + interval.
    """
    w = Window.partitionBy("url").orderBy(*order_cols)
    changed = (
        F.col("content_fp") != F.lag("content_fp").over(w)
    ).cast("int")
    h = history.withColumn("_changed", changed)
    agg = h.groupBy("url", "host").agg(
        F.count("*").alias("n_visits"),
        F.coalesce(F.sum("_changed"), F.lit(0)).alias("n_changes"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "_last_us"
        ),
    )
    transitions = F.col("n_visits") - 1
    stable = transitions - F.col("n_changes")
    interval_s = F.when(
        F.col("n_visits") <= 1, F.lit(min_interval_s).cast("long")
    ).otherwise(
        F.lit(min_interval_s)
        + F.floor(
            F.lit(max_interval_s - min_interval_s) * stable / transitions
        ).cast("long")
    )
    return agg.select(
        "url",
        "host",
        "n_visits",
        "n_changes",
        interval_s.alias("interval_s"),
        (F.col("_last_us") + interval_s * F.lit(1_000_000)).alias(
            "next_due_us"
        ),
    )


def due_now(schedule: DataFrame, now_us: int) -> DataFrame:
    """The slice of the schedule ready to re-enqueue — a codegen
    filter, so partition pruning applies when the schedule table is
    stored partitioned/sorted by due time."""
    return schedule.filter(F.col("next_due_us") <= now_us)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url_key",
    fp: str = "fingerprint",
) -> DataFrame:
    """What changed between two crawl states: per URL, ``added``
    (new only), ``removed`` (old only), ``changed`` (both, different
    content fingerprint), or ``unchanged``. The incremental-ops
    ground truth — downstream consumers (index updates, re-dedup,
    recrawl-interval updates via ``revisit_schedule``) process the
    added ∪ changed slice instead of the whole corpus.

    One full-outer equi-join on the key; both inputs project to
    (key, fp) first, so at 10^10 URLs the shuffle carries two longs
    per row, never payloads."""
    o = old.select(F.col(key), F.col(fp).alias("_old_fp"))
    n = new.select(F.col(key), F.col(fp).alias("_new_fp"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .when(F.col("_new_fp").isNull(), F.lit("removed"))
        .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        key,
        status.alias("status"),
        F.col("_old_fp").alias("old_fp"),
        F.col("_new_fp").alias("new_fp"),
    )


def cache_policy_schedule(
    fetched: DataFrame,
    now_epoch: int,
    default_ttl_s: int = 86_400,
    min_ttl_s: int = 300,
    max_ttl_s: int = 2_592_000,
) -> DataFrame:
    """Server-declared freshness → next-fetch time: parse each
    response's ``Cache-Control`` (and ``Expires`` fallback) into the
    revisit schedule — the direct-signal complement to
    ``revisit_schedule``'s OBSERVED change rates (RFC 9111 semantics;
    a server that says ``max-age=3600`` has told the crawler its
    regeneration cadence for free).

    Directive precedence, all codegen regex/CASE over the header
    string: ``no-store`` / ``no-cache`` → recrawl at ``min_ttl_s``
    (the content is always-stale by declaration — poll at the floor,
    not never); ``s-maxage=N`` beats ``max-age=N`` (shared-cache
    directive, and a crawler is a shared cache); bare ``Expires``
    epoch is a fallback TTL of ``expires − now``; nothing declared →
    ``default_ttl_s``. TTLs clamp to [min, max] — servers declare
    garbage (max-age=0 spam, year-long immutables on volatile pages)
    and the clamp is the crawler's defense.

    Output: (url, ttl_s, source, next_fetch_epoch). Zero shuffle —
    a per-row projection the recrawl scheduler unions with its
    rate-based schedule."""
    cc = F.lower(F.coalesce(F.col("cache_control"), F.lit("")))
    no_cache = cc.rlike(r"no-store|no-cache")
    s_maxage = F.regexp_extract(cc, r"s-maxage=(\d+)", 1).try_cast("long")
    # ('s-maxage' has no 'max-age' substring — no guard needed)
    maxage = F.regexp_extract(cc, r"max-age=(\d+)", 1).try_cast("long")
    exp_ttl = (F.col("expires_epoch") - F.lit(now_epoch)).cast("long")
    ttl_raw = (
        F.when(no_cache, F.lit(min_ttl_s))
        .when(s_maxage.isNotNull(), s_maxage)
        .when(maxage.isNotNull(), maxage)
        .when(F.col("expires_epoch").isNotNull(), exp_ttl)
        .otherwise(F.lit(default_ttl_s))
    )
    source = (
        F.when(no_cache, F.lit("no-cache"))
        .when(s_maxage.isNotNull(), F.lit("s-maxage"))
        .when(maxage.isNotNull(), F.lit("max-age"))
        .when(F.col("expires_epoch").isNotNull(), F.lit("expires"))
        .otherwise(F.lit("default"))
    )
    ttl = F.greatest(
        F.lit(min_ttl_s), F.least(F.lit(max_ttl_s), ttl_raw)
    ).cast("long")
    return fetched.select(
        "url",
        ttl.alias("ttl_s"),
        source.alias("source"),
        (F.lit(now_epoch) + ttl).cast("long").alias("next_fetch_epoch"),
    )
