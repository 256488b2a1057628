"""robots.txt parsing → per-host politeness config (north-rule
addition; the reference has neither robots support nor per-host delay —
its only politeness is a global randomized pause,
``app/crawler/crawler.go:53-59``).

``parse_robots`` implements the de-facto robots.txt subset that
matters for crawl scheduling: User-agent groups, Disallow/Allow
prefixes, Crawl-delay — comments/BOM/case handled. Matching picks the
most specific applicable group (exact agent token, else ``*``).

``politeness_from_robots`` vectorizes it over a DataFrame of fetched
robots bodies ``(host, robots_txt)`` via Arrow-batched mapInPandas and
emits the engine's POLITENESS_SCHEMA rows (crawl_delay_ms, disallow
prefixes, per-round budget).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import POLITENESS_SCHEMA

DEFAULT_DELAY_MS = 300  # reference Pausetime default, config/config.go:157
MAX_DELAY_MS = 60_000


@lru_cache(maxsize=4096)
def _rule_rx(pattern: str) -> re.Pattern:
    """RFC 9309 rule → anchored regex: ``*`` matches any run of
    octets, a trailing ``$`` anchors end-of-path; everything else is
    literal."""
    rx = re.escape(pattern)
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    rx = rx.replace(r"\*", ".*")
    return re.compile("^" + rx)


def rule_matches(pattern: str, path: str) -> bool:
    """Does one Allow/Disallow rule match ``path``? Plain rules are
    prefixes (the overwhelmingly common case — no regex machinery);
    rules containing ``*`` or ending in ``$`` take the RFC 9309
    wildcard semantics."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    return _rule_rx(pattern).match(path) is not None


@dataclass
class RobotsPolicy:
    crawl_delay_ms: int = DEFAULT_DELAY_MS
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)

    def allows(self, path: str) -> bool:
        """Most-specific-match wins between Allow and Disallow, where
        specificity is the rule's octet length including wildcards
        (Google/RFC 9309 semantics — ``/fish*`` at length 6 outranks
        ``/fish`` at 5); Allow wins exact ties. Empty Disallow matches
        nothing."""
        best_dis = max((len(p) for p in self.disallow
                        if p and rule_matches(p, path)), default=-1)
        best_allow = max((len(p) for p in self.allow
                          if p and rule_matches(p, path)), default=-1)
        return best_allow >= best_dis


def parse_robots(text: str, agent: str = "pholcus") -> RobotsPolicy:
    """Parse one robots.txt body for ``agent``. Returns permissive
    defaults on empty/garbage input (crawl-on-missing-robots, the
    common convention)."""
    if not text:
        return RobotsPolicy()
    agent = agent.lower()
    groups: dict[str, RobotsPolicy] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.lstrip("﻿").split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.lower()
            if last_was_agent:
                current_agents.append(token)
            else:
                current_agents = [token]
            groups.setdefault(token, RobotsPolicy())
            last_was_agent = True
            continue
        last_was_agent = False
        if not current_agents:
            continue
        for token in current_agents:
            pol = groups[token]
            if key == "disallow":
                if val:
                    pol.disallow.append(val)
            elif key == "allow":
                if val:
                    pol.allow.append(val)
            elif key == "crawl-delay":
                try:
                    ms = int(float(val) * 1000)
                    pol.crawl_delay_ms = max(0, min(ms, MAX_DELAY_MS))
                except ValueError:
                    pass
    # most specific applicable group: exact token, else longest token
    # that is a substring of the agent, else '*'
    if agent in groups:
        return groups[agent]
    sub = [t for t in groups if t != "*" and t in agent]
    if sub:
        return groups[max(sub, key=len)]
    return groups.get("*", RobotsPolicy())


def sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body — site-wide per
    the spec (independent of any User-agent group), duplicates
    dropped, order preserved. These seed ``sitemaps.parse_sitemaps``:
    robots fetch → sitemap URLs → sitemap fetch → frontier entries."""
    if not text:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.lstrip("﻿").split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in seen:
                seen.add(val)
                out.append(val)
    return out


def sitemaps_from_robots(robots_bodies: DataFrame) -> DataFrame:
    """(host, robots_txt) → (host, sitemap_url) rows, vectorized —
    the discovery hop between the politeness fetch and sitemap
    ingestion. Narrow Arrow map; one output row per directive."""

    def _extract(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                for u in sitemap_urls(r.robots_txt):
                    rows.append({"host": r.host, "sitemap_url": u})
            yield pd.DataFrame(rows, columns=["host", "sitemap_url"])

    return robots_bodies.select("host", "robots_txt").mapInPandas(
        _extract, "host string, sitemap_url string"
    )


def host_budget(crawl_delay_ms: int, round_duration_ms: int) -> int:
    return max(1, round_duration_ms // max(1, crawl_delay_ms))


def politeness_from_robots(
    robots_bodies: DataFrame,
    agent: str = "pholcus",
    round_duration_ms: int = 1000,
    emit_allow: bool = False,
) -> DataFrame:
    """(host, robots_txt) → POLITENESS_SCHEMA rows, vectorized.

    At scale this runs once per politeness refresh over the robots
    corpus (one row per host — small relative to the frontier) and the
    result broadcasts into the scheduling joins.

    ``emit_allow=True`` appends a ``robots_allow`` column, switching
    ``frontier.filter_robots`` into full RFC 9309 group semantics
    (most-specific-rule-wins); the default keeps the stored 4-column
    schema and the conservative disallow-only subset.
    """
    cols = ["host", "crawl_delay_ms", "robots_disallow", "max_per_round"]
    out_schema = POLITENESS_SCHEMA
    if emit_allow:
        cols = cols + ["robots_allow"]
        out_schema = (
            "host string, crawl_delay_ms long,"
            " robots_disallow array<string>, max_per_round int,"
            " robots_allow array<string>"
        )

    def _parse(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                pol = parse_robots(r.robots_txt or "", agent)
                row = {
                    "host": r.host,
                    "crawl_delay_ms": pol.crawl_delay_ms,
                    "robots_disallow": pol.disallow,
                    "max_per_round": host_budget(
                        pol.crawl_delay_ms, round_duration_ms
                    ),
                }
                if emit_allow:
                    row["robots_allow"] = pol.allow
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return robots_bodies.select("host", "robots_txt").mapInPandas(
        _parse, out_schema
    )


def robots_refresh(
    pending_hosts: DataFrame,
    robots_cache: DataFrame,
    now_ms: int,
    ttl_ms: int = 86_400_000,
    error_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Robots-cache staleness scheduling: which hosts need a
    robots.txt (re)fetch before their pending frontier work may be
    dispatched. A crawler fetches robots once per host and caches it
    (RFC 9309 §2.4 allows up to 24h, longer on unreachable); the
    cache ages out on its own clock, so every fetch round starts by
    triaging the hosts it is about to touch:

    - ``missing`` — pending work but no cache row: robots MUST be
      fetched before any page (weight 3);
    - ``retry`` / ``backoff`` — the last robots fetch itself failed
      (5xx or transport error, status 0): retry on the SHORTER error
      TTL; inside it, back off (reference retry pacing:
      /root/reference/app/downloader/surf.go try loop);
    - ``stale`` — a good snapshot (2xx, or 4xx = allow-all per RFC
      9309 §2.3.1.3) past ``ttl_ms`` (weight 1);
    - ``fresh`` — serve from cache, nothing to do.

    ``fetch_rank`` orders the robots fetch queue: state weight first,
    then pending-URL count, so the refresh budget lands where it
    unblocks the most work. Plan: the per-host pending rollup joins
    the cache host-keyed — two dim-sized frames (one row per host,
    ~10^7 at web scale), never the frontier itself; no windows."""
    j = pending_hosts.join(robots_cache, "host", "left")
    age = F.lit(now_ms) - F.col("fetched_at_ms")
    is_error = (F.col("status") >= 500) | (F.col("status") == 0)
    state = (
        F.when(F.col("fetched_at_ms").isNull(), F.lit("missing"))
        .when(
            is_error,
            F.when(age > error_ttl_ms, F.lit("retry")).otherwise(
                F.lit("backoff")
            ),
        )
        .when(age > ttl_ms, F.lit("stale"))
        .otherwise(F.lit("fresh"))
    )
    weight = (
        F.when(F.col("state") == "missing", 3)
        .when(F.col("state") == "retry", 2)
        .when(F.col("state") == "stale", 1)
        .otherwise(0)
    )
    return (
        j.withColumn("age_ms", age.cast("long"))
        .withColumn("state", state)
        .withColumn(
            "do_fetch", F.col("state").isin("missing", "retry", "stale")
        )
        .withColumn(
            "fetch_rank",
            (weight.cast("long") * 1_000_000) + F.col("n_pending"),
        )
        .select(
            "host", "n_pending", "age_ms", "state", "do_fetch",
            "fetch_rank",
        )
    )
