"""Crawler-trap detection: URL-pattern explosion guard.

The reference bounds a runaway crawl only by the global page budget
(``Limit``, spider.go) — nothing stops one host's infinite URL space
(calendar pages, session-id permutations, faceted search) from eating
the whole budget. At 10^10-frontier scale that guard is mandatory:
this module detects path prefixes whose pending-URL mass is explosive
relative to their host and caps how many of their URLs survive into
dispatch, the standard trap heuristic (Heydon & Najork, "Mercator: A
scalable, extensible Web crawler", §URL frontier).

Scale shape: detection is ONE (host, prefix) hash aggregate over the
frontier (map-side combined) joined to a host-total aggregate — both
output dimension-sized rows. Capping broadcast-joins the tiny trap
list back; only the rows under a trapped prefix shuffle for the
per-prefix rank window, everything else passes through scan-shaped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PREFIX_DEPTH = 2
MIN_TRAP_URLS = 100
MIN_TRAP_SHARE = 0.25
TRAP_KEEP = 50


def path_prefix(url: Column, depth: int = PREFIX_DEPTH) -> Column:
    """First ``depth`` path segments of a URL (query string excluded).

    One anchored regex (Java∩RE2 subset, mirrorable in DuckDB) —
    non-matching URLs (shallow paths, bare hosts) group under ``''``.
    """
    return F.regexp_extract(
        url, "^[a-z]+://[^/]+((?:/[^/?]+){" + str(depth) + "})", 1
    )


def prefix_counts(frontier: DataFrame, depth: int = PREFIX_DEPTH) -> DataFrame:
    """Pending-URL mass per (host, path prefix): the trap profile."""
    return frontier.groupBy(
        "host", path_prefix(F.col("url"), depth).alias("prefix")
    ).agg(F.count("*").alias("n_urls"))


def detect_traps(
    frontier: DataFrame,
    depth: int = PREFIX_DEPTH,
    min_urls: int = MIN_TRAP_URLS,
    min_share: float = MIN_TRAP_SHARE,
) -> DataFrame:
    """Prefixes that are both absolutely large (``min_urls``) and
    dominate their host (``min_share`` of its pending mass).

    ``frontier`` needs (host, url). Returns (host, prefix, n_urls,
    n_host) — dimension-sized however big the frontier is.
    """
    counts = prefix_counts(frontier, depth)
    totals = frontier.groupBy("host").agg(F.count("*").alias("n_host"))
    return (
        counts.join(totals, "host")
        .filter(
            (F.col("n_urls") >= min_urls)
            & (F.col("n_urls") >= min_share * F.col("n_host"))
        )
        .select("host", "prefix", "n_urls", "n_host")
    )


def cap_traps(
    frontier: DataFrame,
    traps: DataFrame,
    depth: int = PREFIX_DEPTH,
    keep: int = TRAP_KEEP,
) -> DataFrame:
    """Keep at most ``keep`` URLs per trapped prefix (first by URL
    order — deterministic), pass everything else through untouched.

    Untrapped rows never shuffle: the trap list broadcasts into a
    semi/anti split, and only the trapped subset pays the per-prefix
    rank window.
    """
    t = F.broadcast(
        traps.select("host", F.col("prefix").alias("_prefix")).distinct()
    )
    fr = frontier.withColumn("_prefix", path_prefix(F.col("url"), depth))
    passthrough = fr.join(t, ["host", "_prefix"], "left_anti")
    trapped = fr.join(t, ["host", "_prefix"], "left_semi")
    w = Window.partitionBy("host", "_prefix").orderBy("url")
    kept = (
        trapped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep)
        .drop("_rn")
    )
    return passthrough.unionByName(kept).drop("_prefix")
