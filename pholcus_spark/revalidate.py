"""HTTP conditional revisits: ETag / Last-Modified revalidation.

The reference re-fetches every revisit in full (its history only
dedups, ``app/aid/history/history.go`` — no change signal). At web
scale the recrawl traffic an engine schedules (``recrawl.py`` picks
WHICH urls to revisit) is dominated by pages that have NOT changed, so
a production crawler sends conditional requests (RFC 7232:
``If-None-Match`` from the stored ETag, ``If-Modified-Since`` from the
stored Last-Modified) and a ``304 Not Modified`` answer costs headers
instead of the payload — the single biggest bandwidth lever on a
revisit-heavy frontier.

Spark shape — two url_key equi-joins, both over validator-sized rows,
never payload bytes on the unchanged path:

- ``conditional_headers``: candidates LEFT JOIN the validator store
  (url_key → etag, last_modified, fingerprint). Both sides are
  frontier-scale, so this is the same join class as the seen-set
  anti-join — bucket/partition by url_key and it co-locates with the
  rest of the round's url_key-keyed plan (one Exchange at most, none
  when the store is bucketed like ``seen_catalog``).
- ``merge_revalidated``: after the fetch, 304 rows recover their
  payload fingerprint from the cache and the validator store is
  refreshed — 200 rows contribute their NEW validators, 304 rows
  carry the old ones forward, and first-visit rows enter the store.

The fetch boundary itself needs no new machinery: ``HttpFetcher``
already returns the status verbatim, and 304 (< 400) is a non-retried
success — the sandbox test drives it with an injected transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["conditional_headers", "merge_revalidated"]

_VCOLS = ("etag", "last_modified", "fingerprint")


def conditional_headers(
    candidates: DataFrame,
    validators: DataFrame,
    key: str = "url_key",
) -> DataFrame:
    """Attach stored validators to a revisit batch.

    Adds ``etag``/``last_modified``/``cached_fp`` (NULL on first
    visit) and ``is_conditional``; the fetch layer turns non-NULL
    ``etag`` into ``If-None-Match`` and ``last_modified`` into
    ``If-Modified-Since`` (both sent when both exist — If-None-Match
    wins server-side per RFC 7232 §6)."""
    v = validators.select(
        key,
        F.col("etag"),
        F.col("last_modified"),
        F.col("fingerprint").alias("cached_fp"),
    )
    out = candidates.join(v, key, "left")
    return out.withColumn(
        "is_conditional",
        F.col("etag").isNotNull() | F.col("last_modified").isNotNull(),
    )


def merge_revalidated(
    results: DataFrame,
    validators: DataFrame,
    key: str = "url_key",
) -> tuple[DataFrame, DataFrame]:
    """Fold 304s back into full rows and refresh the validator store.

    ``results`` carries (key, status, etag, last_modified,
    fingerprint, …) where 304 rows have NULL payload columns (the
    server sent none). Returns:

    - merged: every row with ``fingerprint`` resolved (network value
      for 200s, cached value for 304s) and ``from_cache`` marking
      which path served it — only the 304-row slice joins back to the
      store, so the unchanged path shuffles keys and validators, not
      payloads;
    - new_validators: the refreshed store — 200 rows overwrite, 304
      rows carry the stored validators forward, untouched store rows
      persist."""
    is_304 = F.col("status") == 304
    modified = results.filter(~is_304).withColumn(
        "from_cache", F.lit(False)
    )
    revalidated = (
        results.filter(is_304)
        .drop(*_VCOLS)
        .join(validators.select(key, *_VCOLS), key, "inner")
        .withColumn("from_cache", F.lit(True))
    )
    merged = modified.unionByName(revalidated)

    fresh = merged.select(key, *_VCOLS)
    untouched = validators.select(key, *_VCOLS).join(
        merged.select(key), key, "left_anti"
    )
    return merged, fresh.unionByName(untouched)
