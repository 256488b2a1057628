"""Driver-side collectors for oracle comparison — TEST-ONLY.

These materialize whole crawl tables to the driver, which is exactly
what the production engine must never do; they live here (not on
CrawlEngine) so the engine surface has no full-table collects.
Production code uses fetched_df()/_url_seen_df() and stays distributed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pholcus_spark.crawler import CrawlEngine
from pholcus_spark.schemas import URL_SEEN_SCHEMA


def visits_log(eng: CrawlEngine) -> list[tuple]:
    """Full visit log, ordered like the oracle's dispatch order."""
    df = eng.fetched_df().select(
        F.col("visit_round").alias("round"),
        "url_key", "url", "priority", "seq", "attempt", "ok",
    ).orderBy("round", F.desc("priority"), "seq", "attempt")
    return [
        (r["round"], r["url_key"], r["url"], r["priority"], r["seq"],
         r["attempt"], r["ok"])
        for r in df.collect()
    ]


def url_seen_set(eng: CrawlEngine) -> set[int]:
    """Driver-side materialization of the URL-seen set."""
    return {
        r["url_key"]
        for r in eng.load("url_seen", URL_SEEN_SCHEMA).collect()
    }
