"""Sitemap ingestion: XML sitemaps → frontier seed rows.

Seed discovery the reference lacks: a production crawl bootstraps a
host from its ``sitemap.xml`` (urlset entries with loc / lastmod /
changefreq / priority) and follows ``sitemapindex`` files to child
sitemaps. This module parses fetched sitemap payloads into typed rows
ready for the frontier's enqueue + dedup path.

Scale shape: parsing is a narrow Arrow-batched ``mapInPandas`` over
the fetched payloads — one sitemap document expands to its entries
inside the same partition, nothing shuffles until the frontier's own
enqueue dedup. Index entries come out as ``kind='sitemap'`` rows the
caller re-enqueues as fetches, so deep index trees iterate through the
ordinary crawl rounds instead of any driver-side recursion.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SITEMAP_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("src_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # url | sitemap
        T.StructField("loc", T.StringType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
    ]
)


def _local(tag: str) -> str:
    """Tag name with any ``{namespace}`` prefix stripped — sitemaps in
    the wild appear both with and without the sitemaps.org xmlns."""
    return tag.rsplit("}", 1)[-1]


def _parse_one(host: str, src_url: str, xml_text: str) -> list[dict]:
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    root_kind = _local(root.tag)
    if root_kind not in ("urlset", "sitemapindex"):
        return []
    kind = "url" if root_kind == "urlset" else "sitemap"
    out = []
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        fields: dict[str, str] = {}
        for child in entry:
            fields[_local(child.tag)] = (child.text or "").strip()
        loc = fields.get("loc")
        if not loc:
            continue
        pr = fields.get("priority")
        try:
            priority = float(pr) if pr is not None else None
        except ValueError:
            priority = None
        out.append(
            {
                "host": host,
                "src_url": src_url,
                "kind": kind,
                "loc": loc,
                "lastmod": fields.get("lastmod"),
                "changefreq": fields.get("changefreq"),
                "priority": priority,
            }
        )
    return out


def parse_sitemaps(fetched: DataFrame) -> DataFrame:
    """(host, url, body) sitemap payloads → one row per entry.

    ``body`` is the sitemap XML text. Malformed documents and entries
    without ``loc`` drop silently (a crawl ingests what it can);
    ``kind`` distinguishes page URLs from child sitemaps referenced by
    an index document.
    """

    def _parse(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SITEMAP_ENTRY_SCHEMA]
        for pdf in pdf_iter:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                rows.extend(_parse_one(r.host, r.url, r.body))
            yield pd.DataFrame(rows, columns=cols)

    return fetched.select("host", "url", "body").mapInPandas(
        _parse, SITEMAP_ENTRY_SCHEMA
    )


CHANGEFREQ_RANK = {
    "always": 6, "hourly": 5, "daily": 4, "weekly": 3,
    "monthly": 2, "yearly": 1, "never": 0,
}
_FREQ_DEFAULT = 3  # no hint / unknown token -> middle of the scale


def entry_priority(
    entries: DataFrame,
    now_date: str,
    p_weight: int = 10,
    f_weight: int = 2,
) -> DataFrame:
    """Fold sitemap metadata into the frontier's integer ``priority``
    column — the first-crawl twin of ``hostrank.apply_authority`` and
    ``frontier.focused_priority``: the site's own `<priority>`,
    `<changefreq>`, and `<lastmod>` hints become the dispatch order,
    so `select_batch`'s priority-ordered dequeue crawls what the site
    says matters first, with no new machinery.

    ``priority_int = round(10·priority)·p_weight + freq_rank·f_weight
    + recency`` — all integer: `<priority>` defaults to the
    protocol's 0.5 when absent; changefreq ranks always=6 → never=0
    (unknown/absent = 3); recency buckets days since lastmod at
    ``now_date`` (≤7 → +4, ≤30 → +3, ≤180 → +2, ≤365 → +1, older /
    unparseable / future-dated → +0 — garbage lastmods fail open).

    Pure codegen projection over `parse_sitemaps` output (``kind =
    'url'`` rows only); ``now_date`` is an explicit parameter so runs
    are reproducible. Zero shuffle at any corpus size."""
    freq = F.lower(F.col("changefreq"))
    freq_rank = F.lit(_FREQ_DEFAULT)
    for name, rank in CHANGEFREQ_RANK.items():
        freq_rank = F.when(freq == name, rank).otherwise(freq_rank)
    lastmod_day = F.expr("try_cast(substring(lastmod, 1, 10) AS DATE)")
    days = F.datediff(F.lit(now_date).cast("date"), lastmod_day)
    recency = (
        F.when(days.isNull() | (days < 0), 0)
        .when(days <= 7, 4)
        .when(days <= 30, 3)
        .when(days <= 180, 2)
        .when(days <= 365, 1)
        .otherwise(0)
    )
    p10 = F.round(F.coalesce(F.col("priority"), F.lit(0.5)) * 10).cast("int")
    return entries.where(
        (F.col("kind") == "url") & F.col("loc").isNotNull()
    ).withColumn(
        "priority_int",
        (p10 * p_weight + freq_rank * f_weight + recency).cast("int"),
    )
