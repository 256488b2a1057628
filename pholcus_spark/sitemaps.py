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


FEED_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),  # rss | atom
        T.StructField("entry_url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("published_raw", T.StringType(), True),
    ]
)


def _parse_feed_one(feed_url: str, xml_text: str) -> list[dict]:
    """One RSS 2.0 or Atom document → entry dicts. Malformed XML and
    link-less entries drop silently (same ingest-what-you-can policy
    as sitemaps)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    out: list[dict] = []
    tag = _local(root.tag)
    if tag == "rss":
        for item in root.iter():
            if _local(item.tag) != "item":
                continue
            link = title = pub = None
            for c in item:
                t = _local(c.tag)
                v = (c.text or "").strip() or None
                if t == "link":
                    link = v
                elif t == "title":
                    title = v
                elif t == "pubDate":
                    pub = v
            if link:
                out.append(
                    {
                        "feed_url": feed_url,
                        "fmt": "rss",
                        "entry_url": link,
                        "title": title,
                        "published_raw": pub,
                    }
                )
    elif tag == "feed":  # Atom
        for entry in root.iter():
            if _local(entry.tag) != "entry":
                continue
            link = title = pub = None
            for c in entry:
                t = _local(c.tag)
                if t == "link":
                    # rel="alternate" (or no rel) carries the page
                    rel = c.get("rel") or "alternate"
                    if rel == "alternate" and c.get("href"):
                        link = c.get("href")
                elif t == "title":
                    title = (c.text or "").strip() or None
                elif t in ("published", "updated") and pub is None:
                    pub = (c.text or "").strip() or None
            if link:
                out.append(
                    {
                        "feed_url": feed_url,
                        "fmt": "atom",
                        "entry_url": link,
                        "title": title,
                        "published_raw": pub,
                    }
                )
    return out


def parse_feeds(fetched: DataFrame) -> DataFrame:
    """(url, body) RSS/Atom payloads → one row per entry — the
    freshness-discovery channel next to sitemaps: news/blog hosts
    announce new URLs in feeds hours before sitemap regeneration, so
    a recrawl scheduler polls feeds at high frequency and pushes the
    entries through the ordinary enqueue+dedup path (entry URLs the
    frontier has seen cost one anti-join row each).

    Same scale shape as ``parse_sitemaps``: narrow Arrow-batched
    ``mapInPandas``, entries expand inside their partition, nothing
    shuffles here. RSS 2.0 ``<item>`` (link/title/pubDate) and Atom
    ``<entry>`` (rel=alternate link href, title, published|updated),
    namespace-agnostic; malformed documents drop silently."""

    def _parse(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEED_ENTRY_SCHEMA]
        for pdf in pdf_iter:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                rows.extend(_parse_feed_one(r.url, r.body))
            yield pd.DataFrame(rows, columns=cols)

    return fetched.select("url", "body").mapInPandas(
        _parse, FEED_ENTRY_SCHEMA
    )


IMAGE_SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("page_url", T.StringType(), False),
        T.StructField("img_url", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
    ]
)


def _parse_image_sitemap_one(
    host: str, xml_text: str
) -> list[dict]:
    """One Google-image-extension sitemap → (page, image, caption)
    dicts. ``<url>`` entries carry 0-1000 ``<image:image>`` blocks
    with loc (required), caption and title (optional); namespace-
    agnostic like the base parser; blocks without an image loc and
    pages without a loc drop."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    if _local(root.tag) != "urlset":
        return []
    out = []
    for entry in root:
        if _local(entry.tag) != "url":
            continue
        page = None
        images = []
        for child in entry:
            tag = _local(child.tag)
            if tag == "loc":
                page = (child.text or "").strip() or None
            elif tag == "image":
                img: dict[str, str | None] = {
                    "loc": None, "caption": None, "title": None
                }
                for c in child:
                    t2 = _local(c.tag)
                    if t2 in img:
                        img[t2] = (c.text or "").strip() or None
                if img["loc"]:
                    images.append(img)
        if not page:
            continue
        for img in images:
            out.append(
                {
                    "host": host,
                    "page_url": page,
                    "img_url": img["loc"],
                    "caption": img["caption"],
                    "title": img["title"],
                }
            )
    return out


def parse_image_sitemaps(fetched: DataFrame) -> DataFrame:
    """(host, body) image-sitemap payloads → one row per DECLARED
    image+caption pair — the fifth harvest surface next to inline
    ``<img alt>``, ``<picture>``, social cards, and JSON-LD: sites
    using the Google image-sitemap extension hand the crawl their
    image inventory with captions BEFORE any page is fetched, so
    these pairs seed both the frontier (fetch the image URLs) and
    the corpus (caption truth straight from the publisher). Same
    narrow Arrow map shape as the base sitemap parser."""

    def _parse(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_SITEMAP_SCHEMA]
        for pdf in pdf_iter:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                rows.extend(_parse_image_sitemap_one(r.host, r.body))
            yield pd.DataFrame(rows, columns=cols)

    return fetched.select("host", "body").mapInPandas(
        _parse, IMAGE_SITEMAP_SCHEMA
    )
