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
