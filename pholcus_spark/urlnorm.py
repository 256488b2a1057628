"""URL canonicalization — the P6 scalar-helper surface.

Reference analogs: ``url.Parse`` normalization at enqueue
(``app/downloader/request/request.go:65-69``), href absolutization +
``MakeUrl`` helpers (``app/spider/common/common.go``,
``common/util/util.go:43-56``). The canonical form feeds ``url_key``
(xxhash64) exactly as the reference's normalized URL feeds its MD5 key.

Canonical form: lowercase scheme+host, default port stripped, fragment
dropped, query keys sorted, empty path -> '/', dot-segments resolved.

``canonicalize`` is a pure function (used by the oracle and inside
Arrow-batched pandas UDFs); ``canonicalize_series`` is the vectorized
entry point for ``pandas_udf``.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

import pandas as pd

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _resolve_dots(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out:
                out.pop()
        elif seg != "." and seg != "":
            out.append(seg)
    resolved = "/" + "/".join(out)
    if path.endswith("/") and resolved != "/":
        resolved += "/"
    return resolved


def canonicalize(url: str) -> str:
    """Deterministic canonical URL; returns '' for unparseable input."""
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower()
    if not host:
        return ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _resolve_dots(parts.path) if parts.path else "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


def surt_key_col(url):
    """SURT-style sort key as a pure JVM codegen expression (no Python):
    ``com,example,sub)/path`` — host lowercased, port and leading
    ``www.`` dropped, labels REVERSED so one registrable domain's URLs
    share a key prefix (the Common Crawl / Wayback CDX index layout;
    ISO 28500-adjacent convention). Sorting or range-partitioning a
    10^10-row URL index by this key gives per-domain locality — range
    scans of a site touch contiguous partitions — where raw-URL order
    scatters a domain across the keyspace. Query strings are excluded
    (key = authority + path), '' for unparseable input.

    Accepts/returns ``pyspark.sql.Column``."""
    from pyspark.sql import functions as F

    host = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(host == "", F.lit("")).otherwise(
        F.concat(rev, F.lit(")"), path)
    )
