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


def mine_param_rules(pages, min_evidence: int = 3):
    """DUST-style tracking-parameter discovery: learn which query
    parameters do NOT change page content (session ids, click
    trackers) so canonicalization can strip them corpus-wide — the
    learned complement to the static rules above, and at crawl scale
    the difference between fetching every ?sid= variant and fetching
    the page once.

    Input: distinct (url, content_fp) rows. For every parameter
    occurrence, reconstruct the URL WITHOUT that parameter and look it
    up in the same corpus; when both variants were crawled, their
    fingerprints are evidence: equal → the parameter didn't matter.
    A (host, param) becomes a strip rule when every one of at least
    ``min_evidence`` observed pairs agrees (one counter-example
    vetoes — a parameter that ever changes content is load-bearing).

    Plan shape: one explode over parameter occurrences (bounded by
    params-per-URL), one equi-join on the reconstructed URL string
    (hash join — the only shuffle of corpus-sized data), one
    (host, param) aggregate. All string surgery is codegen.

    Returns (host, param, n_pairs, n_same, strip boolean)."""
    from pyspark.sql import functions as F

    base = pages.select(
        "url",
        "content_fp",
        F.regexp_extract("url", r"^[a-z]+://([^/?#]+)", 1).alias("host"),
        F.substring_index("url", "?", 1).alias("path_part"),
        F.when(
            F.col("url").contains("?"),
            F.expr("substring(url, instr(url, '?') + 1)"),
        ).alias("query_part"),
    )
    occ = base.filter(F.col("query_part").isNotNull()).select(
        "url",
        "content_fp",
        "host",
        "path_part",
        "query_part",
        F.explode(F.split("query_part", "&")).alias("pair"),
    )
    others = F.filter(
        F.split("query_part", "&"), lambda x: x != F.col("pair")
    )
    stripped = F.concat(
        F.col("path_part"),
        F.when(F.size(others) > 0, F.concat(F.lit("?"),
               F.array_join(others, "&"))).otherwise(F.lit("")),
    )
    occ = occ.select(
        "host",
        "content_fp",
        F.substring_index("pair", "=", 1).alias("param"),
        stripped.alias("stripped_url"),
    )
    twin = pages.select(
        F.col("url").alias("stripped_url"),
        F.col("content_fp").alias("fp2"),
    )
    ev = occ.join(twin, "stripped_url")
    agg = ev.groupBy("host", "param").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            (F.col("content_fp") == F.col("fp2")).cast("long")
        ).alias("n_same"),
    )
    return agg.withColumn(
        "strip",
        (F.col("n_pairs") >= min_evidence)
        & (F.col("n_same") == F.col("n_pairs")),
    )


def apply_param_rules(urls, rules):
    """The apply half of ``mine_param_rules``: strip every learned
    (host, param) from a URL column corpus-wide — the step that turns
    the mined rules into fewer frontier variants and one seen-set
    identity per real page. Surviving parameters keep their original
    order; a query emptied entirely loses its '?'.

    Scale shape: rules collapse to one param-array per host
    (dimension-sized hash agg) and BROADCAST-join onto the corpus on
    host — the corpus never shuffles; the strip itself is a
    higher-order filter over the split query tokens, pure codegen.
    Bare keys (no '=') match on the whole token.

    Returns the input plus ``url_clean`` (and ``n_stripped``)."""
    from pyspark.sql import functions as F

    dims = (
        rules.filter(F.col("strip"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("_strip_params"))
    )
    host = F.regexp_extract("url", r"^[a-z]+://([^/?#]+)", 1)
    with_host = urls.withColumn("_h", host).join(
        F.broadcast(dims),
        F.col("_h") == dims["host"],
        "left",
    ).drop(dims["host"])
    toks = F.split(
        F.expr("substring(url, instr(url, '?') + 1)"), "&"
    )
    kept = F.filter(
        toks,
        lambda t: ~F.array_contains(
            F.col("_strip_params"), F.substring_index(t, "=", 1)
        ),
    )
    rebuilt = F.concat(
        F.substring_index("url", "?", 1),
        F.when(
            F.size(kept) > 0,
            F.concat(F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(F.lit("")),
    )
    untouched = (~F.col("url").contains("?")) | F.col(
        "_strip_params"
    ).isNull()
    return with_host.select(
        *[c for c in urls.columns],
        F.when(untouched, F.col("url")).otherwise(rebuilt).alias(
            "url_clean"
        ),
        F.when(untouched, F.lit(0))
        .otherwise(F.size(toks) - F.size(kept))
        .cast("int")
        .alias("n_stripped"),
    )


def canonical_col(url):
    """Codegen static canonicalization — the column twin of
    ``canonicalize()`` for set-wide URL work where the corpus must not
    pass through Python: lowercase scheme+host, strip the scheme's
    default port, drop the fragment, sort query tokens (dot-segment
    resolution and percent-recoding stay in the pandas twin the
    enqueue path uses). '' for input with no host. Pure expressions —
    a DuckDB oracle replays every step."""
    from pyspark.sql import functions as F

    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    hostport = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    qpart = F.when(
        query == "", F.lit("")
    ).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")),
                                          "&"))
    )
    return F.when(host == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qpart)
    )


def resolve_url_identity(
    urls,
    param_rules,
    redirects,
    mirrors,
    max_rounds: int = 6,
):
    """The composed URL-identity chain — every alias mechanism the
    crawl observes collapsed into ONE canonical identity per page, in
    dependency order: static canonicalization (``canonical_col``) →
    learned tracking-param strip (``apply_param_rules``) →
    redirect-chain resolution (``frontier.resolve_redirects`` pointer
    doubling, edges normalized through the SAME two steps) →
    mirror-host rewrite (``mirrors`` = (host, canonical_host), e.g.
    ``dedup.mirror_collapse`` output, broadcast) → SURT index key of
    the result. This is what the seen-set, politeness budgets, and
    URL-level dedup should key on: without it every alias family
    multiplies fetches and dedup misses.

    Scale shape: canonicalization and param strip are codegen over the
    scan (rules + mirrors broadcast); the redirect map is resolved
    once on the (bounded, crawl-observed) edge set and hash-joined
    back; the corpus shuffles exactly once, on the redirect join key.

    Returns (url, url_identity, surt, n_hops, redirected, mirrored) —
    one row per input URL."""
    from pyspark.sql import functions as F

    from .frontier import resolve_redirects

    def _norm(frame, col):
        canon = frame.select(
            F.col(col).alias("_raw0"),
            canonical_col(F.col(col)).alias("url"),
        )
        return apply_param_rules(canon, param_rules).select(
            F.col("_raw0").alias(col),
            F.col("url_clean").alias(f"{col}_n"),
        )

    base = urls.withColumn("_c", canonical_col(F.col("url")))
    base = apply_param_rules(
        base.withColumnRenamed("url", "_raw")
        .withColumnRenamed("_c", "url"),
        param_rules,
    ).select(
        F.col("_raw").alias("url"), F.col("url_clean").alias("_n")
    )

    e_src = _norm(redirects, "src")
    e_dst = _norm(redirects, "dst")
    edges = (
        redirects.join(e_src, "src").join(e_dst, "dst")
        .select(F.col("src_n").alias("src"), F.col("dst_n").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src"])
    )
    resolved = resolve_redirects(edges, max_rounds=max_rounds)
    joined = base.join(
        resolved.select(
            F.col("src_url").alias("_n"),
            "final_url", "n_hops", "is_loop",
        ),
        "_n",
        "left",
    )
    final = F.when(
        F.col("final_url").isNotNull() & ~F.col("is_loop"),
        F.col("final_url"),
    ).otherwise(F.col("_n"))
    joined = joined.select(
        "url",
        final.alias("_f"),
        F.coalesce(
            F.when(~F.col("is_loop"), F.col("n_hops")), F.lit(0)
        ).cast("int").alias("n_hops"),
    )

    fhost = F.regexp_extract("_f", r"^[a-z+.-]+://([^/?#]+)", 1)
    rest = F.regexp_extract("_f", r"^[a-z+.-]+://[^/?#]*(.*)$", 1)
    fscheme = F.regexp_extract("_f", r"^([a-z+.-]+)://", 1)
    m = mirrors.select(
        F.col("host").alias("_mh"),
        F.col("canonical_host").alias("_mc"),
    )
    out = joined.join(F.broadcast(m), joined["_f"].isNotNull()
                      & (fhost == F.col("_mh")), "left")
    identity = F.when(
        F.col("_mc").isNotNull(),
        F.concat(fscheme, F.lit("://"), F.col("_mc"), rest),
    ).otherwise(F.col("_f"))
    return out.select(
        "url",
        identity.alias("url_identity"),
        surt_key_col(identity).alias("surt"),
        F.col("n_hops").cast("int").alias("n_hops"),
        (F.col("n_hops") > 0).alias("redirected"),
        F.col("_mc").isNotNull().alias("mirrored"),
    )


# Effective-TLD suffixes needing an extra label for the registrable
# domain — a representative slice of the public suffix list (ICANN
# country second-levels plus two private-section entries, where every
# subdomain is an INDEPENDENT site: user pages on github.io /
# blogspot.com must not share one crawl budget).
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr",
    "github.io", "blogspot.com",
)


def registrable_domain(host):
    """eTLD+1 (the "site") from a hostname — public-suffix semantics
    over a fixed suffix table, entirely JVM-side. Crawl budgets,
    politeness, and mirror analysis want SITE granularity, not host:
    img1/img2/cdn/www of one site share an origin's goodwill, while
    user1.github.io and user2.github.io are different publishers.
    One label past the matched suffix; hosts at or below suffix
    length pass through unchanged."""
    from pyspark.sql import functions as F

    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )
