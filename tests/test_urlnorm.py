"""URL canonicalization (P6 surface; reference request.go:65-69
normalization + href absolutization helpers)."""

import pandas as pd

from pholcus_spark.urlnorm import canonicalize, canonicalize_series, host_of


def test_canonical_basics():
    assert canonicalize("HTTP://Example.COM/A/b") == "http://example.com/A/b"
    assert canonicalize("http://example.com") == "http://example.com/"
    assert canonicalize("http://example.com:80/x") == "http://example.com/x"
    assert canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert canonicalize("http://example.com:8080/x") == "http://example.com:8080/x"


def test_fragment_dropped_query_sorted():
    assert (
        canonicalize("http://e.com/p?b=2&a=1#frag") == "http://e.com/p?a=1&b=2"
    )


def test_dot_segments():
    assert canonicalize("http://e.com/a/b/../c/./d") == "http://e.com/a/c/d"
    assert canonicalize("http://e.com/../../x") == "http://e.com/x"


def test_idempotent():
    urls = [
        "HTTP://E.com:80/a/../b?z=1&a=2#f",
        "http://h000.example.com/page/00001",
    ]
    for u in urls:
        c = canonicalize(u)
        assert canonicalize(c) == c


def test_invalid_urls():
    assert canonicalize("") == ""
    assert canonicalize("not a url") == ""
    assert host_of("http://X.com/p") == "x.com"


def test_series_vectorized():
    s = pd.Series(["http://A.com/x", "bad"])
    out = canonicalize_series(s)
    assert list(out) == ["http://a.com/x", ""]


def test_surt_key_reversal_strip_and_locality(spark):
    """Label reversal, www/port stripping, empty-path default, query
    exclusion; and the locality property the key exists for — one
    registrable domain's URLs share a key prefix."""
    from pyspark.sql import functions as F

    from pholcus_spark.urlnorm import surt_key_col

    urls = [
        ("http://www.Example.COM/a/b", "com,example)/a/b"),
        ("https://sub.example.com:8443/x?q=1", "com,example,sub)/x"),
        ("http://example.com", "com,example)/"),
        ("http://deep.sub.example.com/p", "com,example,sub,deep)/p"),
        ("not a url", ""),
    ]
    df = spark.createDataFrame(urls, "url string, want string").select(
        "url", "want", surt_key_col(F.col("url")).alias("got")
    )
    for r in df.collect():
        assert r["got"] == r["want"], (r["url"], r["got"])
    # locality: every example.com key starts with the domain prefix
    keys = [r["got"] for r in df.collect() if r["got"]]
    assert all(k.startswith("com,example") for k in keys)


def test_mine_param_rules_veto_and_threshold(spark):
    """One counter-example vetoes a rule; below-evidence params don't
    become rules even when all pairs agree."""
    from pholcus_spark import urlnorm

    pages = [
        # 'utm' never changes content: 4 agreeing pairs
        ("http://h.test/a?utm=1", 10), ("http://h.test/a", 10),
        ("http://h.test/b?utm=2", 20), ("http://h.test/b", 20),
        ("http://h.test/c?utm=3", 30), ("http://h.test/c", 30),
        ("http://h.test/d?utm=4", 40), ("http://h.test/d", 40),
        # 'v' agrees twice then flips once: vetoed
        ("http://h.test/e?v=1", 50), ("http://h.test/e", 50),
        ("http://h.test/f?v=1", 60), ("http://h.test/f", 60),
        ("http://h.test/g?v=1", 71), ("http://h.test/g", 70),
        # 'one' agrees but only once: under min_evidence
        ("http://h.test/i?one=1", 80), ("http://h.test/i", 80),
    ]
    df = spark.createDataFrame(pages, ["url", "content_fp"])
    got = {r["param"]: r for r in urlnorm.mine_param_rules(df).collect()}
    assert got["utm"]["strip"] and got["utm"]["n_pairs"] == 4
    assert not got["v"]["strip"] and got["v"]["n_same"] == 2
    assert not got["one"]["strip"] and got["one"]["n_pairs"] == 1
    # multi-param URL: stripping the middle param reconstructs joins
    multi = spark.createDataFrame(
        [("http://h.test/m?a=1&b=2&c=3", 1),
         ("http://h.test/m?a=1&c=3", 1),
         ("http://h.test/m?a=1&b=2", 2)],
        ["url", "content_fp"],
    )
    got2 = {r["param"]: r
            for r in urlnorm.mine_param_rules(multi, 1).collect()}
    assert got2["b"]["n_pairs"] == 1 and got2["b"]["strip"]
    assert got2["c"]["n_same"] == 0


def test_apply_param_rules_composes_with_miner(spark):
    """mine_param_rules → apply_param_rules end-to-end: a corpus where
    sid never changes content and page always does must come back with
    sid stripped everywhere (including multi-param URLs) and page kept;
    hosts without rules and URLs without queries pass through."""
    from pholcus_spark.urlnorm import apply_param_rules, mine_param_rules

    rows = []
    for p in range(4):
        fp = f"fp-{p}"
        rows += [
            (f"http://m.test/a?page={p}", fp),
            (f"http://m.test/a?page={p}&sid={p * 7}", fp),
            (f"http://m.test/a?sid={p}", "fp-base"),
            ("http://m.test/a", "fp-base"),
        ]
    rows.append(("http://other.test/x?sid=1", "fp-z"))
    pages = spark.createDataFrame(
        sorted(set(rows)), "url string, content_fp string"
    )
    rules = mine_param_rules(pages, min_evidence=3)
    learned = {
        (r["host"], r["param"]): r["strip"] for r in rules.collect()
    }
    assert learned[("m.test", "sid")] is True
    assert learned[("m.test", "page")] is False

    out = {
        r["url"]: (r["url_clean"], r["n_stripped"])
        for r in apply_param_rules(pages.select("url"), rules).collect()
    }
    assert out["http://m.test/a?page=2&sid=14"] == (
        "http://m.test/a?page=2", 1
    )
    assert out["http://m.test/a?sid=3"] == ("http://m.test/a", 1)
    assert out["http://m.test/a?page=1"] == ("http://m.test/a?page=1", 0)
    assert out["http://m.test/a"] == ("http://m.test/a", 0)
    assert out["http://other.test/x?sid=1"] == (
        "http://other.test/x?sid=1", 0
    )


def test_resolve_url_identity_all_alias_classes(spark):
    """One canonical identity per page across every alias mechanism:
    case/port/fragment noise, learned-param variants, a 2-hop redirect
    chain, a mirrored host — and a redirect CYCLE, whose members fall
    back to their own cleaned self (no hop count, not 'redirected')."""
    from pholcus_spark.urlnorm import resolve_url_identity

    urls = spark.createDataFrame(
        [("HTTP://A.Test:80/p?sid=1&q=2#frag",),
         ("http://a.test/p?q=2&sid=9",),     # same page, other sid
         ("http://a.test/moved?q=2",),       # 2-hop chain
         ("http://m2.test/x",),              # mirrored host
         ("http://loop.test/a",),            # 2-cycle member
         ("http://b.test/plain",)],
        "url string")
    rules = spark.createDataFrame(
        [("a.test", "sid", 3, 3, True)],
        "host string, param string, n_pairs long, n_same long, strip boolean")
    redirects = spark.createDataFrame(
        [("http://a.test/moved?q=2&sid=4", "http://a.test/hop2"),
         ("http://a.test/hop2", "http://a.test/final"),
         ("http://loop.test/a", "http://loop.test/b"),
         ("http://loop.test/b", "http://loop.test/a")],
        "src string, dst string")
    mirrors = spark.createDataFrame(
        [("m2.test", "m1.test")], "host string, canonical_host string")

    got = {r["url"]: r for r in resolve_url_identity(
        urls, rules, redirects, mirrors).collect()}
    assert len(got) == 6
    # the two sid-variants collapse to ONE identity
    a1 = got["HTTP://A.Test:80/p?sid=1&q=2#frag"]
    a2 = got["http://a.test/p?q=2&sid=9"]
    assert a1["url_identity"] == a2["url_identity"] == "http://a.test/p?q=2"
    assert a1["surt"] == "test,a)/p"
    r = got["http://a.test/moved?q=2"]
    assert (r["url_identity"], r["n_hops"], r["redirected"]) == (
        "http://a.test/final", 2, True)
    m = got["http://m2.test/x"]
    assert (m["url_identity"], m["mirrored"]) == ("http://m1.test/x", True)
    lp = got["http://loop.test/a"]
    assert (lp["url_identity"], lp["n_hops"], lp["redirected"]) == (
        "http://loop.test/a", 0, False)
    assert got["http://b.test/plain"]["url_identity"] == \
        "http://b.test/plain"


def test_registrable_domain_psl_semantics(spark):
    from pyspark.sql import functions as F

    from pholcus_spark import urlnorm

    cases = {
        "www.example.com": "example.com",
        "a.b.example.co.uk": "example.co.uk",
        "user.github.io": "user.github.io",
        "x.user.github.io": "user.github.io",
        "blog.blogspot.com": "blog.blogspot.com",
        "cdn.shop.example.com.au": "example.com.au",
        "localhost": "localhost",
        "co.uk": "co.uk",          # bare suffix passes through
        "example.com": "example.com",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["site"]
        for r in df.select(
            "host",
            urlnorm.registrable_domain(F.col("host")).alias("site"),
        ).collect()
    }
    assert got == cases
