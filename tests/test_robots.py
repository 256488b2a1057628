"""robots.txt parser: group selection, allow/disallow precedence,
crawl-delay, and the vectorized politeness DataFrame builder."""

from __future__ import annotations

from pholcus_spark import robots

SAMPLE = """
# global rules
User-agent: *
Disallow: /private
Disallow: /tmp
Crawl-delay: 2

User-agent: pholcus
Allow: /private/ok
Disallow: /private
Crawl-delay: 0.5

User-agent: googlebot
User-agent: bingbot
Disallow: /
"""


def test_group_selection_exact_agent():
    pol = robots.parse_robots(SAMPLE, "pholcus")
    assert pol.crawl_delay_ms == 500
    assert pol.disallow == ["/private"]
    assert pol.allow == ["/private/ok"]


def test_group_selection_wildcard_and_multi_agent():
    pol = robots.parse_robots(SAMPLE, "otherbot")
    assert pol.crawl_delay_ms == 2000
    assert pol.disallow == ["/private", "/tmp"]
    # multi-agent group (googlebot+bingbot share rules)
    assert robots.parse_robots(SAMPLE, "bingbot").disallow == ["/"]


def test_substring_agent_match():
    pol = robots.parse_robots(SAMPLE, "pholcus-spark/1.0")
    assert pol.crawl_delay_ms == 500


def test_allow_longest_match_wins():
    pol = robots.parse_robots(SAMPLE, "pholcus")
    assert not pol.allows("/private/x")
    assert pol.allows("/private/ok/img.png")  # Allow is more specific
    assert pol.allows("/public")


def test_empty_and_garbage_are_permissive():
    assert robots.parse_robots("", "x").allows("/anything")
    assert robots.parse_robots("%%% not robots", "x").crawl_delay_ms == 300


def test_politeness_from_robots_df(spark):
    bodies = spark.createDataFrame(
        [
            ("h1.example.com", SAMPLE),
            ("h2.example.com", None),
            ("h3.example.com", "User-agent: *\nCrawl-delay: 10\nDisallow: /x"),
        ],
        "host string, robots_txt string",
    )
    pol = {
        r["host"]: r
        for r in robots.politeness_from_robots(
            bodies, agent="pholcus", round_duration_ms=1000
        ).collect()
    }
    assert pol["h1.example.com"]["crawl_delay_ms"] == 500
    assert pol["h1.example.com"]["max_per_round"] == 2
    assert pol["h2.example.com"]["crawl_delay_ms"] == 300  # missing → default
    assert pol["h3.example.com"]["max_per_round"] == 1  # 10s delay, 1s round
    assert list(pol["h3.example.com"]["robots_disallow"]) == ["/x"]


def test_sitemap_urls_extraction():
    from pholcus_spark.robots import sitemap_urls

    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://h.test/sitemap.xml\n"
        "sitemap: https://h.test/sitemap2.xml  # comment\n"
        "Sitemap: https://h.test/sitemap.xml\n"  # duplicate drops
        "Sitemap:\n"  # empty drops
    )
    assert sitemap_urls(txt) == [
        "https://h.test/sitemap.xml",
        "https://h.test/sitemap2.xml",
    ]
    assert sitemap_urls("") == []
    assert sitemap_urls("User-agent: *\nDisallow: /") == []


def test_sitemaps_from_robots_df(spark):
    from pholcus_spark.robots import sitemaps_from_robots

    bodies = spark.createDataFrame(
        [
            ("a.test", "Sitemap: http://a.test/s1.xml\nSitemap: http://a.test/s2.xml"),
            ("b.test", "User-agent: *\nDisallow: /"),
        ],
        ["host", "robots_txt"],
    )
    rows = sorted(
        (r["host"], r["sitemap_url"]) for r in sitemaps_from_robots(bodies).collect()
    )
    assert rows == [
        ("a.test", "http://a.test/s1.xml"),
        ("a.test", "http://a.test/s2.xml"),
    ]


def test_rule_matches_wildcards():
    """RFC 9309 / Google wildcard examples: * = any octet run,
    trailing $ = end-of-path anchor, everything else literal."""
    from pholcus_spark.robots import rule_matches

    # plain prefix (fast path)
    assert rule_matches("/fish", "/fish.html")
    assert rule_matches("/fish", "/fishheads/yummy.html")
    assert not rule_matches("/fish", "/Fish.asp")
    assert not rule_matches("/fish", "/catfish")
    # /fish* is equivalent to /fish
    assert rule_matches("/fish*", "/fish.html")
    assert rule_matches("/fish*", "/fishheads")
    assert not rule_matches("/fish*", "/desert/fish")
    # /*.php — any path containing .php after some prefix
    assert rule_matches("/*.php", "/index.php")
    assert rule_matches("/*.php", "/folder/filename.php?parameters")
    assert not rule_matches("/*.php", "/")
    assert not rule_matches("/*.php", "/windows.PHP")
    # trailing $ anchors the end
    assert rule_matches("/fish$", "/fish")
    assert not rule_matches("/fish$", "/fish.html")
    assert rule_matches("/*.php$", "/filename.php")
    assert not rule_matches("/*.php$", "/filename.php?parameters")
    # regex metacharacters in rules stay literal
    assert rule_matches("/a(b)+c", "/a(b)+c/d")
    assert not rule_matches("/a(b)+c", "/abbc")


def test_policy_allows_wildcard_specificity():
    """Most-specific (longest rule) wins; Allow wins exact ties."""
    from pholcus_spark.robots import RobotsPolicy

    # Google example: Allow /p longer than Disallow /
    pol = RobotsPolicy(disallow=["/"], allow=["/p"])
    assert pol.allows("/page")
    assert not pol.allows("/index.html")
    # wildcard rule length counts the wildcard octets
    pol = RobotsPolicy(disallow=["/*.htm"], allow=["/page"])
    assert not pol.allows("/page.htm")  # 6 > 5
    # $-anchored disallow blocks only the exact path
    pol = RobotsPolicy(disallow=["/doc$"])
    assert not pol.allows("/doc")
    assert pol.allows("/doc/page")


def test_filter_robots_wildcards(spark):
    """Engine codegen filter matches the Python twin on wildcard
    rules (frontier._robots_rule_match vs robots.rule_matches)."""
    from pholcus_spark import frontier
    from pholcus_spark.robots import rule_matches
    from pholcus_spark.schemas import POLITENESS_SCHEMA

    rules = ["/private", "/*.php", "/fish*", "/doc$", "/a*.html$"]
    paths = [
        "/private/x", "/public/x", "/a1.php", "/a1.html", "/fishing",
        "/doc", "/doc/x", "/tmp/1", "/x.php?q=1", "/a.htmlx",
    ]
    pol = spark.createDataFrame(
        [("h.test", 100, rules, 5)], POLITENESS_SCHEMA
    )
    cands = spark.createDataFrame(
        [("http://h.test" + p, "h.test") for p in paths], ["url", "host"]
    )
    kept = sorted(
        r["url"] for r in frontier.filter_robots(cands, pol).collect()
    )
    expect = sorted(
        "http://h.test" + p
        for p in paths
        if not any(rule_matches(rule, p) for rule in rules)
    )
    assert kept == expect
    # sanity: the fixture actually exercises both kept and dropped
    assert 0 < len(kept) < len(paths)


def test_filter_robots_allow_column_matches_policy(spark):
    """With a robots_allow column the engine filter must agree with
    RobotsPolicy.allows (most-specific wins, Allow wins ties) on every
    path; without the column the conservative disallow-only subset is
    unchanged."""
    from pholcus_spark import frontier
    from pholcus_spark.robots import RobotsPolicy

    disallow = ["/", "/*.php"]
    allow = ["/public", "/a*.php$"]
    paths = ["/public/x", "/private", "/a1.php", "/a1.php?q=1", "/",
             "/public", "/x.php"]
    pol5 = spark.createDataFrame(
        [("h.test", 100, disallow, 5, allow)],
        "host string, crawl_delay_ms long, robots_disallow array<string>,"
        " max_per_round int, robots_allow array<string>",
    )
    cands = spark.createDataFrame(
        [("http://h.test" + p, "h.test") for p in paths], ["url", "host"]
    )
    kept = sorted(
        r["url"] for r in frontier.filter_robots(cands, pol5).collect()
    )
    policy = RobotsPolicy(disallow=disallow, allow=allow)
    expect = sorted(
        "http://h.test" + p for p in paths if policy.allows(p)
    )
    assert kept == expect
    assert 0 < len(kept) < len(paths)
    # 4-column dim: allow rules absent → disallow-only semantics
    from pholcus_spark.schemas import POLITENESS_SCHEMA

    pol4 = spark.createDataFrame(
        [("h.test", 100, disallow, 5)], POLITENESS_SCHEMA
    )
    kept4 = [r["url"] for r in frontier.filter_robots(cands, pol4).collect()]
    assert kept4 == []  # Disallow:/ drops everything without Allow


def test_politeness_from_robots_emit_allow(spark):
    from pholcus_spark.robots import politeness_from_robots

    bodies = spark.createDataFrame(
        [("h.test",
          "User-agent: *\nDisallow: /\nAllow: /public\nCrawl-delay: 2")],
        ["host", "robots_txt"],
    )
    r4 = politeness_from_robots(bodies).collect()[0]
    assert "robots_allow" not in r4.asDict()
    r5 = politeness_from_robots(bodies, emit_allow=True).collect()[0]
    assert list(r5["robots_allow"]) == ["/public"]
    assert list(r5["robots_disallow"]) == ["/"]
    assert r5["crawl_delay_ms"] == 2000


def test_robots_refresh_states_and_rank(spark):
    from pholcus_spark import robots

    now = 10_000_000
    pending = spark.createDataFrame(
        [("miss", 5), ("fresh", 9), ("stale", 2), ("err-new", 1),
         ("err-old", 4), ("dead", 3)],
        "host string, n_pending long",
    )
    cache = spark.createDataFrame(
        [("fresh", now - 100, 200), ("stale", now - 5000, 404),
         ("err-new", now - 100, 503), ("err-old", now - 5000, 503),
         ("dead", now - 5000, 0),
         ("uncrawled", now - 1, 200)],  # cached but nothing pending
        "host string, fetched_at_ms long, status int",
    )
    out = {r["host"]: r for r in robots.robots_refresh(
        pending, cache, now_ms=now, ttl_ms=1000, error_ttl_ms=1000
    ).collect()}
    assert out["miss"]["state"] == "missing" and out["miss"]["do_fetch"]
    assert out["miss"]["age_ms"] is None
    assert out["fresh"]["state"] == "fresh" and not out["fresh"]["do_fetch"]
    assert out["stale"]["state"] == "stale" and out["stale"]["do_fetch"]
    assert out["err-new"]["state"] == "backoff"
    assert not out["err-new"]["do_fetch"]
    assert out["err-old"]["state"] == "retry"
    assert out["dead"]["state"] == "retry"  # transport error, aged out
    # cache rows without pending work produce no output
    assert "uncrawled" not in out
    # rank: state weight dominates, pending count breaks ties
    assert out["miss"]["fetch_rank"] == 3_000_005
    assert out["err-old"]["fetch_rank"] == 2_000_004
    assert out["stale"]["fetch_rank"] == 1_000_002
    assert out["fresh"]["fetch_rank"] == 9
