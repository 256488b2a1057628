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
