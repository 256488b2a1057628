"""Sitemap parsing: urlset / sitemapindex, namespaces, malformed input."""

from __future__ import annotations

from pholcus_spark import sitemaps

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _parse(spark, body):
    df = spark.createDataFrame(
        [("h.test", "http://h.test/sitemap.xml", body)],
        ["host", "url", "body"],
    )
    return sitemaps.parse_sitemaps(df).collect()


def test_urlset_with_namespace_and_escaping(spark):
    body = (
        f'<?xml version="1.0"?><urlset {NS}>'
        "<url><loc>http://h.test/a?x=1&amp;y=2</loc>"
        "<lastmod>2024-05-01</lastmod><changefreq>daily</changefreq>"
        "<priority>0.8</priority></url>"
        "<url><loc>http://h.test/b</loc></url>"
        "</urlset>"
    )
    rows = sorted(_parse(spark, body), key=lambda r: r["loc"])
    assert [r["kind"] for r in rows] == ["url", "url"]
    assert rows[0]["loc"] == "http://h.test/a?x=1&y=2"  # entity unescaped
    assert rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] is None and rows[1]["priority"] is None


def test_sitemapindex_rows_are_kind_sitemap(spark):
    body = (
        f"<sitemapindex {NS}>"
        "<sitemap><loc>http://h.test/sm1.xml</loc>"
        "<lastmod>2024-01-01</lastmod></sitemap>"
        "<sitemap><loc>http://h.test/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = _parse(spark, body)
    assert {r["kind"] for r in rows} == {"sitemap"}
    assert {r["loc"] for r in rows} == {
        "http://h.test/sm1.xml",
        "http://h.test/sm2.xml",
    }


def test_malformed_and_irrelevant_inputs_drop(spark):
    assert _parse(spark, "<urlset><url><loc>u</loc>") == []  # truncated
    assert _parse(spark, "<html><body>404</body></html>") == []  # not a sitemap
    # entry without loc drops; bad priority becomes NULL, row survives
    body = (
        "<urlset><url><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>http://h.test/x</loc><priority>soon</priority></url>"
        "</urlset>"
    )
    rows = _parse(spark, body)
    assert len(rows) == 1
    assert rows[0]["loc"] == "http://h.test/x"
    assert rows[0]["priority"] is None


def test_entry_priority_scores_through_real_parser(spark):
    """XML → parse_sitemaps → entry_priority end-to-end: a fresh
    always-changing priority-1.0 page must outrank a stale never-
    changing priority-0.1 page; index rows (kind='sitemap') are
    excluded; absent tags take the protocol defaults."""
    from pholcus_spark.sitemaps import entry_priority, parse_sitemaps

    xml = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://a.test/hot</loc><lastmod>2025-01-14</lastmod>"
        "<changefreq>always</changefreq><priority>1.0</priority></url>"
        "<url><loc>http://a.test/cold</loc><lastmod>2020-01-01</lastmod>"
        "<changefreq>never</changefreq><priority>0.1</priority></url>"
        "<url><loc>http://a.test/bare</loc></url>"
        "</urlset>"
    )
    idx = (
        '<?xml version="1.0"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://a.test/child.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    fetched = spark.createDataFrame(
        [("a.test", "http://a.test/s.xml", xml),
         ("a.test", "http://a.test/i.xml", idx)],
        "host string, url string, body string",
    )
    out = {
        r["loc"]: r["priority_int"]
        for r in entry_priority(
            parse_sitemaps(fetched), now_date="2025-01-15"
        ).collect()
    }
    # hot: 10*10 + 6*2 + 4 = 116; cold: 1*10 + 0*2 + 0 = 10
    # bare: defaults -> 5*10 + 3*2 + 0 = 56
    assert out == {
        "http://a.test/hot": 116,
        "http://a.test/cold": 10,
        "http://a.test/bare": 56,
    }


def test_parse_feeds_rss_atom_and_malformed(spark):
    from pholcus_spark import sitemaps

    rss = """<rss version="2.0"><channel>
      <title>Chan</title>
      <item><title>A</title><link>http://s/a</link>
            <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
      <item><title>no link drops</title></item>
      <item><link>http://s/b</link></item>
    </channel></rss>"""
    atom = """<feed xmlns="http://www.w3.org/2005/Atom">
      <title>F</title>
      <entry><title>X</title>
        <link rel="self" href="http://self/x"/>
        <link href="http://s/x"/>
        <published>2024-01-01T00:00:00Z</published></entry>
      <entry><title>no alternate link drops</title>
        <link rel="self" href="http://self/y"/></entry>
    </feed>"""
    rows = [("http://s/rss.xml", rss), ("http://s/atom.xml", atom),
            ("http://s/broken.xml", "<rss><channel><item>"),
            ("http://s/notxml.xml", "hello world")]
    df = spark.createDataFrame(rows, "url string, body string")
    got = sitemaps.parse_feeds(df).collect()
    by = {(r["feed_url"], r["entry_url"]): r for r in got}
    assert len(got) == 3
    a = by[("http://s/rss.xml", "http://s/a")]
    assert a["fmt"] == "rss" and a["title"] == "A"
    assert a["published_raw"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    # title-less item kept (link is the requirement), link-less dropped
    assert by[("http://s/rss.xml", "http://s/b")]["title"] is None
    x = by[("http://s/atom.xml", "http://s/x")]
    # no-rel link counts as alternate; rel=self must not win
    assert x["fmt"] == "atom" and x["entry_url"] == "http://s/x"
    assert x["published_raw"] == "2024-01-01T00:00:00Z"


def test_parse_image_sitemaps_blocks_and_drops(spark):
    from pholcus_spark import sitemaps

    body = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
      xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
      <url><loc>http://s/a</loc>
        <image:image><image:loc>http://s/i1.jpg</image:loc>
          <image:caption>cap one</image:caption>
          <image:title>t1</image:title></image:image>
        <image:image><image:loc>http://s/i2.jpg</image:loc></image:image>
        <image:image><image:caption>no loc drops</image:caption>
          </image:image>
      </url>
      <url><loc>http://s/noimages</loc></url>
      <url><image:image><image:loc>http://s/orphan.jpg</image:loc>
        </image:image></url>
    </urlset>"""
    df = spark.createDataFrame([("s", body), ("bad", "<urlset><url>")],
                               "host string, body string")
    got = sitemaps.parse_image_sitemaps(df).collect()
    by = {r["img_url"]: r for r in got}
    assert len(got) == 2
    assert by["http://s/i1.jpg"]["caption"] == "cap one"
    assert by["http://s/i1.jpg"]["title"] == "t1"
    assert by["http://s/i1.jpg"]["page_url"] == "http://s/a"
    assert by["http://s/i2.jpg"]["caption"] is None
