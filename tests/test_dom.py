"""Selector/DOM engine: unit tests for the CSS subset + end-to-end
crawl fidelity with a selector-driven rule (``parse: "dom"``), where
caption and child links are recovered from markup instead of taken from
the fetch result — equality with the oracle (which uses the direct
values) proves the extraction is lossless.

Reference contract: goquery document + Find()
(``app/spider/context.go:612-627``; consumer
``sample/static_rules/baidusearch/baidusearch.go:37-56``).
"""

from __future__ import annotations

import pytest

from pholcus_spark import synthetic
from pholcus_spark.dom import dom_first, dom_select, parse_html, select

from tests.helpers import url_seen_set, visits_log

HTML = """
<html><head><title>T1</title>
<script>var s = "<a href='/decoy-script' class='child'>x</a>";</script>
<style>a::before { content: "<a href='/decoy-style'>"; }</style>
</head>
<body>
<header><a href="/nav">nav</a></header>
<!-- <a class="child" href="/decoy-comment">c</a> -->
<div id="main" class="content wide">
  <h1 class="title">Hello <b>World</b>!</h1>
  <ul class="links">
    <li><a class="child" href="/c/1">one</a></li>
    <li><a class="child" href="/c/2">two</a></li>
    <li><a class="other" href="/c/3" rel="next">three</a></li>
  </ul>
</div>
<footer><a href="/about">about &amp; more</a></footer>
</body></html>
"""


def test_basic_selectors():
    assert dom_first(HTML, "title") == "T1"
    assert dom_first(HTML, "h1.title") == "Hello World !".replace(" !", "!")
    assert dom_select(HTML, "ul.links a.child", "attr:href") == ["/c/1", "/c/2"]
    assert dom_select(HTML, "div.content.wide h1", "text") == ["Hello World!"]
    assert dom_select(HTML, "[rel=next]", "attr:href") == ["/c/3"]
    assert dom_first(HTML, "#main", "attr:class") == "content wide"


def test_decoys_invisible_to_structural_parse():
    # links inside <script> text and comments are NOT nodes
    hrefs = dom_select(HTML, "a", "attr:href")
    assert hrefs == ["/nav", "/c/1", "/c/2", "/c/3", "/about"]
    assert dom_select(HTML, "a.child", "attr:href") == ["/c/1", "/c/2"]


def test_combinators_and_pseudos():
    assert dom_select(HTML, "ul.links > li > a", "attr:href") == [
        "/c/1", "/c/2", "/c/3",
    ]
    assert dom_select(HTML, "li:first-child a", "attr:href") == ["/c/1"]
    assert dom_select(HTML, "li:nth-child(2) a", "attr:href") == ["/c/2"]
    assert dom_select(HTML, "li:last-child a", "attr:href") == ["/c/3"]
    # body > a matches nothing (all links are nested deeper)
    assert dom_select(HTML, "body > a", "attr:href") == []


def test_union_document_order():
    got = dom_select(HTML, "h1, title", "text")
    assert got == ["T1", "Hello World!"]


def test_entities_and_inner_html():
    assert dom_first(HTML, "footer a") == "about & more"
    assert "<b>World</b>" in dom_first(HTML, "h1.title", "html")


def test_malformed_html_tolerated():
    bad = "<div><p>one<p>two</div><b>tail"
    assert dom_select(bad, "div p", "text") == ["one", "two"]
    assert dom_first(bad, "b") == "tail"
    # stray end tags ignored
    assert dom_first("</p><i>x</i></div>", "i") == "x"


def test_unsupported_selector_raises():
    with pytest.raises(ValueError):
        dom_select(HTML, "a ~ b")
    with pytest.raises(ValueError):
        dom_select(HTML, "a:hover")


def test_synthetic_page_roundtrip():
    """The selector recipe the DOM rule uses recovers exactly the
    caption + child links the synthetic boundary embedded."""
    url = "http://h003.example.com/page/123"
    page = synthetic.html_page_for(url, 0, 8)
    assert dom_first(page, "div#main h1#caption", "text") == \
        synthetic.caption_for(url)
    assert dom_select(page, "div#main ul.children a.child", "attr:href") == \
        synthetic.child_links(url, 0, 8)


def test_select_many_udf_single_parse(spark):
    from pyspark.sql import functions as F

    from pholcus_spark import dom

    df = spark.createDataFrame([(1, HTML), (2, None)], "id int, html string")
    extract = dom.select_many_udf(
        {"title": ("title", "text"), "hrefs": ("a.child", "attr:href")}
    )
    rows = {r["id"]: r for r in df.select(
        "id", extract(F.col("html")).alias("x")
    ).select("id", "x.title", "x.hrefs").collect()}
    assert rows[1]["title"] == ["T1"]
    assert rows[1]["hrefs"] == ["/c/1", "/c/2"]
    assert rows[2]["title"] is None and rows[2]["hrefs"] is None


def test_dom_rule_crawl_fidelity(spark, tmp_store_dir):
    """A spider whose rules parse HTML with CSS selectors reproduces
    the oracle's visit order, seen set, and captions exactly."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    rules = {
        ("domspider", "root"): {
            "child_rule": "page", "max_depth": 2, "child_priority": 0,
            "parse": "dom",
        },
        ("domspider", "page"): {
            "child_rule": "page", "max_depth": 2, "child_priority": 0,
            "parse": "dom",
        },
    }
    cfg = CrawlConfig(
        spider="domspider", rules=rules, n_hosts=10, batch_size=12, limit=80,
    )
    seeds = synthetic.seed_urls(8, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    # captions came through the DOM, not the fetch result
    by_img = {v["image_id"]: v["caption"] for v in orc.items.values()}
    got = eng.items_df().select("image_id", "caption").collect()
    assert len(got) == len(by_img)
    for r in got:
        assert r["caption"] == by_img[r["image_id"]]


def test_attribute_operator_selectors():
    """cascadia [a=v]/[a^=v]/[a$=v]/[a*=v] (goquery spiders use these
    for href filtering)."""
    html = (
        "<div>"
        '<a href="http://x.com/a.jpg">one</a>'
        '<a href="https://y.com/b.png">two</a>'
        '<a href="/rel/c.jpg">three</a>'
        "</div>"
    )
    root = parse_html(html)
    assert [n.text() for n in select(root, 'a[href^=http]')] == ["one", "two"]
    assert [n.text() for n in select(root, 'a[href$=".jpg"]')] == [
        "one", "three"]
    assert [n.text() for n in select(root, "a[href*=y.com]")] == ["two"]
    assert [n.text() for n in select(root, 'a[href="/rel/c.jpg"]')] == [
        "three"]
