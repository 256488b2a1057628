"""Harvest extractors: image+caption pairs and anchor-text rollups
out of raw HTML, all-codegen (harvest.py)."""

from __future__ import annotations

from pholcus_spark import harvest

PAGE = """
<html><head>
<script>var t = '<img src="/js.png" alt="decoy inside script body">';
var u = '<a href="/js">script link</a>';</script>
<style>.x { background: url('/css.png'); }</style>
</head><body>
<!-- <img src="/c.png" alt="commented out entirely"> <a href="/c">c</a> -->
<img src="/a.jpg" alt="a fine caption" width="800" height="600">
<IMG SRC='/b.jpg' ALT='single quoted caption' width='10'>
<img src="/t.jpg" title="title fallback caption">
<img src="/both.jpg" alt="alt wins over title" title="loser title">
<img src="data:image/gif;base64,R0l" alt="data uri must drop">
<img src="/px.gif" alt="tracking pixel drops" width="1" height="1">
<img src="/noalt.png">
<img src="/short.png" alt="tiny">
<img alt="no src at all">
<a href="/rel">relative link</a>
<a href="http://other.example.com/x"><b>nested</b>   markup
   flattens</a>
<a href="/empty"></a>
<a name="anchor-only">not a link</a>
</body></html>
"""


def _rows(spark, html=PAGE, url="http://h.example.com/dir/page.html"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def test_image_caption_harvest_filters_and_absolutizes(spark):
    got = {
        r["img_url"]: r
        for r in harvest.harvest_image_captions(_rows(spark)).collect()
    }
    assert set(got) == {
        "http://h.example.com/a.jpg",
        "http://h.example.com/b.jpg",
        "http://h.example.com/t.jpg",
        "http://h.example.com/both.jpg",
    }
    a = got["http://h.example.com/a.jpg"]
    assert (a["caption"], a["width"], a["height"]) == ("a fine caption", 800, 600)
    b = got["http://h.example.com/b.jpg"]  # single-quoted attrs, upper tag
    assert (b["caption"], b["width"], b["height"]) == (
        "single quoted caption", 10, None)
    assert got["http://h.example.com/t.jpg"]["caption"] == "title fallback caption"
    assert got["http://h.example.com/both.jpg"]["caption"] == "alt wins over title"
    assert all(r["page_url"] == "http://h.example.com/dir/page.html"
               for r in got.values())


def test_anchor_harvest_flattens_and_drops_decoys(spark):
    got = {r["target_url"]: r["anchor"]
           for r in harvest.harvest_anchors(_rows(spark)).collect()}
    assert got == {
        "http://h.example.com/rel": "relative link",
        "http://other.example.com/x": "nested markup flattens",
    }


def test_anchor_graph_rollup(spark):
    pages = spark.createDataFrame(
        [
            ("http://s1.example.com/p1",
             '<a href="http://t.example.com/d">good doc</a>'
             '<a href="http://t.example.com/d">good doc</a>'),
            ("http://s2.example.com/p2",
             '<a href="http://t.example.com/d">a bad doc</a>'),
        ],
        "url string, html string",
    )
    [r] = harvest.anchor_graph(pages).collect()
    assert r["target_url"] == "http://t.example.com/d"
    assert r["n_inlinks"] == 3
    assert r["n_sources"] == 2
    assert r["n_anchors"] == 2
    assert r["first_anchor"] == "a bad doc"


def test_min_caption_chars_knob(spark):
    html = '<img src="/x.png" alt="okay">'
    assert harvest.harvest_image_captions(_rows(spark, html)).count() == 0
    got = harvest.harvest_image_captions(
        _rows(spark, html), min_caption_chars=4).collect()
    assert [r["caption"] for r in got] == ["okay"]


CANON_PAGES = [
    # first canonical link wins over both the second link and og:url
    ("http://h.example.com/a?utm=x",
     '<head><meta property="og:url" content="http://h.example.com/og-loser">'
     '<link rel="canonical" href="http://h.example.com/a">'
     '<link rel="canonical" href="http://h.example.com/second-loser">'
     "</head>"),
    # mixed-case multi-token rel, single quotes, relative href
    ("http://h.example.com/dir/b.html",
     "<link rel='Canonical alternate' href='/a'>"),
    # og:url fallback when no canonical link exists
    ("http://m.example.com/c",
     '<link rel="stylesheet" href="/style.css">'
     '<meta name="og:url" content="http://h.example.com/a">'),
    # decoys only -> self-canonical
    ("http://h.example.com/self",
     '<script>var x = \'<link rel="canonical" href="/js-decoy">\';</script>'
     '<!-- <link rel="canonical" href="/comment-decoy"> -->'
     '<meta name="description" content="not a canonical">'
     '<link rel="alternate" href="/feed.xml">'
     '<link rel="canonical">'),  # hrefless canonical must not crash
]


def test_canonical_priority_and_absolutize(spark):
    df = spark.createDataFrame(CANON_PAGES, "url string, html string")
    got = {r["page_url"]: (r["canonical_url"], r["source"])
           for r in harvest.harvest_canonicals(df).collect()}
    assert got == {
        "http://h.example.com/a?utm=x": ("http://h.example.com/a", "link"),
        "http://h.example.com/dir/b.html": ("http://h.example.com/a", "link"),
        "http://m.example.com/c": ("http://h.example.com/a", "og"),
        "http://h.example.com/self": ("http://h.example.com/self", "self"),
    }


def test_canonical_collapse_groups_and_representative(spark):
    df = spark.createDataFrame(CANON_PAGES, "url string, html string")
    rows = {r["canonical_url"]: r for r in harvest.canonical_collapse(
        harvest.harvest_canonicals(df)).collect()}
    g = rows["http://h.example.com/a"]
    assert g["n_aliases"] == 3
    # no alias IS the canonical page -> the alias with the minimal
    # 60-bit md5-prefix key (round-5 hash election: fixed-width agg
    # buffers -> HashAggregate; deterministic and engine/oracle
    # identical, replacing the round-4 string-min SortAggregate)
    import hashlib

    aliases = [  # the three pages whose canonical resolves to /a
        "http://h.example.com/a?utm=x",
        "http://h.example.com/dir/b.html",
        "http://m.example.com/c",
    ]
    expect = min(
        aliases, key=lambda u: int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
    )
    assert g["representative"] == expect
    assert not g["has_canonical_page"]
    s = rows["http://h.example.com/self"]
    assert (s["n_aliases"], s["representative"], s["has_canonical_page"]) \
        == (1, "http://h.example.com/self", True)
    # when the canonical page itself was crawled it beats the
    # hash election
    df2 = spark.createDataFrame(
        CANON_PAGES + [("http://h.example.com/a",
                        '<link rel="canonical" href="/a">')],
        "url string, html string")
    g2 = {r["canonical_url"]: r for r in harvest.canonical_collapse(
        harvest.harvest_canonicals(df2)).collect()}["http://h.example.com/a"]
    assert g2["representative"] == "http://h.example.com/a"
    assert g2["has_canonical_page"] and g2["n_aliases"] == 4


def test_canonical_extraction_is_zero_exchange(spark):
    df = spark.createDataFrame(CANON_PAGES, "url string, html string")
    plan = harvest.harvest_canonicals(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


ROBOTS_PAGES = [
    # none == noindex + nofollow; directives UNION across tags
    ("http://h.example.com/none",
     '<meta name="robots" content="none">'
     '<a href="/x">a link that must not be followed</a>'),
    ("http://h.example.com/multi",
     '<meta name="robots" content="noarchive">'
     "<meta name='robots' content='NOINDEX'>"
     '<a href="/y">still followable: page is only noindex</a>'),
    ("http://h.example.com/clean",
     '<meta name="description" content="nofollow noindex">'  # wrong tag
     '<!-- <meta name="robots" content="none"> -->'           # comment
     '<a href="/ok">kept</a>'
     '<a href="/nf" rel="nofollow">dropped by rel</a>'
     "<a href='/ugc' rel='external UGC'>dropped by ugc token</a>"
     '<a href="/spon" rel="sponsored">dropped sponsored</a>'),
]


def test_robots_meta_union_and_decoys(spark):
    df = spark.createDataFrame(ROBOTS_PAGES, "url string, html string")
    got = {r["page_url"]: (r["noindex"], r["nofollow"])
           for r in harvest.robots_meta(df).collect()}
    assert got == {
        "http://h.example.com/none": (True, True),
        "http://h.example.com/multi": (True, False),
        "http://h.example.com/clean": (False, False),
    }


def test_followable_links_gating(spark):
    df = spark.createDataFrame(ROBOTS_PAGES, "url string, html string")
    got = {(r["page_url"], r["target_url"])
           for r in harvest.followable_links(df).collect()}
    assert got == {
        ("http://h.example.com/multi", "http://h.example.com/y"),
        ("http://h.example.com/clean", "http://h.example.com/ok"),
    }


def test_followable_links_single_pass(spark):
    """The page-level nofollow flag must ride the anchor explode's own
    projection — one scan, no self-join, no Exchange."""
    df = spark.createDataFrame(ROBOTS_PAGES, "url string, html string")
    plan = harvest.followable_links(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_whole_plan_is_codegen(spark):
    """The harvest plan must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes; the exact rollup pays the standard
    two-Exchange Expand for its two exact distincts, the approx
    (HyperLogLog) variant exactly one Exchange, and the flat
    extraction none at all."""
    exact = harvest.anchor_graph(_rows(spark))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in exact
    assert exact.count("Exchange") == 2
    approx = harvest.anchor_graph(_rows(spark), approx=True)._jdf.queryExecution().executedPlan().toString()
    assert approx.count("Exchange") == 1
    assert "Expand" not in approx
    flat = harvest.harvest_image_captions(_rows(spark))
    fplan = flat._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in fplan
    assert "Exchange" not in fplan


def test_caption_flags_edge_cases(spark):
    from pholcus_spark.textops import caption_flags, caption_keep
    from pyspark.sql import functions as F

    cases = [
        ("IMG_1234.JPG", False),          # camera filename
        ("IMG 1234", False),              # filename without extension
        ("screenshot-42.png", False),     # other camera/file prefix
        ("imgres query result page", True),   # prefix alone isn't junk
        ("https://x.example.com/a?b=1", False),  # bare URL
        ("see https://x.example.com for info", True),  # URL inside text
        ("12345 - 67890!", False),        # digits/punct dominate
        ("Photo of 12 red apples", True), # digits fine when text leads
        ("getty images watermark", False),
        ("a" * 513, False),               # too long
        ("four", False),                  # under min_chars=5
        ("fives", True),                  # exactly min_chars
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "caption string")
    got = df.select(
        "caption", caption_keep(F.col("caption")).alias("keep")).collect()
    want = dict(cases)
    for r in got:
        assert r["keep"] == want[r["caption"]], r["caption"]


def test_srcset_best_rules(spark):
    from pyspark.sql import functions as F

    cases = [
        # widths rank by value, order-independent
        ('<img srcset="/a.jpg 320w, /b.jpg 1280w, /c.jpg 640w">', "/b.jpg"),
        # any width beats any density
        ('<img srcset="/w.jpg 800w, /d.jpg 3x">', "/w.jpg"),
        # densities rank by multiplier; missing descriptor = 1x
        ('<img srcset="/x.jpg 2x, /y.jpg">', "/x.jpg"),
        ('<img srcset="/p.jpg, /q.jpg 1.5x">', "/q.jpg"),
        # ties keep the first candidate
        ('<img srcset="/first.jpg 2x, /second.jpg 2x">', "/first.jpg"),
        # no srcset at all
        ('<img src="/plain.jpg">', None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "tag string")
    got = dict(
        df.select("tag", harvest.srcset_best(F.col("tag")).alias("u"))
        .collect()
    )
    for tag, want in cases:
        assert got[tag] == want, tag


def test_harvest_prefers_srcset_when_asked(spark):
    html = ('<img src="/thumb.jpg" srcset="/big.jpg 1200w, /mid.jpg 600w"'
            ' alt="a proper caption">')
    plain = harvest.harvest_image_captions(_rows(spark, html)).collect()
    assert [r["img_url"] for r in plain] == ["http://h.example.com/thumb.jpg"]
    pref = harvest.harvest_image_captions(
        _rows(spark, html), prefer_srcset=True).collect()
    assert [r["img_url"] for r in pref] == ["http://h.example.com/big.jpg"]


def test_caption_consolidate_election(spark):
    """Kept beats junk regardless of length; longer kept beats shorter;
    exact score ties elect the lexicographically greatest caption —
    deterministic across reruns and input order."""
    rows = [
        # key 1: junk URL (long) must lose to a short kept caption
        (1, "http://example.com/a-very-long-junk-url-caption-here"),
        (1, "a red bicycle"),
        # key 2: two kept captions, longer wins
        (2, "a cat"),
        (2, "a cat sitting on a warm windowsill"),
        # key 3: exact tie (same length, both kept) -> lexicographic max
        (3, "photo of a dog"),
        (3, "photo of a cow"),
        # key 4: junk only -> still elects, score < 1000
        (4, "!!! ??? ***"),
    ]
    pairs = spark.createDataFrame(rows, ["img_key", "caption"])
    out = {
        r["img_key"]: r
        for r in harvest.caption_consolidate(pairs, key_col="img_key").collect()
    }
    assert out[1]["caption"] == "a red bicycle"
    assert out[1]["score"] >= 1000
    assert out[2]["caption"] == "a cat sitting on a warm windowsill"
    assert out[3]["caption"] == "photo of a dog"
    assert out[4]["score"] < 1000
    assert out[1]["n_pairs"] == 2 and out[1]["n_captions"] == 2
    # reversed input order elects the same winners
    rev = spark.createDataFrame(list(reversed(rows)), ["img_key", "caption"])
    out2 = {
        r["img_key"]: r["caption"]
        for r in harvest.caption_consolidate(rev, key_col="img_key").collect()
    }
    assert out2 == {k: r["caption"] for k, r in out.items()}


def test_caption_consolidate_plans(spark):
    """Exact n_captions pays the standard two-Exchange Expand; the
    approx (HyperLogLog) variant keeps the single-Exchange
    map-side-partial plan — the 10^10-pairs mode."""
    pairs = spark.createDataFrame(
        [(1, "a"), (1, "b")], ["img_key", "caption"])
    exact = harvest.caption_consolidate(pairs, key_col="img_key") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in exact
    assert exact.count("Exchange") == 2
    approx = harvest.caption_consolidate(
        pairs, key_col="img_key", approx=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert approx.count("Exchange") == 1
    assert "Expand" not in approx


def test_main_text_gates_and_strip(spark):
    """Edge cases beyond the oracle fixture: attribute-laden <p>,
    nested markup flattening, all-link block, empty page, and the
    nav-inside-body strip."""
    from pholcus_spark import harvest

    pages = spark.createDataFrame(
        [
            # nested markup flattens; class attr on <p> fine
            ("u1", "<p class='x'>Some <b>bold</b> prose that easily "
                   "clears the thirty character bar</p>"),
            # a block that is ONLY a link: dropped by density
            ("u2", "<p><a href='/y'>entirely link text long enough to "
                   "pass the length gate</a></p>"),
            # nav stripped even with attributes; nothing left
            ("u3", "<nav id='n'><p>Long navigation paragraph that "
                   "would otherwise pass the gate</p></nav>"),
            ("u4", ""),
        ],
        ["url", "html"],
    )
    got = {r["url"]: r for r in harvest.main_text(pages).collect()}
    assert got["u1"]["main_text"] == (
        "Some bold prose that easily clears the thirty character bar"
    )
    assert got["u1"]["n_kept"] == 1
    assert got["u2"]["n_blocks"] == 1 and got["u2"]["n_kept"] == 0
    assert got["u3"]["n_blocks"] == 0
    assert got["u4"]["main_text"] == "" and got["u4"]["n_blocks"] == 0


def test_meta_images_priorities_and_decoys(spark):
    """og:image beats an earlier twitter:image (key priority over
    document order); within og:image the FIRST tag wins; commented /
    script-quoted / content-less tags never match; caption priority
    og:image:alt > twitter:image:alt > og:title > og:description;
    relative content absolutizes; cardless pages drop."""
    from pholcus_spark.harvest import meta_images

    rows = [
        ("http://a.test/1",
         '<meta name="twitter:image" content="http://t.test/1.jpg">'
         '<meta property="og:image" content="/rel/1.jpg">'
         '<meta property="og:image" content="http://late.test/x.jpg">'
         '<meta property="og:description" content="d1">'
         '<meta property="og:title" content="t1">'),
        ("http://a.test/2",
         '<!-- <meta property="og:image" content="http://c.decoy/x"> -->'
         "<script>'<meta property=\"og:image\" content=\"http://s.decoy/x\">'"
         "</script>"
         '<meta property="og:image">'
         '<meta name="twitter:image:src" content="http://t.test/2.jpg">'
         '<meta name="twitter:image:alt" content="twalt2">'
         '<meta property="og:image:alt" content="ogalt2">'),
        ("http://a.test/3", "<p>no cards at all</p>"),
    ]
    got = {r["page_url"]: r for r in meta_images(
        spark.createDataFrame(rows, "url string, html string")).collect()}
    assert set(got) == {"http://a.test/1", "http://a.test/2"}
    r1 = got["http://a.test/1"]
    # og wins over the earlier twitter tag; first og wins; relative
    # path absolutized against the page; og:title beats og:description
    assert r1["img_url"] == "http://a.test/rel/1.jpg"
    assert r1["img_source"] == "og"
    assert (r1["caption"], r1["caption_source"]) == ("t1", "og:title")
    r2 = got["http://a.test/2"]
    assert r2["img_url"] == "http://t.test/2.jpg"
    assert r2["img_source"] == "twitter"
    assert (r2["caption"], r2["caption_source"]) == (
        "ogalt2", "og:image:alt")


def test_picture_pairs_cross_source_election(spark):
    """<picture> election: width descriptors beat density across
    sources; densities rank by multiplier; img-srcset then src
    fallbacks; title caption fallback; short captions and
    picture-less pages drop."""
    from pholcus_spark.harvest import picture_pairs

    rows = [
        ("http://a.test/1",
         '<picture><source srcset="/s-320.jpg 320w, /s-640.jpg 640w">'
         '<source srcset="/s.webp 9x">'
         '<img src="/fb.jpg" alt="caption one ok"></picture>'),
        ("http://a.test/2",
         '<picture><img srcset="/i-1.jpg 1x, /i-3.jpg 3x" src="/i.jpg"'
         ' title="caption two ok"></picture>'),
        ("http://a.test/3",
         '<picture><img src="/p.jpg" alt="ok"></picture>'),
        ("http://a.test/4", "<p>none</p>"),
    ]
    got = {r["page_url"]: r for r in picture_pairs(
        spark.createDataFrame(rows, "url string, html string")).collect()}
    assert set(got) == {"http://a.test/1", "http://a.test/2"}
    r1 = got["http://a.test/1"]
    assert r1["img_url"] == "http://a.test/s-640.jpg"  # 640w beats 9x
    assert r1["n_sources"] == 2
    r2 = got["http://a.test/2"]
    assert r2["img_url"] == "http://a.test/i-3.jpg"
    assert r2["caption"] == "caption two ok"


def test_jsonld_images_types_decoys_and_multiblock(spark):
    """JSON-LD harvest: only @type ImageObject blocks match; a
    commented-out script never matches; two valid blocks on one page
    yield two rows; caption > name > description priority; relative
    contentUrl absolutizes."""
    from pholcus_spark.harvest import jsonld_images

    rows = [
        ("http://a.test/1",
         '<script type="application/ld+json">{"@type": "ImageObject",'
         ' "contentUrl": "/i1.jpg", "caption": "cap one",'
         ' "name": "decoy name"}</script>'
         '<script type="application/ld+json">{"@type": "ImageObject",'
         ' "contentUrl": "http://c.test/i1b.jpg",'
         ' "description": "desc 1b ok"}</script>'),
        ("http://a.test/2",
         '<!-- <script type="application/ld+json">{"@type":'
         ' "ImageObject", "contentUrl": "/no.jpg", "caption":'
         ' "commented caption"}</script> -->'
         '<script type="application/ld+json">{"@type": "NewsArticle",'
         ' "contentUrl": "/art.jpg", "caption": "wrong type"}</script>'),
    ]
    got = jsonld_images(
        spark.createDataFrame(rows, "url string, html string")
    ).collect()
    by_url = {r["img_url"]: r for r in got}
    assert set(by_url) == {"http://a.test/i1.jpg", "http://c.test/i1b.jpg"}
    r1 = by_url["http://a.test/i1.jpg"]
    assert (r1["caption"], r1["caption_source"]) == ("cap one", "caption")
    r2 = by_url["http://c.test/i1b.jpg"]
    assert (r2["caption"], r2["caption_source"]) == (
        "desc 1b ok", "description")


def test_all_image_pairs_union_and_election(spark):
    """The four surfaces union into one frame; a URL harvested by two
    surfaces keeps the richest source (img > picture > card >
    jsonld); a picture contributes both its elected URL and its inner
    fallback img."""
    from pholcus_spark.harvest import all_image_pairs

    html = (
        '<img src="/x.jpg" alt="inline caption one">'
        '<picture><source srcset="/p-640.jpg 640w">'
        '<img src="/pf.jpg" alt="pic caption"></picture>'
        '<meta property="og:image" content="/x.jpg">'
        '<meta property="og:title" content="og title text">'
        '<script type="application/ld+json">{"@type": "ImageObject",'
        ' "contentUrl": "/ld.jpg", "caption": "ld caption"}</script>'
    )
    got = {r["img_url"]: r for r in all_image_pairs(
        spark.createDataFrame([("http://a.test/1", html)],
                              "url string, html string")).collect()}
    assert set(got) == {
        "http://a.test/x.jpg", "http://a.test/p-640.jpg",
        "http://a.test/pf.jpg", "http://a.test/ld.jpg",
    }
    x = got["http://a.test/x.jpg"]  # img beats card on the collision
    assert (x["caption"], x["pair_source"]) == (
        "inline caption one", "img")
    assert got["http://a.test/p-640.jpg"]["pair_source"] == "picture"
    assert got["http://a.test/ld.jpg"]["pair_source"] == "jsonld"


def test_caption_spam_normalization_and_threshold(spark):
    # 4 images share one caption under case/whitespace variants, one
    # sits exactly AT the threshold (not spam), one above it (spam),
    # one unique.
    rows = [(f"i{j}", c) for j, c in enumerate(
        ["Stock Photo", "  stock   photo ", "STOCK PHOTO", "stock photo",
         "at bar", "at bar", "at bar",
         "unique caption here"]
    )]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    got = {r["image_id"]: r for r in
           harvest.caption_spam(df, max_images=3).collect()}
    # the four spellings normalize to ONE fingerprint
    assert len({got[f"i{j}"]["caption_fp"] for j in range(4)}) == 1
    assert got["i0"]["n_images"] == 4 and got["i0"]["is_spam"]
    # n_images == max_images is NOT spam (strict >)
    assert got["i4"]["n_images"] == 3 and not got["i4"]["is_spam"]
    assert got["i7"]["n_images"] == 1 and not got["i7"]["is_spam"]


def test_caption_spam_counts_distinct_images_not_rows(spark):
    # the same (image, caption) row appearing twice (re-crawl) must
    # not inflate the distinct-image count past the threshold
    rows = [("a", "repeat me"), ("a", "repeat me"), ("b", "repeat me")]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = harvest.caption_spam(df, max_images=2).collect()
    assert all(r["n_images"] == 2 and not r["is_spam"] for r in out)


def test_harvest_tables_structure_and_decoys(spark):
    html = """
    <html><body>
    <script>var t = '<table><tr><td>js decoy</td></tr></table>';</script>
    <!-- <table><tr><td>comment decoy</td></tr></table> -->
    <table id="first">
      <tr><th>Name</th><th>Qty</th></tr>
      <tr><td><a href="/x"><b>widget</b></a></td><td> 3 </td></tr>
      <tr><td>gadget
          spanning lines</td><td>7</td></tr>
    </table>
    <TABLE><TR><TD>upper case</TD></TR></TABLE>
    </body></html>
    """
    df = spark.createDataFrame([("http://x/p", html)],
                               "url string, html string")
    got = harvest.harvest_tables(df).collect()
    by = {(r["table_idx"], r["row_idx"]): r for r in got}
    assert len(got) == 4  # 3 rows in table 0, 1 row in table 1
    assert by[(0, 0)]["is_header"] and by[(0, 0)]["cells"] == ["Name", "Qty"]
    # nested markup flattens, whitespace collapses, cells trim
    assert by[(0, 1)]["cells"] == ["widget", "3"]
    assert not by[(0, 1)]["is_header"]
    assert by[(0, 2)]["cells"] == ["gadget spanning lines", "7"]
    assert by[(1, 0)]["cells"] == ["upper case"]
    assert all(r["n_cells"] == len(r["cells"]) for r in got)
