"""Charset transcode (D3) + HTML scalar helpers (P6).

Reference semantics: ``app/spider/context.go:678-736`` (charset sniff
+ UTF-8 conversion), ``app/spider/common/common.go:19-260`` (CleanHtml
family), ``common/util/util.go:43-56`` (JSONP→JSON)."""

import pytest

from pyspark.sql import functions as F

from pholcus_spark import charset, htmlops


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        ("utf8", "héllo wörld".encode("utf-8"), None),
        ("utf8_bom", "bom text".encode("utf-8-sig"), None),
        ("utf16le", b"\xff\xfe" + "wide".encode("utf-16-le"), None),
        ("gbk_meta",
         b'<html><head><meta charset="gb2312"></head><body>'
         + "中文内容".encode("gbk") + b"</body></html>", None),
        ("big5_declared", "繁體字".encode("big5"), "big5"),
        ("gbk_undeclared", "简体中文测试内容".encode("gbk"), None),
        ("ascii", b"plain ascii", None),
        ("latin1", "caf\xe9".encode("latin-1"), None),
    ]
    return spark.createDataFrame(
        rows, "name string, payload binary, declared string"
    )


def test_decode_text_charsets(spark, payloads):
    out = {
        r["name"]: (r["charset"], r["text"])
        for r in charset.decode_text(
            payloads, "payload", declared_col="declared"
        ).collect()
    }
    assert out["utf8"] == ("utf-8", "héllo wörld")
    assert out["utf8_bom"][0] == "utf-8-sig"
    assert out["utf8_bom"][1] == "bom text"
    assert out["utf16le"] == ("utf-16-le", "wide")
    assert out["gbk_meta"][0] == "gbk"
    assert "中文内容" in out["gbk_meta"][1]
    assert out["big5_declared"] == ("big5", "繁體字")
    # undeclared GBK: utf-8 strict fails, GBK fallback decodes
    assert out["gbk_undeclared"] == ("gbk", "简体中文测试内容")
    assert out["ascii"] == ("utf-8", "plain ascii")  # ascii is valid utf-8
    assert out["latin1"][1] == "café"


def test_sniff_charset_col_matches_python(spark, payloads):
    """The SQL-expressible detector core agrees with its own labels on
    BOM/ASCII cases (the oracle query's contract)."""
    got = {
        r["name"]: r["cs"]
        for r in payloads.select(
            "name", charset.sniff_charset_col(F.col("payload")).alias("cs")
        ).collect()
    }
    assert got["utf8_bom"] == "utf-8-sig"
    assert got["utf16le"] == "utf-16-le"
    assert got["ascii"] == "ascii"
    assert got["utf8"] == "other"  # non-ascii, no BOM → needs decode probing


def test_clean_html_and_article(spark):
    html = (
        '<html><head><script>if (a < b) { x(); }</script>'
        "<style>p{}</style></head><body><header>chrome</header>"
        "<!-- hidden --><h1>Title</h1>\n<p>Body &amp; &lt;text&gt;"
        "&nbsp;here</p><footer>foot</footer></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    row = df.select(
        htmlops.clean_html(F.col("html")).alias("clean"),
        htmlops.extract_article(F.col("html")).alias("article"),
    ).first()
    assert row["clean"] == "chrome Title Body & <text> here foot"
    assert row["article"] == "Title Body & <text> here"


def test_make_url_cases(spark):
    rows = [
        ("http://a.com/dir/page.html", "http://b.com/x", "http://b.com/x"),
        ("https://a.com/dir/page.html", "//cdn.com/y", "https://cdn.com/y"),
        ("http://a.com/dir/page.html", "/root.png", "http://a.com/root.png"),
        ("http://a.com/dir/page.html", "rel.html", "http://a.com/dir/rel.html"),
        ("http://a.com", "rel.html", "http://a.com/rel.html"),
    ]
    df = spark.createDataFrame(
        [(b, h) for b, h, _ in rows], "base string, href string"
    )
    got = [
        r["u"]
        for r in df.select(
            htmlops.make_url(F.col("base"), F.col("href")).alias("u")
        ).collect()
    ]
    assert got == [r[2] for r in rows]


def test_jsonp_and_unescape(spark):
    df = spark.createDataFrame(
        [('cb({"a": 1});', 'caf\\u00e9 \\u2603')],
        "jsonp string, esc string",
    )
    row = df.select(
        htmlops.jsonp_to_json(F.col("jsonp")).alias("j"),
        htmlops.unescape_unicode(F.col("esc")).alias("u"),
    ).first()
    assert row["j"] == '{"a": 1}'
    assert row["u"] == "café ☃"
    # non-JSONP passes through
    df2 = spark.createDataFrame([('{"plain": true}',)], "jsonp string")
    assert (
        df2.select(htmlops.jsonp_to_json(F.col("jsonp")).alias("j")).first()["j"]
        == '{"plain": true}'
    )
