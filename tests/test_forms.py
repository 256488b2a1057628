"""Form helper (P9) — serialization/submit semantics vs form.go, plus
end-to-end crawl fidelity for a form-submitting spider rule."""

import pytest

from pholcus_spark import forms, synthetic


def test_serialize_form_reference_quirks():
    """serializeForm (form.go:145-169): no-type inputs skipped,
    textarea included with its value ATTR (body ignored), type=submit
    rows become buttons, multi-valued names accumulate."""
    html = (
        '<form action="/a"><input type="text" name="a" value="1"/>'
        '<input name="skipme" value="x"/>'
        "<textarea name=\"t\">body text</textarea>"
        '<input type="checkbox" name="a" value="2"/>'
        '<button type="submit" name="go" value="ok">Go</button>'
        '<input type="text" value="noname"/></form>'
    )
    form = forms.select(forms.parse_html(html), "form")[0]
    fields, buttons = forms.serialize_form(form)
    assert fields == [("a", "1"), ("t", ""), ("a", "2")]
    assert buttons == [("go", "ok")]


def test_form_attributes_and_make_url():
    """formAttributes + MakeUrl (form.go:171-180, common.go:178-195):
    relative actions root at '/', absolute pass through, missing action
    falls back to the page URL, missing method defaults GET."""
    page = "http://x.example.com/dir/page.html"

    def attrs(form_html):
        f = forms.select(forms.parse_html(form_html), "form")[0]
        return forms.form_attributes(page, f)

    assert attrs('<form action="login"></form>') == (
        "GET", "http://x.example.com/login")
    assert attrs('<form method="Post" action="/l"></form>') == (
        "POST", "http://x.example.com/l")
    assert attrs('<form action="https://o.example.com/x"></form>') == (
        "GET", "https://o.example.com/x")
    assert attrs("<form></form>") == ("GET", page)


def test_submit_form_branches():
    """send() (form.go:104-140): GET query append; POST body; POST-M on
    multipart enctype; Click on a named button; Click on a missing
    button fails; Input overrides only existing fields; keys sort."""
    html = (
        '<form method="get" action="search">'
        '<input type="text" name="q" value="a b"/>'
        '<input type="submit" name="s1" value="v1"/>'
        '<input type="submit" name="s2" value="v2"/></form>'
    )
    page = "http://x.example.com/dir/page"
    assert forms.submit_form(html, page) == {
        "url": "http://x.example.com/search?q=a+b&s1=v1",
        "method": "GET", "post_data": None,
    }
    assert forms.submit_form(html, page, button="s2")["url"].endswith(
        "search?q=a+b&s2=v2")
    assert forms.submit_form(html, page, button="nope") is None
    assert forms.submit_form(html, page, inputs={"q": "zz", "new": "x"})[
        "url"
    ].endswith("search?q=zz&s1=v1")
    post = forms.submit_form(
        '<form method="post" action="/l"><input type="text" name="b" value="2"/>'
        '<input type="hidden" name="a" value="1"/></form>',
        page,
    )
    assert post == {"url": "http://x.example.com/l", "method": "POST",
                    "post_data": "a=1&b=2"}
    multi = forms.submit_form(
        '<form method="post" enctype="multipart/form-data" action="/up">'
        '<input type="file" name="f" value="z"/></form>',
        page,
    )
    assert multi["method"] == "POST-M" and multi["post_data"] == "f=z"
    assert forms.submit_form("<p>no form</p>", page) is None
    # clicked button uses Set semantics: a field sharing the button's
    # name is REPLACED, not encoded alongside (form.go:104-140)
    clash = forms.submit_form(
        '<form method="get" action="s">'
        '<input type="hidden" name="go" value="field"/>'
        '<input type="text" name="q" value="1"/>'
        '<input type="submit" name="go" value="btn"/></form>',
        page,
    )
    assert clash["url"].endswith("s?go=btn&q=1")


def test_login_form_parse_matches_direct_construction():
    """The DOM-scraped submit of every synthetic login page equals the
    direct string construction the oracle uses (login_form_request) —
    the losslessness contract the crawl fidelity test then exercises
    end-to-end."""
    n = 0
    for i in range(120):
        url = f"http://h{i % 9:03d}.example.com/page/{i:05d}"
        host = url.split("://")[1].split("/")[0]
        page = synthetic.html_page_for(url, 0, 9)
        got = forms.submit_form(page, url, "form#login", {"user": "alice"})
        if not synthetic.page_has_login_form(url):
            assert got is None
            continue
        assert got == synthetic.login_form_request(url, host, {"user": "alice"})
        n += 1
    assert n >= 10


def test_form_rule_crawl_fidelity(spark, tmp_store_dir):
    """A spider rule that scrapes + submits the login form enqueues the
    POST child the oracle predicts without parsing: visit order, seen
    set, and POST bodies all match (content is keyed by post_data, so a
    wrong body would break caption parity too)."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    rules = {
        ("formspider", "root"): {
            "child_rule": "page", "max_depth": 2, "child_priority": 0,
            "parse": "dom",
            "form": {"selector": "form#login", "rule": "login",
                     "priority": 1, "inputs": {"user": "alice"}},
        },
        ("formspider", "page"): {"child_rule": None, "max_depth": 2},
        ("formspider", "login"): {"child_rule": None, "max_depth": 2},
    }
    cfg = CrawlConfig(
        spider="formspider", rules=rules, n_hosts=8, batch_size=12, limit=70,
    )
    seeds = synthetic.seed_urls(10, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen

    posts = eng.fetched_df().filter("rule = 'login'").collect()
    assert posts, "fixture must exercise the form path"
    for r in posts:
        exp = synthetic.login_form_request(
            r["parent_url"], r["host"], {"user": "alice"}
        )
        assert r["method"] == "POST"
        assert r["url"] == exp["url"]
        assert r["post_data"] == exp["post_data"]

    # caption parity (content_key folds post_data in for POST)
    by_img = {v["image_id"]: v["caption"] for v in orc.items.values()}
    got = eng.items_df().select("image_id", "caption").collect()
    assert len(got) == len(by_img)
    for r in got:
        assert r["caption"] == by_img[r["image_id"]]
