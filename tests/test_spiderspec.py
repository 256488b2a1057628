"""Dynamic XML spider rules (P8) — envelope parse, declarative rule
compilation, JS rejection, and engine equivalence."""

import pytest

from pholcus_spark.spiderspec import load_spider_xml, to_crawl_config

XML = """
<Spider>
  <Name>xmlspider</Name>
  <Description>declarative demo</Description>
  <Pausetime>200</Pausetime>
  <EnableCookie>true</EnableCookie>
  <EnableKeyin>false</EnableKeyin>
  <Root>
    <Seed url="http://h000.example.com/page/00001"/>
    <Seed url="http://h001.example.com/page/00002"/>
  </Root>
  <Timers>
    <Timer id="nightly" bell="03:15:00" tolDays="2"/>
    <Timer id="pace" tolSeconds="0.5"/>
  </Timers>
  <Rule name="root">
    <Parse>dom</Parse>
    <Links rule="page" maxDepth="2" priority="0"/>
    <Form selector="form#login" rule="login" priority="1">
      <Input name="user" value="alice"/>
    </Form>
    <Timer id="pace"/>
  </Rule>
  <Rule name="page">
    <Parse>dom</Parse>
    <Downloader>chrome</Downloader>
  </Rule>
  <Rule name="login"/>
</Spider>
"""


def test_load_spider_xml_envelope_and_rules():
    spec = load_spider_xml(XML)
    assert spec.name == "xmlspider"
    assert spec.pausetime_ms == 200
    assert spec.enable_cookie and not spec.enable_keyin
    assert len(spec.seeds) == 2
    assert spec.timers == {
        "nightly": {"bell": (3, 15, 0), "tol_days": 2},
        "pace": {"tol_s": 0.5},
    }
    root = spec.rules[("xmlspider", "root")]
    assert root["parse"] == "dom"
    assert root["child_rule"] == "page" and root["max_depth"] == 2
    assert root["form"] == {
        "selector": "form#login", "rule": "login", "priority": 1,
        "inputs": {"user": "alice"},
    }
    assert root["timer"] == "pace"
    assert spec.rules[("xmlspider", "page")]["downloader"] == "chrome"
    assert ("xmlspider", "login") in spec.rules


def test_supported_js_parsefunc_compiles():
    js = (
        "<Spider><Name>js</Name><Rule name=\"root\">"
        "<ParseFunc><Script>ctx.JsAddQueue({URL: \"http://a/\"})"
        "</Script></ParseFunc></Rule></Spider>"
    )
    spec = load_spider_xml(js)
    assert spec.rules[("js", "root")]["js_parse"] is not None


def test_unsupported_js_still_rejected():
    """Genuinely unsupported JS constructs and undriven closures keep
    raising loudly at load time."""
    fn = (
        "<Spider><Name>js</Name><Rule name=\"root\">"
        "<ParseFunc><Script>var d = new Date();</Script></ParseFunc>"
        "</Rule></Spider>"
    )
    with pytest.raises(NotImplementedError, match="new"):
        load_spider_xml(fn)
    aid = (
        "<Spider><Name>js</Name><Rule name=\"root\">"
        "<AidFunc><Script>var x = 1;</Script></AidFunc>"
        "</Rule></Spider>"
    )
    with pytest.raises(NotImplementedError, match="AidFunc"):
        load_spider_xml(aid)
    ns = (
        "<Spider><Name>js</Name>"
        "<Namespace><Script>var n = \"x\";</Script></Namespace>"
        "<Rule name=\"root\"/></Spider>"
    )
    with pytest.raises(NotImplementedError, match="Namespace"):
        load_spider_xml(ns)
    # the reference's empty-Script envelope nodes are fine (the sample
    # ships empty Namespace/SubNamespace scripts, parsejs.go skips them)
    empty = (
        "<Spider><Name>js</Name>"
        "<Namespace><Script></Script></Namespace>"
        "<Rule name=\"root\"/></Spider>"
    )
    assert load_spider_xml(empty).name == "js"


def test_malformed_specs_rejected():
    with pytest.raises(ValueError, match="Name"):
        load_spider_xml("<Spider><Rule name='r'/></Spider>")
    with pytest.raises(ValueError, match="Rule"):
        load_spider_xml("<Spider><Name>x</Name></Spider>")
    with pytest.raises(ValueError, match="root"):
        load_spider_xml("<NotSpider/>")


def test_to_crawl_config_equals_hand_built():
    """Compiling the XML yields the exact CrawlConfig a Python caller
    would hand-build — so every fidelity guarantee proven for dict
    configs transfers to XML-defined spiders verbatim."""
    from pholcus_spark.oracle import CrawlConfig

    spec = load_spider_xml(XML)
    got = to_crawl_config(spec, n_hosts=8, batch_size=12, limit=50)
    exp = CrawlConfig(
        spider="xmlspider",
        rules={
            ("xmlspider", "root"): {
                "parse": "dom", "child_rule": "page", "max_depth": 2,
                "child_priority": 0,
                "form": {"selector": "form#login", "rule": "login",
                         "priority": 1, "inputs": {"user": "alice"}},
                "timer": "pace",
            },
            ("xmlspider", "page"): {
                "parse": "dom", "max_depth": 0, "downloader": "chrome",
            },
            ("xmlspider", "login"): {"max_depth": 0},
        },
        pausetime_ms=200,
        enable_cookie=True,
        timers={"nightly": {"bell": (3, 15, 0), "tol_days": 2},
                "pace": {"tol_s": 0.5}},
        n_hosts=8, batch_size=12, limit=50,
    )
    assert got == exp


def test_xml_spider_runs_in_engine(spark, tmp_store_dir):
    """An XML-defined spider is a complete runnable crawl definition:
    compile → run → matches the Matrix oracle under the same config."""
    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    xml = """
    <Spider>
      <Name>xmini</Name>
      <Rule name="root">
        <Parse>dom</Parse>
        <Links rule="page" maxDepth="1" priority="0"/>
      </Rule>
      <Rule name="page"/>
    </Spider>
    """
    cfg = to_crawl_config(
        load_spider_xml(xml), n_hosts=6, batch_size=10, limit=30
    )
    seeds = synthetic.seed_urls(5, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)
    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen


def test_misplaced_script_rejected():
    """Script content outside <ParseFunc><Script> is outside the
    reference schema (parsejs.go:52 reads only ParseFunc>Script) and
    used to load as a declarative no-op — the loader must refuse to
    half-run such a spider."""
    bare = (
        "<Spider><Name>x</Name>"
        "<Rule name=\"root\"><Script>ctx.Output({})</Script></Rule>"
        "</Spider>"
    )
    with pytest.raises(ValueError, match="ParseFunc"):
        load_spider_xml(bare)
    inline = (
        "<Spider><Name>x</Name>"
        "<Rule name=\"root\"><ParseFunc>ctx.Output({})</ParseFunc></Rule>"
        "</Spider>"
    )
    with pytest.raises(ValueError, match="Script"):
        load_spider_xml(inline)


def test_cli_runs_js_root_spider(spark, tmp_store_dir, capsys):
    """The CLI path for a <Root><Script> spider with no declarative
    <Seed>: __main__ must execute the Root script (per keyin) for its
    seeds and derive politeness policy for off-universe seed hosts —
    without either, the shipped dynamic sample 'runs' zero rounds
    silently."""
    import json
    import os

    from pholcus_spark.__main__ import main

    sample = "/root/reference/sample/dyn_rules/baidu_search.pholcus.xml"
    if not os.path.exists(sample):
        pytest.skip("reference sample not present")
    rc = main([
        "--store", tmp_store_dir,
        "--spider-xml", sample,
        "--keyins", "golang spark",
        "--n-hosts", "4",
        "--batch-size", "8",
        "--max-rounds", "3",
        "--snapshot-keep", "2",
        "--cores", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["visits"] > 0, "Root-script seeds must actually crawl"
    assert stats["rounds"] > 0
