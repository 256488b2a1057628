"""Dynamic spider rules from XML (P8) — rules as data, not code.

Reference behavior being reproduced: ``app/spider/parsejs.go:35-198``
loads ``<Spider>`` XML models at runtime — envelope fields (Name,
Description, Pausetime, EnableLimit, EnableKeyin, EnableCookie), a
``<Root>`` seed block and named ``<Rule>`` nodes — and compiles each
rule's ``<Script>`` body to an otto-VM JS closure.

Spark-first adaptation: a JS interpreter on the driver would be both
out of sandbox scope and the wrong execution model (per-page VM
dispatch serializes what the engine runs as one vectorized pass). The
rule BODIES are therefore declarative — the same selector-driven
primitives every engine rule already compiles to (the DOM engine,
form helper, downloader routing, timer gating):

    <Spider>
      <Name>imgspider</Name>
      <Pausetime>300</Pausetime>
      <EnableCookie>true</EnableCookie>
      <Root><Seed url="http://h000.example.com/page/00001"/></Root>
      <Timers><Timer id="nightly" bell="03:00:00" tolDays="1"/></Timers>
      <Rule name="root">
        <Parse>dom</Parse>
        <Links rule="page" maxDepth="2" priority="0"/>
        <Form selector="form#login" rule="login" priority="1">
          <Input name="user" value="alice"/>
        </Form>
        <Downloader>chrome</Downloader>
        <Timer id="nightly"/>
      </Rule>
      <Rule name="page"><Parse>dom</Parse></Rule>
    </Spider>

JS ``<Script>`` bodies (the reference's dynamic-rule form,
``parsejs.go:111-147``) are compiled by the repo's own minimal
interpreter (``jsrules.py``) — ``<Root><Script>`` runs per keyin to
produce the seed requests (``root_seeds``), and a Rule's
``<ParseFunc><Script>`` runs per fetched page inside the engine's
Arrow-batched fetch pass. Script bodies using constructs outside the
supported subset raise NotImplementedError at LOAD time — an honest
capability boundary, not silent misbehavior — as do ``<AidFunc>`` and
non-empty ``<Namespace>``/``<SubNamespace>`` scripts (nothing in the
engine drives them).

``load_spider_xml`` parses one model; ``to_crawl_config`` compiles it
to the engine's CrawlConfig, so an XML file is a complete runnable
crawl definition (the reference's ``RegisterDynamicSpiders`` analog).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from .jsrules import SeedCtx, compile_js, run_js
from .oracle import CrawlConfig

_SCRIPT_TAG_RE = re.compile(r"(<Script[^>]*>)(.*?)(</Script>)", re.S)


def wrap_script_cdata(xml_text: str) -> str:
    """Wrap ``<Script>`` bodies in CDATA so users can write ``<``/``&``
    in scripts without manual escaping — the reference does the same
    rewrite before unmarshalling (parsejs.go:155-176)."""

    def _wrap(m: re.Match) -> str:
        body = m.group(2)
        if body.strip().startswith("<![CDATA["):
            return m.group(0)
        return f"{m.group(1)}<![CDATA[{body}]]>{m.group(3)}"

    return _SCRIPT_TAG_RE.sub(_wrap, xml_text)


@dataclass
class SpiderSpec:
    name: str
    description: str = ""
    pausetime_ms: int = 300
    enable_limit: bool = False
    enable_keyin: bool = False
    enable_cookie: bool = False
    seeds: list[str] = field(default_factory=list)
    # (spider, rule) -> engine rule dict (crawler rules surface)
    rules: dict = field(default_factory=dict)
    # timer id -> {"tol_s": float} | {"bell": (h, m, s), "tol_days": int}
    timers: dict = field(default_factory=dict)
    # compiled <Root><Script> AST (None = declarative <Seed> roots)
    js_root: tuple | None = None


def _bool(text: str | None) -> bool:
    return (text or "").strip().lower() in ("true", "1", "yes")


def _script_body(elem: ET.Element | None) -> str | None:
    """The trimmed <Script> text of a container element (or the element
    itself), None when absent/empty — parsejs.go treats empty Script
    nodes as 'not defined' (doRegisterDynamicSpiders skips them)."""
    if elem is None:
        return None
    node = elem if elem.tag == "Script" else elem.find("Script")
    if node is None:
        return None
    body = (node.text or "").strip()
    return body or None


def _reject_js(elem: ET.Element, where: str, tags: tuple[str, ...]) -> None:
    """Raise on script-bearing elements the engine has no driver for
    (Namespace/SubNamespace naming closures, AidFunc aid maps)."""
    for tag in tags:
        if _script_body(elem.find(tag)) is not None:
            raise NotImplementedError(
                f"<{tag}> in {where}: no engine surface drives this "
                "closure (parsejs.go:82-110 naming / AidFunc) — "
                "out of scope"
            )


def _parse_rule(spider: str, rule_el: ET.Element) -> tuple[tuple[str, str], dict]:
    rname = rule_el.get("name")
    if not rname:
        raise ValueError("<Rule> requires a name attribute")
    _reject_js(rule_el, f"Rule {rname!r}", ("AidFunc",))
    # script content anywhere but <ParseFunc><Script> is outside the
    # reference schema (SpiderModle, parsejs.go:52: `ParseFunc>Script`)
    # and would otherwise load as a declarative no-op — reject loudly
    # so a spider the engine cannot run never half-runs
    if _script_body(rule_el) is not None:
        raise ValueError(
            f"Rule {rname!r}: <Script> must live inside <ParseFunc> "
            "(parsejs.go:52 schema)"
        )
    pf = rule_el.find("ParseFunc")
    if pf is not None and pf.find("Script") is None and (pf.text or "").strip():
        raise ValueError(
            f"Rule {rname!r}: <ParseFunc> carries inline text but no "
            "<Script> child — the reference schema (parsejs.go:52) "
            "reads only ParseFunc>Script, so this body would be dropped"
        )
    rc: dict = {}
    js = _script_body(pf)
    if js is not None:
        # dynamic rule: compile now (fail-loud at load on unsupported
        # JS), ship the plain-tuple AST in the broadcast rules map
        rc["js_parse"] = compile_js(js)
    parse = rule_el.findtext("Parse")
    if parse:
        rc["parse"] = parse.strip()
    links = rule_el.find("Links")
    if links is not None:
        rc["child_rule"] = links.get("rule", rname)
        rc["max_depth"] = int(links.get("maxDepth", "1"))
        rc["child_priority"] = int(links.get("priority", "0"))
    else:
        rc["max_depth"] = int(rule_el.get("maxDepth", "0"))
    form = rule_el.find("Form")
    if form is not None:
        fc: dict = {"selector": form.get("selector", "form")}
        if form.get("rule"):
            fc["rule"] = form.get("rule")
        fc["priority"] = int(form.get("priority", "0"))
        if form.get("button"):
            fc["button"] = form.get("button")
        inputs = {
            i.get("name"): i.get("value", "")
            for i in form.findall("Input")
            if i.get("name")
        }
        if inputs:
            fc["inputs"] = inputs
        rc["form"] = fc
        if rc.get("max_depth", 0) < 1:
            # the engine's depth gate would silently drop the submit
            # child — reject loudly at load time instead
            raise ValueError(
                f"Rule {rname!r}: <Form> requires maxDepth >= 1 "
                "(set maxDepth on <Links> or the <Rule>)"
            )
    downloader = rule_el.findtext("Downloader")
    if downloader:
        # the three reference routes (surfer/request.go:83-87):
        # 0=surf, 1=phantomjs, 2=chrome — accepted by name or id;
        # anything else is a loud load-time error, not a silent surf
        dl = downloader.strip().lower()
        names = {
            "surf": "surf", "0": "surf",
            "phantom": "phantom", "phantomjs": "phantom", "1": "phantom",
            "chrome": "chrome", "2": "chrome",
        }
        if dl not in names:
            raise ValueError(
                f"Rule {rname!r}: unknown <Downloader> {downloader!r} "
                "(want surf/phantom/chrome or 0/1/2)"
            )
        rc["downloader"] = names[dl]
    timer = rule_el.find("Timer")
    if timer is not None:
        rc["timer"] = timer.get("id")
    return (spider, rname), rc


def _parse_timer(t: ET.Element) -> tuple[str, dict]:
    tid = t.get("id")
    if not tid:
        raise ValueError("<Timer> requires an id attribute")
    bell = t.get("bell")
    if bell:
        h, m, s = (int(x) for x in bell.split(":"))
        return tid, {"bell": (h, m, s), "tol_days": int(t.get("tolDays", "1"))}
    tol_s = t.get("tolSeconds")
    if tol_s is None:
        # a countdown Timer without a duration would register a 0-tol
        # clock that Clock.new rejects, silently dropping rule pacing —
        # fail loudly like the rest of the loader
        raise ValueError(
            f"<Timer id={tid!r}> countdown mode requires tolSeconds"
        )
    return tid, {"tol_s": float(tol_s)}


def load_spider_xml(xml_text: str) -> SpiderSpec:
    """Parse one ``<Spider>`` model (SpiderModle envelope,
    parsejs.go:36-55, with declarative rule bodies)."""
    root = ET.fromstring(wrap_script_cdata(xml_text))
    if root.tag != "Spider":
        raise ValueError(f"expected <Spider> root, got <{root.tag}>")
    name = (root.findtext("Name") or "").strip()
    if not name:
        raise ValueError("<Spider> requires a <Name>")
    _reject_js(root, f"Spider {name!r}", ("Namespace", "SubNamespace"))
    spec = SpiderSpec(
        name=name,
        description=(root.findtext("Description") or "").strip(),
        pausetime_ms=int(root.findtext("Pausetime") or "300"),
        enable_limit=_bool(root.findtext("EnableLimit")),
        enable_keyin=_bool(root.findtext("EnableKeyin")),
        enable_cookie=_bool(root.findtext("EnableCookie")),
    )
    root_el = root.find("Root")
    if root_el is not None:
        spec.seeds = [
            s.get("url") for s in root_el.findall("Seed") if s.get("url")
        ]
        js = _script_body(root_el)
        if js is not None:
            spec.js_root = compile_js(js)
    timers_el = root.find("Timers")
    if timers_el is not None:
        spec.timers = dict(
            _parse_timer(t) for t in timers_el.findall("Timer")
        )
    for rule_el in root.findall("Rule"):
        key, rc = _parse_rule(name, rule_el)
        spec.rules[key] = rc
    if not spec.rules:
        raise ValueError(f"Spider {name!r} declares no <Rule> nodes")
    return spec


def root_seeds(spec: SpiderSpec, keyins: tuple | list = ()) -> list:
    """Run the spider's Root (RuleTree.Root fires once per spider
    instance to push the seed requests, parsejs.go:113-119): declarative
    ``<Seed>`` URLs pass through; a ``<Root><Script>`` executes per
    keyin with a SeedCtx, its JsAddQueue calls becoming keyin-scoped
    seed request dicts for ``CrawlEngine.bootstrap``."""
    seeds: list = list(spec.seeds)
    if spec.js_root is None:
        return seeds
    for k in (keyins or [None]):
        ctx = SeedCtx(keyin=k)
        run_js(spec.js_root, {"ctx": ctx})
        for q in ctx.queued:
            seed = {
                "url": q["url"],
                "rule": q["rule"],
                "priority": q["priority"],
                "method": q["method"] or "GET",
                "post_data": q["post_data"],
                "downloader": q["downloader"],
            }
            if q.get("try_times") is not None:
                # JsAddQueue TryTimes (request.go:48) rides the seed
                seed["try_times"] = q["try_times"]
            if k is not None:
                seed["keyin"] = k
            seeds.append(seed)
    return seeds


def to_crawl_config(spec: SpiderSpec, **overrides) -> CrawlConfig:
    """Compile a spec to the engine's CrawlConfig (the Spider.Register
    analog, parsejs.go:64-149). ``overrides`` pass through engine knobs
    the XML doesn't model (n_hosts, batch_size, limit, ...); explicit
    overrides win over spec fields."""
    kwargs: dict = {
        "spider": spec.name,
        "rules": dict(spec.rules),
        "pausetime_ms": spec.pausetime_ms,
        "enable_cookie": spec.enable_cookie,
        "timers": dict(spec.timers),
    }
    kwargs.update(overrides)
    return CrawlConfig(**kwargs)
