"""JS <Script> rule bodies (P8 dynamic half): interpreter semantics,
goquery-subset selection, and the SHIPPED reference sample
(sample/dyn_rules/baidu_search.pholcus.xml) crawling end-to-end with
full visit-order / seen-set / Output fidelity vs the oracle."""

from __future__ import annotations

import os

import pytest

from pholcus_spark import synthetic
from pholcus_spark.jsrules import (
    UNDEF,
    JsError,
    JsParseCtx,
    SeedCtx,
    Selection,
    compile_js,
    run_js,
)
from pholcus_spark.spiderspec import (
    load_spider_xml,
    root_seeds,
    to_crawl_config,
    wrap_script_cdata,
)

SAMPLE_XML = "/root/reference/sample/dyn_rules/baidu_search.pholcus.xml"


# --- interpreter semantics ---


def _run(src: str, **hosts) -> dict:
    env = dict(hosts)
    sink: dict = {}

    class _Sink:
        pass

    env["emit"] = lambda k, v: sink.__setitem__(k, v)
    run_js(compile_js(src), env)
    return sink


def test_operators_and_control_flow():
    got = _run(
        """
        var total = 0, s = "";
        for (var i = 0; i < 10; i++) {
            if (i % 2 === 0) { continue; }
            if (i > 7) { break; }
            total += i;
        }
        var j = 0;
        while (j < 3) { j++; s = s + j; }
        emit("total", total);   // 1+3+5+7
        emit("s", s);
        emit("concat", "n=" + 5 + "!");
        emit("strict", 1 === 1 && "1" !== 1 && !("" === 0));
        emit("tern", 3 > 2 ? "yes" : "no");
        emit("or", "" || "fallback");
        emit("and", "x" && "y");
        emit("neg", -(2 * 3) + 1);
        """
    )
    assert got == {
        "total": 16, "s": "123", "concat": "n=5!", "strict": True,
        "tern": "yes", "or": "fallback", "and": "y", "neg": -5,
    }


def test_objects_arrays_and_builtins():
    got = _run(
        """
        var o = { a: 1, "b c": "two" };
        o.d = o.a + 1;
        o["e"] = [10, 20, 30];
        emit("d", o.d);
        emit("bc", o["b c"]);
        emit("e1", o.e[1]);
        emit("len", o.e.length);
        emit("slen", "abc".length);
        emit("enc", encodeURIComponent("a b/c&d=e"));
        emit("pi", parseInt("42"));
        emit("str", String(3.0));
        emit("missing", o.nope === undefined);
        """
    )
    assert got == {
        "d": 2, "bc": "two", "e1": 20, "len": 3, "slen": 3,
        "enc": "a%20b%2Fc%26d%3De", "pi": 42, "str": "3",
        "missing": True,
    }


def test_unsupported_constructs_raise_loudly():
    for bad in (
        "var d = new Date();",
        "let y = 1;",                # post-ES5: otto rejects these too
        "const z = 1;",
        "class C {}",
        "this.x = 1;",
        "switch (x) { case 1: break; }",
        "var has = 'k' in obj;",     # binary `in` (for-in IS supported)
    ):
        with pytest.raises(NotImplementedError):
            compile_js(bad)


def test_runtime_errors_are_js_errors():
    with pytest.raises(JsError, match="not defined"):
        run_js(compile_js("var x = nope + 1;"), {})
    with pytest.raises(JsError, match="step budget"):
        run_js(compile_js("for (;;) { var x = 1; }"), {})
    with pytest.raises(JsError, match="no method"):
        run_js(compile_js("ctx.Secrets()"), {"ctx": SeedCtx()})


def test_parse_int_js_prefix_semantics():
    """ECMA parseInt: prefix parsing, NaN on no-digits — a raw Python
    int() raised ValueError straight through the Spark task."""
    out = _run(
        "emit('px', parseInt('12px'));"
        "emit('empty', parseInt(''));"
        "emit('hex', parseInt('0x1A'));"
        "emit('neg', parseInt('-42abc'));"
        "emit('b16', parseInt('ff', 16));"
        "emit('f', parseFloat('3.5em'));"
    )
    assert out["px"] == 12
    assert out["empty"] != out["empty"]  # NaN
    assert out["hex"] == 26
    assert out["neg"] == -42
    assert out["b16"] == 255
    assert out["f"] == 3.5


def test_loose_equality_coerces():
    """== is JS abstract equality (null==undefined, number-vs-string),
    === stays strict — evaluating == as === silently took the wrong
    branch in real otto-targeted scripts."""
    out = _run(
        "emit('ns', 1 == '1');"
        "emit('nu', null == undefined);"
        "emit('strict', 1 === '1');"
        "emit('sn', '0' == 0);"
        "emit('ne', 2 != '2');"
        "emit('bool', true == 1);"
    )
    assert out["ns"] is True
    assert out["nu"] is True
    assert out["strict"] is False
    assert out["sn"] is True
    assert out["ne"] is False
    assert out["bool"] is True


def test_host_exceptions_contained_as_js_errors():
    class Boomer(SeedCtx):
        _js_methods = ("Boom",)

        def Boom(self):
            raise ValueError("kaput")

    with pytest.raises(JsError, match="ValueError: kaput"):
        run_js(compile_js("ctx.Boom();"), {"ctx": Boomer()})


def test_selection_goquery_subset():
    from pholcus_spark.dom import parse_html

    html = (
        "<div><ul>"
        '<li class="x" data-k="1">one</li>'
        '<li class="x" data-k="2">two</li>'
        '<li class="y">three</li>'
        "</ul><p>tail</p></div>"
    )
    root = parse_html(html)
    sel = Selection([root], root)
    xs = sel.Find("li.x")
    assert xs.Length() == 2
    assert xs.Eq(0).Text() == "one"
    assert xs.Eq(-1).Text() == "two"
    assert xs.Eq(5).Length() == 0
    assert xs.Last().AttrOr("data-k", "?") == "2"
    assert xs.First().Attr("data-k") == "1"
    assert sel.Find("p").Attr("data-k") is UNDEF
    assert sel.Find("li").Text() == "onetwothree"
    # Find from a non-root selection searches descendants only
    assert sel.Find("ul").Find("p").Length() == 0


# --- the shipped sample ---


@pytest.mark.skipif(
    not os.path.exists(SAMPLE_XML), reason="reference sample not present"
)
def test_shipped_sample_loads_and_roots():
    with open(SAMPLE_XML, encoding="utf-8") as f:
        spec = load_spider_xml(f.read())
    assert spec.name == "百度搜索采集动态规则"
    assert spec.pausetime_ms == 1000
    assert spec.enable_keyin and spec.enable_cookie
    assert spec.js_root is not None
    rc = spec.rules[(spec.name, "搜索结果")]
    assert rc["js_parse"] is not None
    seeds = root_seeds(spec, keyins=("golang spark",))
    assert seeds == [
        {
            "url": "https://www.baidu.com/s?wd=golang%20spark&pn=0",
            "rule": "搜索结果", "priority": 0, "method": "GET",
            "post_data": None, "downloader": "chrome",
            "keyin": "golang spark",
        }
    ]


@pytest.mark.skipif(
    not os.path.exists(SAMPLE_XML), reason="reference sample not present"
)
def test_shipped_sample_crawl_fidelity(spark, tmp_store_dir):
    """The reference's own dynamic spider runs UNMODIFIED: per-keyin
    Root seeds, per-page <Script> parse (Output + pagination
    JsAddQueue), visit order / seen set / Output cells all matching
    the oracle."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    with open(SAMPLE_XML, encoding="utf-8") as f:
        spec = load_spider_xml(f.read())
    keyins = ("golang spark", "vector db")
    cfg = to_crawl_config(
        spec,
        keyins=keyins,
        extra_hosts=(synthetic.SEARCH_HOST,),
        n_hosts=4,
        batch_size=8,
    )
    seeds = root_seeds(spec, keyins)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    assert orc.js_items  # the sample actually emitted result cells

    # Output cells: url_key -> ordered list of {标题/链接/摘要} maps
    got: dict[int, list[dict]] = {}
    for r in (
        eng.js_items_df()
        .orderBy("url_key", "cell_idx")
        .select("url_key", "fields")
        .collect()
    ):
        got.setdefault(r["url_key"], []).append(dict(r["fields"]))
    assert got == orc.js_items

    # and the cells hold exactly the synthetic page's non-empty results
    some_key, cells = next(iter(orc.js_items.items()))
    assert all(c["标题"] and c["链接"] for c in cells)


def test_wrap_script_cdata_idempotent():
    raw = "<Root><Script>var a = 1 < 2 && 3 > 0;</Script></Root>"
    wrapped = wrap_script_cdata(raw)
    assert "<![CDATA[" in wrapped
    assert wrap_script_cdata(wrapped) == wrapped


def test_nan_semantics():
    """Boolean(NaN) is false and every NaN relation is false (§7.2.13)
    — `parseInt('') <= maxPage` must not keep a pagination loop alive
    on garbage input."""
    got = _run(
        """
        var n = parseInt("");
        emit("truthy", n ? "t" : "f");
        emit("le", n <= 10);
        emit("ge", n >= 0);
        emit("lt", n < 1);
        emit("gt", n > -1);
        emit("eqself", n === n);
        emit("sane", parseInt("12px") <= 12);
        """
    )
    assert got == {
        "truthy": "f", "le": False, "ge": False, "lt": False,
        "gt": False, "eqself": False, "sane": True,
    }


def test_runtime_error_keeps_partial_parse(spark, tmp_store_dir):
    """A page script that emits then dies mid-run must not kill the
    crawl: the reference logs and keeps the partial parse
    (parsejs.go:126-130). Engine and oracle recover identically —
    visit order, seen set, and the Output cells emitted before the
    error all still match."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    js = compile_js(
        'ctx.Output({"t": ctx.GetDom().Find("title").Text()});'
        'var boom = ctx.GetTemp("missing").nope;'
    )
    cfg = CrawlConfig(
        rules={
            ("imgspider", "root"): {
                "child_rule": "root", "max_depth": 2,
                "child_priority": 0, "js_parse": js,
            },
        },
        n_hosts=4, batch_size=8, limit=24,
    )
    seeds = synthetic.seed_urls(6, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    assert orc.js_items  # the Output landed before the error
    got: dict[int, list[dict]] = {}
    for r in (
        eng.js_items_df()
        .orderBy("url_key", "cell_idx")
        .select("url_key", "fields")
        .collect()
    ):
        got.setdefault(r["url_key"], []).append(dict(r["fields"]))
    assert got == orc.js_items


def test_functions_closures_and_hoisting():
    got = _run(
        """
        emit("hoisted", add(2, 3));          // declaration is hoisted
        function add(a, b) { return a + b; }
        function counter() {
            var n = 0;
            return function () { n += 1; return n; };
        }
        var c = counter();
        c(); c();
        emit("closure", c());                 // 3: n lives in the closure
        var fact = function f(n) { return n <= 1 ? 1 : n * f(n - 1); };
        emit("fact", fact(5));                // named-expression recursion
        emit("missing_arg", (function (a, b) { return b === undefined; })(1));
        var shadow = "outer";
        (function () { var shadow = "inner"; })();
        emit("shadow", shadow);               // locals never leak out
        (function () { leak = "global"; })();
        emit("leak", leak);                   // undeclared assign = global
        emit("tf", typeof add);
        """
    )
    assert got == {
        "hoisted": 5, "closure": 3, "fact": 120, "missing_arg": True,
        "shadow": "outer", "leak": "global", "tf": "function",
    }


def test_typeof_forin_dowhile():
    got = _run(
        """
        emit("tundecl", typeof neverDeclared);   // no ReferenceError
        emit("tnum", typeof 3);
        emit("tstr", typeof "x");
        emit("tbool", typeof true);
        emit("tnull", typeof null);              // "object", faithfully
        emit("tundef", typeof undefined);
        emit("tobj", typeof {});
        var o = { a: 1, b: 2 }, ks = "", vs = 0;
        for (var k in o) { ks += k; vs += o[k]; }
        emit("keys", ks); emit("vals", vs);
        var arr = [10, 20], idx = "";
        for (var i in arr) { idx += i; }         // string indices
        emit("idx", idx);
        var n = 0;
        do { n += 1; } while (n < 3);
        emit("dowhile", n);
        var once = 0;
        do { once += 1; } while (false);         // body runs at least once
        emit("once", once);
        """
    )
    assert got == {
        "tundecl": "undefined", "tnum": "number", "tstr": "string",
        "tbool": "boolean", "tnull": "object", "tundef": "undefined",
        "tobj": "object", "keys": "ab", "vals": 3, "idx": "01",
        "dowhile": 3, "once": 1,
    }


def test_try_catch_finally_throw():
    got = _run(
        """
        var log = "";
        try { throw "boom"; } catch (e) { log += "c:" + e; }
        finally { log += "|f"; }
        emit("thrown", log);
        var r = "";
        try { var x = nope.field; } catch (e) { r = e.message; }
        emit("runtime_caught", r !== "");        // JsError -> Error object
        var cleanup = "";
        function risky() {
            try { return "ret"; } finally { cleanup = "ran"; }
        }
        emit("ret", risky());
        emit("cleanup", cleanup);                 // finally runs on return
        """
    )
    assert got["thrown"] == "c:boom|f"
    assert got["runtime_caught"] is True
    assert got == {**got, "ret": "ret", "cleanup": "ran"}


def test_uncaught_throw_and_budget_not_catchable():
    with pytest.raises(JsError, match="uncaught"):
        run_js(compile_js('throw "up";'), {})
    # the step budget must pierce try/catch or a runaway loop would
    # swallow its own kill
    with pytest.raises(JsError, match="step budget"):
        run_js(
            compile_js("try { while (true) { var i = 1; } } catch (e) {}"),
            {},
        )


def test_selection_each_and_map():
    from pholcus_spark.dom import parse_html

    doc = parse_html(
        "<ul><li class='x'>a</li><li class='x'>b</li><li>c</li></ul>"
    )
    sel = Selection([doc], doc)
    sink: dict = {}
    env = {
        "dom": sel,
        "emit": lambda k, v: sink.__setitem__(k, v),
    }
    run_js(
        compile_js(
            """
            var parts = [];
            dom.Find("li.x").Each(function (i, s) {
                parts[parts.length] = i + ":" + s.Text();
            });
            emit("each", parts[0] + "," + parts[1]);
            emit("map", dom.Find("li").Map(function (i, s) {
                return s.Text();
            }).length);
            """
        ),
        env,
    )
    assert sink == {"each": "0:a,1:b", "map": 3}


def test_string_and_array_methods():
    got = _run(
        """
        var u = "https://h.example.com/p?pn=30";
        emit("idx", u.indexOf("pn="));
        emit("sub", u.substring(u.indexOf("pn=") + 3));
        emit("split", u.split("?")[1]);
        emit("rep", "a-b-c".replace("-", "+"));   // first match only
        emit("lower", "AbC".toLowerCase());
        emit("upper", "AbC".toUpperCase());
        emit("trim", "  x  ".trim());
        emit("char", "abc".charAt(1));
        emit("slice", "abcdef".slice(1, 4));
        emit("neg", "abcdef".slice(-3));
        var a = [];
        a.push("x"); a.push("y", "z");
        emit("push_len", a.length);
        emit("join", a.join("|"));
        a[5] = "pad";                              // arrays grow, holes
        emit("grown", a.length);
        emit("hole_join", a.join(","));
        """
    )
    assert got == {
        "idx": 24, "sub": "30", "split": "pn=30", "rep": "a+b-c",
        "lower": "abc", "upper": "ABC", "trim": "x", "char": "b",
        "slice": "bcd", "neg": "def", "push_len": 3, "join": "x|y|z",
        "grown": 6, "hole_join": "x,y,z,,,pad",
    }


def test_widened_subset_crawl_fidelity(spark, tmp_store_dir):
    """A dynamic rule written with the widened subset — helper
    functions, Selection.Each callbacks, for-in, try/catch — crawls
    with full engine↔oracle fidelity (same interpreter on both sides,
    but this proves the engine plumbing carries the new value kinds)."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    js = compile_js(
        """
        function clean(s) { return s.trim(); }
        var cells = [];
        ctx.GetDom().Find("div#main ul.children a.child").Each(
            function (i, a) {
                cells.push({ href: a.AttrOr("href", ""), i: String(i) });
            }
        );
        for (var k in cells) { ctx.Output(cells[k]); }
        var cap = "";
        try { cap = clean(ctx.GetDom().Find("h1#caption").Text()); }
        catch (e) { cap = "err:" + e.message; }
        ctx.Output({ cap: cap });
        """
    )
    cfg = CrawlConfig(
        rules={
            ("imgspider", "root"): {
                "child_rule": "root", "max_depth": 2,
                "child_priority": 0, "js_parse": js,
            },
        },
        n_hosts=4, batch_size=8, limit=20,
    )
    seeds = synthetic.seed_urls(5, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    assert orc.js_items
    got: dict[int, list[dict]] = {}
    for r in (
        eng.js_items_df()
        .orderBy("url_key", "cell_idx")
        .select("url_key", "fields")
        .collect()
    ):
        got.setdefault(r["url_key"], []).append(dict(r["fields"]))
    assert got == orc.js_items
    # the Each callback actually fired somewhere (pages with children)
    assert any(
        "href" in c for cells in orc.js_items.values() for c in cells
    )


def test_ctx_accessor_surface():
    """The wider Context accessor set scripts can call under otto
    (context.go:304,561-578,631): GetURL spelling, GetText, GetMethod,
    GetHost, GetRuleName/GetName, SetTemp/GetTemps."""
    ctx = JsParseCtx(
        "<html><title>t</title></html>", "https://h1.example.com/p?x=1",
        keyin="k", temp={"seed": "v"}, method="POST", rule="page",
        spider="imgspider",
    )
    sink: dict = {}
    run_js(
        compile_js(
            """
            emit("url", ctx.GetURL());
            emit("same", ctx.GetURL() === ctx.GetUrl());
            emit("text_has_title", ctx.GetText().indexOf("<title>") >= 0);
            emit("method", ctx.GetMethod());
            emit("host", ctx.GetHost());
            emit("rule", ctx.GetRuleName());
            emit("name", ctx.GetName());
            ctx.SetTemp("n", 41);
            ctx.SetTemp("n", ctx.GetTemp("n", 0) + 1);
            emit("temp", ctx.GetTemp("n", 0));
            emit("temps_seed", ctx.GetTemps()["seed"]);
            """
        ),
        {"ctx": ctx, "emit": lambda k, v: sink.__setitem__(k, v)},
    )
    assert sink == {
        "url": "https://h1.example.com/p?x=1", "same": True,
        "text_has_title": True, "method": "POST", "host":
        "https://h1.example.com", "rule": "page", "name": "imgspider",
        "temp": 42, "temps_seed": "v",
    }


def test_math_and_number_builtins():
    got = _run(
        """
        emit("floor", Math.floor(3.7));
        emit("ceil", Math.ceil(3.2));
        emit("round_half", Math.round(2.5));
        emit("round_neg", Math.round(-2.5));    // JS: -2, not -3
        emit("abs", Math.abs(-4));
        emit("max", Math.max(1, 9, 4));
        emit("min", Math.min(1, 9, 4));
        emit("pow", Math.pow(2, 10));
        emit("sqrt", Math.sqrt(49));
        emit("num", Number("42"));
        emit("num_empty", Number(""));          // 0, unlike parseInt
        emit("nan", isNaN(Number("x")));
        emit("notnan", isNaN("12"));
        var pages = Math.ceil(95 / 10);
        emit("pages", pages);
        """
    )
    assert got == {
        "floor": 3, "ceil": 4, "round_half": 3, "round_neg": -2,
        "abs": 4, "max": 9, "min": 1, "pow": 1024, "sqrt": 7,
        "num": 42, "num_empty": 0, "nan": True, "notnan": False,
        "pages": 10,
    }


def test_ctx_log_surface(capsys):
    """ctx.Log().<level>() (context.go:428, logs.go:37-45) writes to
    stderr with Go-verb substitution instead of raising 'no method'."""
    ctx = JsParseCtx("<html></html>", "http://h/x")
    run_js(
        compile_js(
            'ctx.Log().Critical("task %v rule %v", ctx.GetURL(), "r1");'
            'ctx.Log().Error("plain");'
        ),
        {"ctx": ctx},
    )
    err = capsys.readouterr().err
    assert "[Critical] task http://h/x rule r1" in err
    assert "[Error] plain" in err


def test_index_edge_semantics():
    """Property-style and out-of-range indexing resolves like ES5
    instead of escaping as raw Python errors (uncatchable by script
    try/catch AND by the fetch pass's JsError containment)."""
    got = _run(
        """
        var a = [1, 2];
        var u;
        emit("strkey", a["foo"] === undefined);
        emit("undefkey", a[u] === undefined);
        emit("nullkey", a[null] === undefined);
        emit("fractional", a[0.5] === undefined);
        emit("numstr", a["1"]);                   // "1" IS an index
        emit("proplen", a["length"]);
        emit("neg", a[-1] === undefined);
        var caught = "";
        try { a["foo"] = 1; } catch (e) { caught = "set"; }
        emit("setcaught", caught);
        var big = "";
        try { a[99999999] = 1; } catch (e) { big = "capped"; }
        emit("bigcapped", big);
        emit("len_after", a.length);              // untouched by failures
        """
    )
    assert got == {
        "strkey": True, "undefkey": True, "nullkey": True,
        "fractional": True, "numstr": 2, "proplen": 2, "neg": True,
        "setcaught": "set", "bigcapped": "capped", "len_after": 2,
    }


def test_catch_binding_does_not_leak():
    got = _run(
        """
        var e = 5;
        try { throw 1; } catch (e) { emit("inside", e); }
        emit("after", e);                          // outer e untouched
        """
    )
    assert got == {"inside": 1, "after": 5}


def test_forin_skips_sparse_holes():
    got = _run(
        """
        var a = [];
        a[0] = "x"; a[3] = "y";
        var ks = "";
        for (var k in a) { ks += k; }
        emit("keys", ks);                          // holes 1,2 skipped
        emit("len", a.length);
        """
    )
    assert got == {"keys": "03", "len": 4}


def test_string_method_es5_edges():
    got = _run(
        """
        var u;
        emit("slice_undef_end", "abcdef".slice(2, u));
        emit("substr_undef_end", "abcdef".substring(2, u));
        emit("idx_neg_start", "abcdef".indexOf("a", -2));
        emit("split_limit", "a,b,c".split(",", 2).length);
        """
    )
    assert got == {
        "slice_undef_end": "cdef", "substr_undef_end": "cdef",
        "idx_neg_start": 0, "split_limit": 2,
    }


def test_log_positional_verbs(capsys):
    ctx = JsParseCtx("<html></html>", "http://h/x")
    run_js(
        compile_js('ctx.Log().Error("%d of %s", 1, "x");'), {"ctx": ctx}
    )
    assert "[Error] 1 of x" in capsys.readouterr().err


def test_bare_return_is_undefined():
    """A bare `return;` yields undefined, not null (otto: the empty
    return completion value is undefined)."""
    got = _run(
        """
        function f(x) { if (!x) return; return x; }
        var r = f("");
        emit("isUndef", r === undefined);
        emit("isNull", r === null);
        emit("t", typeof r);
        emit("kept", f("v"));
        """
    )
    assert got == {"isUndef": True, "isNull": False, "t": "undefined",
                   "kept": "v"}


def test_array_object_tostring_js_semantics():
    """String coercion of arrays/objects follows JS ToString — arrays
    join with commas (null/undefined elements become empty), objects
    stringify to [object Object] — so Output cells and concatenation
    match otto, not Python repr."""
    got = _run(
        """
        var a = ["a", "b", 3];
        emit("arr", "" + a);
        emit("nested", String([1, ["x", "y"], 2]));
        emit("holes", String([1, null, undefined, 2]));
        emit("obj", "" + {k: 1});
        emit("empty", String([]));
        """
    )
    assert got == {
        "arr": "a,b,3",
        "nested": "1,x,y,2",
        "holes": "1,,,2",
        "obj": "[object Object]",
        "empty": "",
    }


def test_jsaddqueue_trytimes_crawl_fidelity(spark, tmp_store_dir):
    """Per-request TryTimes (request.go:48) must bind the retry loop
    identically in engine and oracle: a child queued with TryTimes=1
    gets ONE fetch attempt even though cfg.try_times=3, so done/failed
    sets diverge if either side ignores the per-request budget."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    js = compile_js(
        """
        ctx.GetDom().Find("div#main ul.children a.child").Each(
            function (i, a) {
                ctx.JsAddQueue({
                    URL: a.AttrOr("href", ""),
                    Rule: "root",
                    TryTimes: 1
                });
            }
        );
        """
    )
    cfg = CrawlConfig(
        rules={
            ("imgspider", "root"): {
                "child_rule": None, "max_depth": 2,
                "child_priority": 0, "js_parse": js,
            },
        },
        n_hosts=5, batch_size=8, limit=40, failure_pct=45,
    )
    seeds = synthetic.seed_urls(8, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    # the budget must actually bind somewhere: with failure_pct=45 and
    # a single attempt, some child must fail that 3 tries would save
    assert orc.failed, "fixture should produce single-attempt failures"
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    resolved = eng.resolved_df().collect()
    done = {r["url_key"] for r in resolved if r["status"] == "done"}
    failed = {r["url_key"] for r in resolved if r["status"] == "failed"}
    assert done == orc.done
    assert failed == orc.failed


# --- regex literals (round-5 widening: VERDICT r4 #5) ---


def test_regex_literal_semantics():
    """The ES5 regex surface real otto spider scripts use:
    match (global and not), replace ($-expansion, callback, g flag),
    split by pattern, search, test, exec loops with lastIndex."""
    got = _run(
        r"""
        var m = "price: 42 usd".match(/(\d+)\s*usd/);
        emit("group", m ? m[1] : null);
        emit("mglobal", "a1b2c3".match(/\d/g).join("-"));
        emit("mnull", "no digits".match(/\d+/));
        emit("repg", "Hello World".replace(/o/g, "0"));
        emit("swap", "john smith".replace(/(\w+) (\w+)/, "$2 $1"));
        emit("rep1", "aaa".replace(/a/, "b"));
        emit("repfn", "CamelCase".replace(/([A-Z])/g,
             function (c) { return "_" + c.toLowerCase(); }));
        emit("splitre", "x=1&y=2".split(/[&=]/).join(","));
        emit("search", "abc".search(/b/));
        emit("test", /^https?:/.test("https://x.example.com"));
        emit("iflag", "ABC".match(/abc/i)[0]);
        emit("classslash", "a/b".match(/[/]/) ? "slash" : "none");
        var re = /(\d+)/g, total = 0, mm;
        while ((mm = re.exec("1 22 333")) != null) {
            total += mm[1].length;
        }
        emit("execloop", total);
        emit("division", 10 / 2 / 5);
        emit("tostr", "" + /ab/gi);
        emit("typeof", typeof /x/);
        emit("src", /a(b)/.source);
        emit("glob", /a/g.global);
        """
    )
    assert got == {
        "group": "42", "mglobal": "1-2-3", "mnull": None,
        "repg": "Hell0 W0rld", "swap": "smith john", "rep1": "baa",
        "repfn": "_camel_case", "splitre": "x,1,y,2", "search": 1,
        "test": True, "iflag": "ABC", "classslash": "slash",
        "execloop": 6, "division": 1.0, "tostr": "/ab/gi",
        "typeof": "object", "src": "a(b)", "glob": True,
    }


def test_regex_outside_subset_raises_loudly():
    """Inconvertible regex syntax/flags fail at COMPILE time, not as a
    silent wrong parse mid-crawl."""
    for bad in (
        "var r = /a(/;",        # malformed pattern
        "var r = /abc/y;",      # sticky flag
        "var r = /a/u;",        # unicode flag
    ):
        with pytest.raises(NotImplementedError):
            compile_js(bad)


def test_regex_rule_crawl_fidelity(spark, tmp_store_dir):
    """A dynamic rule that leans on regex extraction — the next-most-
    common otto idiom after the shipped sample's selector calls
    (parsejs.go scripts freely use otto's regex) — crawls with full
    engine<->oracle fidelity: visit order, URL-seen set, and the
    regex-derived Output fields all match."""
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig, run_oracle
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set, visits_log
    from tests.test_crawl_fidelity import _sorted_oracle_visits

    js = compile_js(
        r"""
        var html = ctx.GetText();
        var ids = html.match(/child[-_](\d+)/g);
        ctx.Output({
            n_child_refs: ids ? String(ids.length) : "0",
            host: ctx.GetUrl().replace(/^https?:\/\//, "")
                              .replace(/\/.*$/, ""),
            page: (ctx.GetUrl().match(/p[-\/](\d+)/) || ["", "?"])[1]
        });
        """
    )
    cfg = CrawlConfig(
        rules={
            ("imgspider", "root"): {
                "child_rule": "root", "max_depth": 2,
                "child_priority": 0, "js_parse": js,
            },
        },
        n_hosts=4, batch_size=8, limit=20,
    )
    seeds = synthetic.seed_urls(5, cfg.n_hosts)
    orc = run_oracle(seeds, cfg)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(seeds)

    assert visits_log(eng) == _sorted_oracle_visits(orc)
    assert url_seen_set(eng) == orc.url_seen
    assert orc.js_items
    got: dict[int, list[dict]] = {}
    for r in (
        eng.js_items_df()
        .orderBy("url_key", "cell_idx")
        .select("url_key", "fields")
        .collect()
    ):
        got.setdefault(r["url_key"], []).append(dict(r["fields"]))
    assert got == orc.js_items
    # the regex actually extracted a host on every page
    assert all(
        c.get("host", "").endswith(".example.com")
        for cells in orc.js_items.values()
        for c in cells
        if "host" in c
    )
