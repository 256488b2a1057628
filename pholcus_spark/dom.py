"""Selector/DOM extraction — the structured-parse surface (D4) that
real spider rules consume.

Reference behavior being reproduced: the lazily-built goquery document
(``app/spider/context.go:612-627``, ``:663-675``) that every static
rule's ParseFunc queries with CSS selectors — e.g.
``sample/static_rules/baidusearch/baidusearch.go:37-56`` does
``ctx.GetDom().Find("div.result h3 a")`` then ``.Text()`` /
``.Attr("href")``. This module provides the same
select-then-extract contract without any external library: stdlib
``html.parser`` builds a lightweight node tree, and a compiled CSS
subset walks it.

Supported selector subset (covers the reference samples' usage):
- type / universal:        ``div``, ``*``
- id / class / attribute:  ``#main``, ``.result``, ``[href]``,
                           ``[rel=next]``
- compound:                ``a.link[href]``
- combinators:             descendant (space), child (``>``)
- unions:                  ``h1, h2``
- position pseudos:        ``:first-child``, ``:last-child``,
                           ``:nth-child(k)`` (1-based)

Extraction modes: ``text`` (descendant text, script/style excluded,
whitespace collapsed — goquery ``.Text()`` analog), ``attr:<name>``
(``.Attr``), ``html`` (inner HTML, ``.Html()``).

Spark surface & scale: parsing a specific document is inherently
per-document work (the reference parses per page too), so the plan-side
API is an Arrow-batched pandas UDF — one Python round-trip per COLUMN
BATCH, never a row-at-a-time PythonUDF node; each document is parsed
once even when several selectors extract from it
(``select_many_udf``). Cost is O(|html|) per doc and embarrassingly
parallel — the operator scales like the fetch UDF itself.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_NO_TEXT = frozenset(("script", "style"))


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "texts")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list[Node] = []
        self.parent = parent
        self.texts: list[tuple[int, str]] = []  # (position-in-children, raw text)

    # --- extraction ---

    def text(self) -> str:
        return re.sub(r"\s+", " ", "".join(self._iter_text())).strip()

    def _iter_text(self):
        # interleave text chunks with child subtrees in document order
        by_pos: dict[int, list[str]] = {}
        for pos, t in self.texts:
            by_pos.setdefault(pos, []).append(t)
        for i in range(len(self.children) + 1):
            for t in by_pos.get(i, ()):
                yield t
            if i < len(self.children):
                c = self.children[i]
                if c.tag not in _NO_TEXT:
                    yield from c._iter_text()

    def inner_html(self) -> str:
        by_pos: dict[int, list[str]] = {}
        for pos, t in self.texts:
            by_pos.setdefault(pos, []).append(t)
        out = []
        for i in range(len(self.children) + 1):
            out.extend(by_pos.get(i, ()))
            if i < len(self.children):
                out.append(self.children[i]._outer_html())
        return "".join(out)

    def _outer_html(self) -> str:
        attrs = "".join(
            f' {k}="{v}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            return f"<{self.tag}{attrs}/>"
        return f"<{self.tag}{attrs}>{self.inner_html()}</{self.tag}>"

    def walk(self):
        """All descendant element nodes, document order."""
        for c in self.children:
            yield c
            yield from c.walk()


class _TreeBuilder(HTMLParser):
    """Tolerant tree builder: void elements never push, stray end tags
    are ignored, unclosed tags are implicitly closed when an enclosing
    tag ends (the stack pops to the match). script/style contents stay
    raw text (HTMLParser CDATA mode), so markup inside them never
    becomes nodes — a regex extractor's classic failure."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    _IMPLIED_CLOSE = frozenset(
        "p li dt dd option tr td th".split()
    )  # tags that cannot nest in themselves: <p>a<p>b are siblings

    def handle_starttag(self, tag, attrs):
        if tag in self._IMPLIED_CLOSE and self.stack[-1].tag == tag:
            self.stack.pop()
        node = Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, attrs, parent=self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        top = self.stack[-1]
        top.texts.append((len(top.children), data))


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    b.close()
    return b.root


# --- CSS selector subset ---

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[#.][\w-]+|\[[^\]]+\]|:[\w-]+(?:\([^)]*\))?)*)$"
)
_PART_RE = re.compile(r"([#.][\w-]+|\[[^\]]+\]|:[\w-]+(?:\([^)]*\))?)")


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self, token: str):
        m = _SIMPLE_RE.match(token)
        if not m or (not m.group("tag") and not m.group("rest")):
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.id = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        self.pseudos: list[tuple[str, int | None]] = []
        for part in _PART_RE.findall(m.group("rest") or ""):
            if part.startswith("#"):
                self.id = part[1:]
            elif part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("["):
                body = part[1:-1]
                if "=" in body:
                    k, v = body.split("=", 1)
                    # cascadia operators goquery spiders lean on:
                    # [a=v] exact, [a^=v] prefix, [a$=v] suffix,
                    # [a*=v] substring
                    op = "="
                    if k and k[-1] in "^$*":
                        op, k = k[-1] + "=", k[:-1]
                    self.attrs.append(
                        (k.strip(), (op, v.strip().strip("'\"")))
                    )
                else:
                    self.attrs.append((body.strip(), None))
            else:  # :pseudo
                name, _, arg = part[1:].partition("(")
                arg = arg.rstrip(")")
                if name == "first-child":
                    self.pseudos.append(("nth", 1))
                elif name == "last-child":
                    self.pseudos.append(("last", None))
                elif name == "nth-child":
                    self.pseudos.append(("nth", int(arg)))
                else:
                    raise ValueError(f"unsupported pseudo-class :{name}")

    def matches(self, node: Node) -> bool:
        if node.tag.startswith("#"):
            return False
        if self.tag and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            cls = (node.attrs.get("class") or "").split()
            if any(c not in cls for c in self.classes):
                return False
        for k, v in self.attrs:
            if k not in node.attrs:
                return False
            if v is not None:
                op, want = v
                got = node.attrs.get(k) or ""
                if op == "=" and got != want:
                    return False
                if op == "^=" and not got.startswith(want):
                    return False
                if op == "$=" and not got.endswith(want):
                    return False
                if op == "*=" and want not in got:
                    return False
        for kind, arg in self.pseudos:
            siblings = node.parent.children if node.parent else [node]
            idx = siblings.index(node)
            if kind == "nth" and idx + 1 != arg:
                return False
            if kind == "last" and idx != len(siblings) - 1:
                return False
        return True


def _compile_one(selector: str) -> list[tuple[str, _Simple]]:
    """One complex selector → [(combinator, simple)]; combinator is
    ' ' (descendant) or '>' (child); the first entry's combinator is
    ' ' relative to the root."""
    tokens = re.findall(r">|[^\s>]+", selector.strip())
    out: list[tuple[str, _Simple]] = []
    comb = " "
    for tok in tokens:
        if tok == ">":
            comb = ">"
            continue
        out.append((comb, _Simple(tok)))
        comb = " "
    if not out:
        raise ValueError(f"empty selector: {selector!r}")
    return out


def compile_selector(css: str) -> list[list[tuple[str, _Simple]]]:
    return [_compile_one(s) for s in css.split(",") if s.strip()]


def _match_complex(root: Node, chain: list[tuple[str, _Simple]]) -> list[Node]:
    current = [root]
    for comb, simple in chain:
        nxt: list[Node] = []
        seen_ids = set()
        for base in current:
            pool = base.children if comb == ">" else base.walk()
            for n in pool:
                if id(n) not in seen_ids and simple.matches(n):
                    seen_ids.add(id(n))
                    nxt.append(n)
        current = nxt
        if not current:
            break
    return current


def select(root: Node, css: str) -> list[Node]:
    """All nodes matching the selector list, document order, deduped."""
    found: list[Node] = []
    seen = set()
    chains = compile_selector(css)
    for chain in chains:
        for n in _match_complex(root, chain):
            if id(n) not in seen:
                seen.add(id(n))
                found.append(n)
    if len(chains) > 1:
        # re-establish document order across union branches
        order = {id(n): i for i, n in enumerate(root.walk())}
        found.sort(key=lambda n: order.get(id(n), -1))
    return found


def _extract(node: Node, mode: str) -> str | None:
    if mode == "text":
        return node.text()
    if mode == "html":
        return node.inner_html()
    if mode.startswith("attr:"):
        return node.attrs.get(mode[5:])
    raise ValueError(f"unknown extract mode {mode!r} (text|html|attr:<name>)")


def dom_select(html: str, css: str, extract: str = "text") -> list[str]:
    """Parse + select + extract; attr misses are dropped (goquery
    ``.Attr`` second-return false analog)."""
    out = []
    for n in select(parse_html(html), css):
        v = _extract(n, extract)
        if v is not None:
            out.append(v)
    return out


def dom_first(html: str, css: str, extract: str = "text") -> str | None:
    vals = dom_select(html, css, extract)
    return vals[0] if vals else None


# --- Spark surface (Arrow-batched) ---


def select_udf(css: str, extract: str = "text"):
    """pandas_udf: html column → array<string> of extracted values."""
    compile_selector(css)  # fail fast on driver for bad selectors

    @F.pandas_udf("array<string>")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda h: dom_select(h, css, extract) if h is not None else None
        )

    return _f


def select_many_udf(specs: dict[str, tuple[str, str]]):
    """One parse per document, many extractions: ``specs`` maps output
    field → (css, extract mode). Returns a pandas_udf producing a
    struct of array<string> fields — use when a rule extracts several
    fields from the same page (the common ParseFunc shape), so the
    HTML is parsed once, not once per field."""
    for css, _mode in specs.values():
        compile_selector(css)
    fields = ", ".join(f"`{k}`: array<string>" for k in specs)

    @F.pandas_udf(f"struct<{fields}>")
    def _f(s: pd.Series) -> pd.DataFrame:
        rows = []
        for h in s:
            if h is None:
                rows.append({k: None for k in specs})
                continue
            root = parse_html(h)
            row = {}
            for k, (css, mode) in specs.items():
                vals = []
                for n in select(root, css):
                    v = _extract(n, mode)
                    if v is not None:
                        vals.append(v)
                row[k] = vals
            rows.append(row)
        return pd.DataFrame(rows, columns=list(specs))

    return _f


def select_col(html_col: Column, css: str, extract: str = "text") -> Column:
    """Column-expression sugar: ``select_col(F.col("html"), "h1", "text")``."""
    return select_udf(css, extract)(html_col)
