"""HTML scalar helpers — the P6 surface as pure column expressions
(reference ``app/spider/common/common.go:19-260`` CleanHtml /
ExtractArticle and ``common/util/util.go:43-56`` JSONP→JSON, plus the
``MakeUrl``/href-absolutization family from ``context.go:141-207``).

Everything here is a Catalyst expression (regexp/string ops — JVM-side,
whole-stage codegen, embarrassingly parallel, no UDF), so the helpers
cost the same as any projection at 100 TB and every one has an exact
ANSI-SQL twin for the DuckDB oracle. Regex subset chosen to mean the
same thing in Java regex and RE2: no backreferences, ``(?s)`` inline
flags only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# block-level containers whose content ExtractArticle discards
_CHROME_TAGS = ("header", "footer", "nav", "aside")

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last — avoids double-unescaping &amp;lt;
]


def clean_html(col: Column) -> Column:
    """Strip scripts/styles/comments/tags, unescape the common
    entities, collapse whitespace (CleanHtml depth-5 behavior,
    common.go:19-60)."""
    c = F.regexp_replace(col, r"(?s)<script[^>]*>.*?</script>", "")
    c = F.regexp_replace(c, r"(?s)<style[^>]*>.*?</style>", "")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def extract_article(col: Column) -> Column:
    """Simplified ExtractArticle (common.go:62-120): drop page-chrome
    containers (header/footer/nav/aside) before the full clean, so the
    result is the body text."""
    c = col
    for tag in _CHROME_TAGS:
        c = F.regexp_replace(c, rf"(?s)<{tag}[^>]*>.*?</{tag}>", "")
    return clean_html(c)


def make_url(base: Column, href: Column) -> Column:
    """Absolutize ``href`` against ``base`` (MakeUrl /
    context.go:141-207): absolute → as-is; ``//host/x`` → base scheme;
    ``/x`` → base origin; relative → base directory."""
    scheme = F.regexp_extract(base, r"^([a-z]+):", 1)
    origin = F.regexp_extract(base, r"^[a-z]+://[^/]+", 0)
    base_dir = F.when(
        base.rlike(r"^[a-z]+://[^/]+$"), F.concat(base, F.lit("/"))
    ).otherwise(F.regexp_replace(base, r"[^/]*$", ""))
    return (
        F.when(href.rlike(r"^[a-z]+://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(base_dir, href))
    )


def unescape_unicode(col: Column) -> Column:
    """``\\uXXXX`` escape sequences → characters (common.go
    UnicodeToUTF8 analog) via the JSON string parser — portable to any
    SQL engine with a JSON extractor. Input must not contain raw
    ``"``/newlines (the JSONP/unicode-escape payloads this decodes
    never do; returns NULL rather than garbage if one does). Wrapped
    as a one-element JSON array because from_json requires a container
    schema."""
    return F.element_at(
        F.from_json(
            F.concat(F.lit('["'), col, F.lit('"]')), "array<string>"
        ),
        1,
    )


def jsonp_to_json(col: Column) -> Column:
    """Strip a JSONP callback wrapper: ``cb({...});`` → ``{...}``
    (util.go:43-56); non-JSONP input passes through unchanged."""
    inner = F.regexp_extract(col, r"^\s*[\w$.]+\((.*)\)\s*;?\s*$", 1)
    return F.when(inner != "", inner).otherwise(col)
