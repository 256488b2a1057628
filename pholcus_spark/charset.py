"""Charset detection + UTF-8 transcode for text payloads — operator D3
(reference ``app/spider/context.go:678-736``: Content-Type charset
sniff, then mahonia/x-net conversion of non-UTF-8 bodies).

Two layers:

- ``sniff_charset_col`` — the SQL-expressible part of the detector
  (BOM prefixes + ASCII test) as pure column expressions, so the
  DuckDB oracle can verify it byte-for-byte;
- ``decode_text`` — the full vectorized operator: an Arrow-batched
  ``mapInPandas`` pass that sniffs (BOM → <meta charset> → declared
  hint → UTF-8 strict try → GBK → Big5 → latin-1 fallback) and decodes
  every payload to UTF-8. The per-row ``bytes.decode`` is inherent to
  transcoding (same boundary as image decode); everything around it is
  pandas-vectorized and the operator is embarrassingly parallel — no
  shuffle, runs in the scan stage at any scale.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOMS: list[tuple[bytes, str]] = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]

_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.I
)

# decode order for undeclared non-UTF-8 bodies (the reference defers to
# mahonia's auto-detection; GBK/Big5 cover its documented CJK cases)
_FALLBACKS = ("gbk", "big5", "latin-1")


def sniff_charset_col(data: Column) -> Column:
    """BOM/ASCII charset label as a column expression (the
    SQL-twinnable detector core): utf-8-sig / utf-16-le / utf-16-be by
    BOM, else 'ascii' when every byte < 0x80, else 'other'."""
    h = F.hex(data)
    # every byte < 0x80 ⇔ every hex pair's high nibble is 0-7 — an
    # exact, byte-level ASCII test that never round-trips through a
    # string decode
    all_ascii = h.rlike(r"^([0-7][0-9A-F])*$")
    return (
        F.when(h.startswith("EFBBBF"), F.lit("utf-8-sig"))
        .when(h.startswith("FFFE"), F.lit("utf-16-le"))
        .when(h.startswith("FEFF"), F.lit("utf-16-be"))
        .when(all_ascii, F.lit("ascii"))
        .otherwise(F.lit("other"))
    )


def sniff_one(data: bytes, declared: str | None = None) -> str:
    """Full detector (python side of the operator): BOM, then the page's
    own <meta charset>, then the transport-declared hint, then UTF-8
    strict, then CJK fallbacks."""
    if data is None:
        return "utf-8"
    for bom, name in BOMS:
        if data.startswith(bom):
            return name
    m = _META_RE.search(data[:2048])
    if m:
        cand = m.group(1).decode("ascii", "ignore").lower()
        norm = {"utf8": "utf-8", "gb2312": "gbk", "gb18030": "gbk"}.get(
            cand, cand
        )
        try:
            b"x".decode(norm)
            return norm
        except LookupError:
            pass
    if declared:
        try:
            b"x".decode(declared)
            return declared.lower()
        except LookupError:
            pass
    try:
        data.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    for cs in _FALLBACKS:
        try:
            data.decode(cs, "strict")
            return cs
        except (UnicodeDecodeError, LookupError):
            continue
    return "latin-1"


def decode_one(data: bytes, declared: str | None = None) -> tuple[str, str]:
    """(charset, utf-8 text) for one payload. BOM-labeled charsets
    strip their BOM before the endian-specific decode (the utf-16-le/
    be codecs would otherwise leave a U+FEFF in the text)."""
    cs = sniff_one(data, declared)
    if data is None:
        return cs, ""
    if cs in ("utf-16-le", "utf-16-be"):
        return cs, data[2:].decode(cs, errors="replace")
    return cs, data.decode(cs, errors="replace")


def decode_text(
    df: DataFrame,
    bytes_col: str = "payload",
    declared_col: str | None = None,
    out_prefix: str = "",
) -> DataFrame:
    """The transcode operator: adds ``<out_prefix>charset`` and
    ``<out_prefix>text`` columns. Arrow-batched mapInPandas — map-only
    (no shuffle); each task decodes its own partition's payloads."""
    charset_col = f"{out_prefix}charset"
    text_col = f"{out_prefix}text"
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, {charset_col} string, {text_col} string"

    def _decode(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            declared = (
                pdf[declared_col]
                if declared_col
                else pd.Series([None] * len(pdf))
            )
            pairs = [
                decode_one(b, d)
                for b, d in zip(pdf[bytes_col], declared)
            ]
            pdf = pdf.copy()
            pdf[charset_col] = [p[0] for p in pairs]
            pdf[text_col] = [p[1] for p in pairs]
            yield pdf

    return df.mapInPandas(_decode, out_schema)
