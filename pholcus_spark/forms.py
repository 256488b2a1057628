"""Form helper (P9) — HTML form scrape + submit-request builder.

Reference behavior being reproduced: ``app/spider/common/form.go:25-160``
(``NewForm`` / ``Input`` / ``Submit`` / ``Click``) over the goquery
selection of a ``<form>`` element:

- field/button serialization (``serializeForm``, form.go:145-169):
  descendant ``input,button,textarea`` elements that carry a ``name``
  AND either a ``type`` attribute or are a ``<textarea>``;
  ``type=submit`` rows become buttons, everything else a field (value
  attr, '' when absent). Multi-valued names accumulate in document
  order, like ``url.Values.Add``.
- method/action resolution (``formAttributes``, form.go:171-180):
  method = upper(form@method or "GET"); action = ``MakeUrl`` of
  (form@action or the page URL) against the page's scheme://host —
  the reference's MakeUrl (common.go:178-195) roots any non-absolute
  path at "/", so ``action="login"`` resolves host-rooted, not
  RFC-relative. A form whose action cannot resolve yields no request
  (NewForm returns nil, form.go:32-34).
- ``Input``/``Inputs`` (form.go:61-76) override ONLY existing field
  names (a name the form lacks is ignored).
- ``Submit`` (form.go:81-96): click the FIRST button, or submit
  button-less. Go iterates its button map in random order; document
  order is the deterministic serialization of that choice.
- ``send`` (form.go:104-140): values urlencoded with keys sorted
  (``url.Values.Encode`` sorts by key); GET appends ``?query`` to the
  action with no body; ``enctype="multipart/form-data"`` dispatches
  method POST-M (the reference's multipart marker); anything else posts
  the encoded body with the form's method.

Spark surface & scale: like the DOM engine it builds on (dom.py), form
extraction is per-document work, exposed as an Arrow-batched pandas UDF
(one Python round-trip per column batch, never per row). The engine
consumes it inside the fetch pass (rule option ``form``): the page is
already parsed there, and the submit request rides the existing
child-link channel — no extra shuffle.
"""

from __future__ import annotations

from urllib.parse import urlencode, urlsplit

import pandas as pd

from pyspark.sql import functions as F

from .dom import Node, parse_html, select

_FIELD_TAGS = ("input", "button", "textarea")


def make_url(path: str, scheme_and_host: str) -> str | None:
    """Reference MakeUrl (common.go:178-195): absolute URLs pass
    through; anything else is rooted at "/" under scheme://host.
    Returns None when unresolvable (no host to root against)."""
    if not path:
        path = "/"
    if path[0] != "/" and path[0].lower() != "h":
        path = "/" + path
    if "://" in path:
        return path
    if not scheme_and_host:
        return None
    return scheme_and_host + path


def scheme_and_host_of(url: str) -> str:
    try:
        p = urlsplit(url)
    except ValueError:
        return ""
    if not p.scheme or not p.hostname:
        return ""
    netloc = p.netloc
    return f"{p.scheme}://{netloc}"


def serialize_form(form: Node) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """(fields, buttons) in document order — serializeForm
    (form.go:145-169). The reference quirk is kept: an input/button
    WITHOUT a type attribute is skipped entirely (only textarea is
    exempt from the type requirement)."""
    fields: list[tuple[str, str]] = []
    buttons: list[tuple[str, str]] = []
    for n in select(form, "input, button, textarea"):
        name = n.attrs.get("name")
        if name is None:
            continue
        typ = n.attrs.get("type")
        if typ is None and n.tag != "textarea":
            continue
        value = n.attrs.get("value") or ""
        if (typ or "") == "submit":
            buttons.append((name, value))
        else:
            fields.append((name, value))
    return fields, buttons


def form_attributes(page_url: str, form: Node) -> tuple[str, str | None]:
    """(method, action) — formAttributes (form.go:171-180)."""
    method = (form.attrs.get("method") or "GET").upper()
    action = form.attrs.get("action") or page_url
    return method, make_url(action, scheme_and_host_of(page_url))


def _encode_sorted(pairs: list[tuple[str, str]]) -> str:
    """url.Values.Encode analog: keys sorted; repeated values keep
    their insertion order within a key."""
    return urlencode(sorted(pairs, key=lambda kv: kv[0]))


def submit_form(
    html: str,
    page_url: str,
    selector: str = "form",
    inputs: dict[str, str] | None = None,
    button: str | None = None,
) -> dict | None:
    """Extract the first form matching ``selector`` and build its
    submit request: ``{"url", "method", "post_data"}`` (post_data None
    for GET). Returns None when no form matches, the action cannot
    resolve, or ``button`` names a button the form lacks (Click's
    false return, form.go:91-96)."""
    forms = select(parse_html(html), selector)
    form = next((f for f in forms if f.tag == "form"), None)
    if form is None:
        return None
    method, action = form_attributes(page_url, form)
    if action is None:
        return None
    fields, buttons = serialize_form(form)
    if inputs:
        overridden: set[str] = set()
        out_fields = []
        for k, v in fields:
            if k in inputs:
                # url.Values.Set semantics: first slot takes the new
                # value, other slots of the same name drop
                if k in overridden:
                    continue
                overridden.add(k)
                out_fields.append((k, inputs[k]))
            else:
                out_fields.append((k, v))
        fields = out_fields
    clicked: tuple[str, str] | None = None
    if button is not None:
        clicked = next(((n, v) for n, v in buttons if n == button), None)
        if clicked is None:
            return None
    elif buttons:
        clicked = buttons[0]
    pairs = list(fields)
    if clicked is not None:
        # url.Values.Set semantics (form.go:104-140): the clicked
        # button REPLACES any same-named field's values, it does not
        # add alongside them
        pairs = [(k, v) for k, v in pairs if k != clicked[0]]
        pairs.append(clicked)
    body = _encode_sorted(pairs)
    if method == "GET":
        return {"url": action + "?" + body, "method": "GET", "post_data": None}
    enctype = form.attrs.get("enctype") or ""
    out_method = "POST-M" if enctype == "multipart/form-data" else method
    return {"url": action, "method": out_method, "post_data": body}


# --- Spark surface (Arrow-batched) ---

FORM_REQUEST_DT = "struct<url: string, method: string, post_data: string>"


def form_submit_udf(
    selector: str = "form",
    inputs: dict[str, str] | None = None,
    button: str | None = None,
):
    """pandas_udf (html, page_url) → struct(url, method, post_data);
    all-NULL fields when the page has no matching/resolvable form
    (filter on ``col.url IS NOT NULL``)."""
    inputs = dict(inputs or {})

    @F.pandas_udf(FORM_REQUEST_DT)
    def _f(html: pd.Series, page_url: pd.Series) -> pd.DataFrame:
        rows = []
        for h, u in zip(html, page_url):
            r = (
                submit_form(h, u, selector, inputs, button)
                if h is not None and u is not None
                else None
            )
            rows.append(
                r if r is not None
                else {"url": None, "method": None, "post_data": None}
            )
        return pd.DataFrame(rows, columns=["url", "method", "post_data"])

    return _f
