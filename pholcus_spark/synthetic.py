"""Deterministic synthetic web — the in-sandbox fetch boundary.

No network exists in the sandbox (FIXTURES.md §8), so the "internet" is
a pure function of ``(seed, canonical_url)``: page content (an image +
caption), child links (0-4, Zipf-skewed hosts, ~20% duplicates), robots
policies, and a 5% transient fetch-failure rate. The fetch UDF
(``fetch.py``) and the pure-Python oracle (``oracle.py``) both call
these functions, so engine/oracle parity is byte-exact.

This module is the drop-in boundary for a real fetcher: ``fetch_one``
has the signature an aiohttp-based implementation would have
(reference fetch surface: ``app/downloader/surfer/surf.go:52-197``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

from .hashing import xxh64, MASK64
from .imaging import encode_image, phash64

GLOBAL_SEED = 42
FAILURE_PCT = 5  # transient failure rate (FIXTURES.md §8)
DUP_PCT = 20  # duplicate-link rate
MAX_CHILDREN = 4

_WORDS = (
    "amber basalt cedar dune ember fjord glacier harbor iris juniper "
    "kelp lagoon meadow nectar obsidian prairie quartz reef sierra "
    "tundra umbra vale willow xenon yarrow zephyr"
).split()


def _h(*parts: object) -> int:
    """Deterministic 64-bit mix of arbitrary parts (xxh64 chain)."""
    acc = GLOBAL_SEED
    for p in parts:
        acc = xxh64(str(p).encode("utf-8"), acc)
    return acc & MASK64


@lru_cache(maxsize=8)
def make_hosts(n_hosts: int) -> list[str]:
    return [f"h{i:03d}.example.com" for i in range(n_hosts)]


@lru_cache(maxsize=8)
def _zipf_cdf(n_hosts: int, s: float) -> np.ndarray:
    weights = 1.0 / np.power(np.arange(1, n_hosts + 1), s)
    return np.cumsum(weights) / weights.sum()


def zipf_host(rand: int, n_hosts: int, s: float = 1.2) -> str:
    """Pick a host with Zipf(s) skew from a uniform 64-bit random value
    (host 0 is hot — exercises per-host skew/salting). The CDF is
    cached — this sits in the fetch UDF's per-link hot path."""
    cdf = _zipf_cdf(n_hosts, s)
    u = (rand % (1 << 53)) / float(1 << 53)
    idx = int(np.searchsorted(cdf, u))
    return make_hosts(n_hosts)[min(idx, n_hosts - 1)]


def seed_urls(n_seeds: int, n_hosts: int) -> list[str]:
    """Deterministic seed list across the host set."""
    out = []
    for i in range(n_seeds):
        host = zipf_host(_h("seed-host", i), n_hosts)
        out.append(f"http://{host}/page/{_h('seed-path', i) % 100000:05d}")
    return out


# --- robots / politeness (north-rule addition over the reference) ---


def robots_for(host: str, pausetime_ms: int = 300) -> dict:
    """Synthetic robots.txt policy: crawl-delay + disallow prefixes.

    Reference analog: a single global randomized pause
    (app/crawler/crawler.go:53-59, default 300ms config/config.go:157);
    we derive a per-host delay around that default.
    """
    r = _h("robots", host)
    crawl_delay_ms = int(pausetime_ms // 2 + (r % 4) * (pausetime_ms // 2))
    disallow = ["/private"] if (r >> 8) % 5 == 0 else []
    return {"host": host, "crawl_delay_ms": crawl_delay_ms, "robots_disallow": disallow}


def robots_allows(url_path: str, disallow: list[str]) -> bool:
    """Oracle twin of ``frontier.filter_robots``: disallow-only, but
    RFC 9309 wildcard-aware (``*``, trailing ``$``)."""
    from .robots import rule_matches

    return not any(rule_matches(p, url_path) for p in disallow)


def host_budget(crawl_delay_ms: int, round_duration_ms: int = 1000) -> int:
    """URLs admissible per host per micro-batch round given crawl-delay."""
    return max(1, round_duration_ms // max(1, crawl_delay_ms))


# --- proxy pool (F12, reference app/aid/proxy/proxy.go:141-197) ---


def proxy_latency_ms(idx: int) -> int:
    """Synthetic per-proxy latency, SQL-mirrorable (Knuth
    multiplicative hash mod 2^32) so the assignment operator has a
    DuckDB oracle. The reference measures real dial latency per proxy
    and filters dead ones (proxy.go:78-139); this is that signal's
    deterministic stand-in."""
    return 20 + ((int(idx) * 2654435761) % (1 << 32)) % 400


def live_proxies(
    pool: list[str], max_latency_ms: int = 300
) -> list[tuple[str, int]]:
    """Speed-filter + speed-rank the pool: [(proxy, latency)] sorted by
    (latency, index), latency ≤ threshold. The reference keeps only
    usable proxies ordered by measured speed (proxy.go:141-168)."""
    timed = [(p, proxy_latency_ms(i)) for i, p in enumerate(pool)]
    live = [(p, ms) for p, ms in timed if ms <= max_latency_ms]
    return sorted(live, key=lambda t: (t[1], pool.index(t[0])))


def assign_proxy(url_key: int, live: list[tuple[str, int]]) -> str | None:
    """Per-request proxy choice: rotate over the speed-ranked live pool
    keyed by url_key. The reference rotates one global proxy on a timer
    (proxy.go:169-197) — unobservable in a distributed batch — so the
    micro-batch adaptation spreads requests across the live pool
    deterministically (same spirit: every live proxy gets traffic,
    dead/slow ones get none)."""
    if not live:
        return None
    return live[url_key % len(live)][0]


# --- page content ---


def fetch_fails(url: str, attempt: int, failure_pct: int = FAILURE_PCT) -> bool:
    """Transient failure, a pure function of (url, attempt): retries can
    succeed (reference retry loop surf.go:180-194)."""
    return _h("fail", url, attempt) % 100 < failure_pct


def image_id_for(url: str) -> str:
    return f"img-{_h('imgid', url):016x}"


def caption_for(url: str) -> str:
    r = _h("caption", url)
    words = [_WORDS[(r >> (6 * i)) % len(_WORDS)] for i in range(5)]
    return f"{image_id_for(url)}: " + " ".join(words)


def _image_pixels(r: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixels for a seed + dims: low-frequency structure
    (gradients) + noise → non-trivial phash."""
    rng = np.random.Generator(np.random.PCG64(r & MASK64))
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    base = np.stack(
        [
            (gx + gy) / 2,
            np.abs(gx - gy),
            (gx * gy) / 255.0,
        ],
        axis=-1,
    )
    noise = rng.integers(0, 64, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_for(url: str, px_scale: int = 1) -> tuple[np.ndarray, str]:
    """Deterministic pixels + format for a URL. Default images are
    small (24-56 px) to keep tests fast; ``px_scale`` multiplies the
    dimensions so benchmarks can model realistic payloads (the codec
    path is size-agnostic)."""
    r = _h("image", url)
    w = (24 + (r % 33)) * px_scale
    h = (24 + ((r >> 8) % 33)) * px_scale
    fmt = "png" if (r >> 16) % 2 == 0 else "jpeg"
    return _image_pixels(r, w, h), fmt


def image_params_for_doc(doc_id: int) -> tuple[int, int, str, int]:
    """(w, h, fmt, seed) for the doc-keyed image fixture — the dims/fmt
    arithmetic is a Knuth multiplicative hash mod 2^32, chosen to be
    EXACTLY mirrorable in ANSI SQL so a DuckDB oracle can predict the
    decoded metadata independently (partial multimodal oracle)."""
    r = (int(doc_id) * 2654435761) % (1 << 32)
    w = 24 + r % 33
    h = 24 + (r // 33) % 33
    fmt = "png" if (r // 1089) % 2 == 0 else "jpeg"
    return w, h, fmt, r


def image_for_doc(doc_id: int) -> tuple[np.ndarray, str]:
    """Deterministic image for a documents-table row (the registry's
    image corpus stand-in)."""
    w, h, fmt, r = image_params_for_doc(doc_id)
    return _image_pixels(r, w, h), fmt


def neardup_image_for_doc(doc_id: int) -> tuple[np.ndarray, str]:
    """Image corpus with PLANTED near-duplicates: every ``doc_id % 5
    == 1`` is a mildly perturbed copy of ``doc_id - 1``'s image (a +3
    luminance nudge on one corner block) — bytes differ, but both
    perceptual hash families land within a small hamming distance, so
    near-dup operators verified against this corpus return genuinely
    non-vacuous pair sets. Deterministic, shared by the engine's
    mapInPandas generator and the oracle's driver-side recompute."""
    if doc_id % 5 == 1 and doc_id > 0:
        arr, fmt = image_for_doc(doc_id - 1)
        arr = arr.copy()
        arr[:2, :2] = np.clip(
            arr[:2, :2].astype(np.int16) + 3, 0, 255
        ).astype(arr.dtype)
        return arr, fmt
    return image_for_doc(doc_id)


def audio_params_for_doc(doc_id: int) -> tuple[int, int, int]:
    """(n_samples, freq_hz, amplitude) for the doc-keyed PCM fixture —
    same Knuth-hash arithmetic as ``image_params_for_doc`` so oracles
    can derive the sample count (and hence duration) in plain SQL."""
    r = (int(doc_id) * 2654435761) % (1 << 32)
    n_samples = 2000 + r % 6000
    freq_hz = 50 + (r // 64) % 400
    amplitude = 4000 + (r // 4096) % 20000
    return n_samples, freq_hz, amplitude


def audio_for_doc(doc_id: int, sample_rate: int = 16000) -> bytes:
    """Deterministic 16-bit little-endian PCM for a documents-table row
    (the registry's audio corpus stand-in): a pure sine at a doc-keyed
    frequency/amplitude, so RMS and zero-crossing counts are non-trivial
    but exactly recomputable driver-side for the oracle twin."""
    n, freq, amp = audio_params_for_doc(doc_id)
    t = np.arange(n, dtype=np.float64)
    wave = amp * np.sin(2.0 * np.pi * freq * t / float(sample_rate))
    return wave.astype("<i2").tobytes()


def child_links(url: str, depth: int, n_hosts: int) -> list[str]:
    """0-4 deterministic child URLs; ~20% draw from a small per-host
    'popular pool' so duplicate links occur naturally across pages."""
    r = _h("children", url)
    n = r % (MAX_CHILDREN + 1)
    out = []
    for i in range(n):
        cr = _h("child", url, i)
        host = zipf_host(cr, n_hosts)
        if cr % 100 < DUP_PCT:
            path = f"/pop/{_h('popular', host, cr % 8) % 1000:04d}"
        else:
            path = f"/page/{cr % (10**9):09d}"
        out.append(f"http://{host}{path}")
    return out


SEARCH_HOST = "www.baidu.com"
SEARCH_PAGE_SIZE = 10


def search_total_pages(keyin: str) -> int:
    """Deterministic result depth per keyword: 2-4 pages."""
    return 2 + _h("serp", keyin) % 3


def search_result_title(keyin: str, idx: int) -> str:
    """Empty every 7th slot — exercises the sample script's
    skip-empty-result ``continue`` branch."""
    if _h("serp-skip", keyin, idx) % 7 == 0:
        return ""
    w = _WORDS[_h("serp-word", keyin, idx) % len(_WORDS)]
    return f"{keyin} {w} {idx}"


def search_result_href(keyin: str, idx: int) -> str:
    return f"/link?u={_h('serp-link', keyin, idx) % 10**8:08d}"


def search_result_summary(keyin: str, idx: int) -> str:
    w = _WORDS[_h("serp-sum", keyin, idx) % len(_WORDS)]
    return f"about {keyin}: {w} snippet {idx}"


def search_result_page(url: str) -> str:
    """Deterministic search-results page for the dynamic-rule sample
    (sample/dyn_rules/baidu_search.pholcus.xml): div.result /
    div.result-op entries with h3.t a titles+hrefs and
    [data-module=abstract] summaries, plus a.n pagination links while
    more pages remain. Decoy markup mirrors html_page_for's structural
    honesty (a result-shaped div outside h3.t, links in comments)."""
    from urllib.parse import parse_qs, quote, urlsplit

    q = parse_qs(urlsplit(url).query)
    keyin = q.get("wd", [""])[0]
    pn = int(q.get("pn", ["0"])[0] or 0)
    total = search_total_pages(keyin)
    divs = []
    for i in range(SEARCH_PAGE_SIZE):
        idx = pn + i
        cls = "result" if _h("serp-cls", keyin, idx) % 2 == 0 else "result-op"
        title = search_result_title(keyin, idx)
        divs.append(
            f'<div class="{cls}">'
            f'<h3 class="t"><a href="{search_result_href(keyin, idx)}">'
            f"{title}</a></h3>"
            f'<div data-module="abstract">'
            f"{search_result_summary(keyin, idx)}</div></div>"
        )
    nav = '<a class="n" href="/s">decoy-first</a>' if pn else ""
    if pn // SEARCH_PAGE_SIZE + 1 < total:
        nav += (
            f'<a class="n" href="/s?wd={quote(keyin)}'
            f"&amp;pn={pn + SEARCH_PAGE_SIZE}\">next</a>"
        )
    return (
        "<html><head><title>serp</title>"
        "<script>var d = \"<div class='result'><a href='/decoy'>x</a>"
        '</div>";</script></head><body>'
        "<!-- <div class=\"result\"><h3 class=\"t\">"
        '<a href="/decoy-c">c</a></h3></div> -->'
        '<div class="result-like"><a href="/not-a-result">n</a></div>'
        f'{"".join(divs)}'
        f"<div id=\"page\">{nav}</div>"
        "</body></html>"
    )


def html_page_for(
    url: str,
    depth: int,
    n_hosts: int,
    method: str = "GET",
    post_data: str | None = None,
    cookies: dict | None = None,
    downloader: str = "surf",
) -> str:
    """Deterministic HTML rendering of a page's content — the fetch
    body for selector-driven rules (``parse: "dom"``). The caption and
    child links are embedded in real markup surrounded by decoys that
    defeat regex extraction (links inside <script> text and comments,
    nav/footer links outside the content container): a rule can only
    recover them with a structural parse, which is what the fidelity
    contract then proves (the oracle uses the direct values)."""
    host = url.split("://", 1)[-1].split("/", 1)[0]
    if host == SEARCH_HOST:
        # the search-engine host serves result pages (the dynamic-rule
        # sample's crawl surface) — content is a pure function of the
        # URL's wd/pn query, independent of jar/renderer
        return search_result_page(url)
    ck = content_key(url, method, post_data, cookies, downloader)
    caption = caption_for(ck)
    links = child_links(ck, depth, n_hosts)
    lis = "".join(
        f'<li><a class="child" href="{u}">child {i}</a></li>'
        for i, u in enumerate(links)
    )
    form = login_form_html(url) if page_has_login_form(url) else ""
    return (
        "<html><head>"
        f"<title>{image_id_for(ck)}</title>"
        "<script>var decoy = \"<a class='child' href='/decoy-js'>x</a>\";"
        "</script></head><body>"
        '<header><a href="/nav">nav</a></header>'
        "<!-- <a class=\"child\" href=\"/decoy-comment\">c</a> -->"
        '<div id="main" class="content">'
        f'<h1 id="caption">{caption}</h1>'
        f'<ul class="children">{lis}</ul>'
        f"{form}"
        "</div>"
        '<footer><a href="/about">about</a></footer>'
        "</body></html>"
    )


@dataclass
class FetchResult:
    url: str
    ok: bool
    error: str | None = None
    image_id: str | None = None
    payload: bytes | None = None
    w: int = 0
    h: int = 0
    fmt: str | None = None
    caption: str | None = None
    phash: int = 0
    links: list[str] = field(default_factory=list)
    set_cookies: dict | None = None


# --- cookies (reference: Surf's per-spider cookie jar,
#     surfer/param.go:47-108; EnableCookie request.go:28) ---


def session_id_for(host: str) -> str:
    """The session value a host's login pages hand out. Host-keyed (any
    login page on the host yields the same session) so within-round
    multi-setter merges are order-independent."""
    return f"s{_h('sid', host) % 100000:05d}"


def set_cookies_for(url: str, host: str) -> dict | None:
    """~25% of pages are 'login' pages whose response carries a
    Set-Cookie session header; the rest set nothing."""
    if _h("setcookie", url) % 4 != 0:
        return None
    return {"sid": session_id_for(host)}


def page_has_login_form(url: str) -> bool:
    """Login pages (the ~25% that also carry Set-Cookie) embed a login
    <form>; a form-rule spider can only submit it by structural parse."""
    return _h("setcookie", url) % 4 == 0


def login_csrf_for(url: str) -> str:
    """Deterministic per-page CSRF token embedded in the login form."""
    return f"c{_h('csrf', url) % (1 << 32):08x}"


def login_form_html(url: str) -> str:
    """The login form markup a login page embeds. Exercises every
    serializeForm branch (form.go:145-169): a hidden field, a text
    field, an input WITHOUT a type attribute (reference quirk: skipped),
    a textarea (included despite no type; value attr absent → ''), and
    a submit button."""
    return (
        '<form id="login" method="post" action="/login">'
        f'<input type="hidden" name="csrf" value="{login_csrf_for(url)}"/>'
        '<input type="text" name="user" value=""/>'
        '<input name="notype" value="skipped"/>'
        '<textarea name="note">ignored body</textarea>'
        '<input type="submit" name="go" value="1"/>'
        "</form>"
    )


def login_form_request(
    url: str, host: str, inputs: dict[str, str] | None = None
) -> dict:
    """The submit request the embedded login form produces — computed
    DIRECTLY from the synthetic parameters (no HTML parse), so the
    oracle can predict what the engine's DOM-extracted form submission
    must yield. Mirrors Form.Submit: overrides apply only to existing
    fields, the submit button's pair joins the body, keys sort
    (url.Values.Encode)."""
    from urllib.parse import urlencode

    fields = {"csrf": login_csrf_for(url), "user": "", "note": ""}
    for k, v in (inputs or {}).items():
        if k in fields:
            fields[k] = v
    pairs = sorted(list(fields.items()) + [("go", "1")])
    return {
        "url": f"http://{host}/login",
        "method": "POST",
        "post_data": urlencode(pairs),
    }


def content_key(
    url: str,
    method: str = "GET",
    post_data: str | None = None,
    cookies: dict | None = None,
    downloader: str = "surf",
) -> str:
    """The synthetic-content seed: GET responses depend on the URL
    alone; POST/POST-M responses also depend on the request body
    (reference method switch surfer/surf.go:103-140 — a form POST and
    a GET of the same URL return different documents). Request cookies
    (when a jar is enabled) also key the content — a logged-in fetch of
    the same URL returns a different document, which is what makes
    cookie fidelity observable end-to-end. A non-surf ``downloader``
    (the Chrome/Phantom JS renderer, D2 dispatch —
    surfer/chrome.go:26-80) also keys the content: a rendered page
    differs from the raw response for the same URL."""
    if method in ("GET", "HEAD"):
        base = url
    else:
        base = f"{method}|{url}|{post_data or ''}"
    if downloader != "surf":
        base = f"{downloader}|{base}"
    if cookies:
        ck = ";".join(f"{k}={v}" for k, v in sorted(cookies.items()))
        return f"{base}|ck:{ck}"
    return base


def fetch_one(
    url: str,
    depth: int,
    attempt: int,
    n_hosts: int,
    failure_pct: int = FAILURE_PCT,
    px_scale: int = 1,
    method: str = "GET",
    post_data: str | None = None,
    cookies: dict | None = None,
    downloader: str = "surf",
) -> FetchResult:
    """The fetch+decode boundary: returns the full page payload or a
    transient error. Pure function of its arguments.

    Method semantics (reference surfer/param.go:61-84, surf.go:103-140):
    GET returns the page; POST/POST-M return a body keyed by
    (method, url, post_data); HEAD succeeds with headers only — no
    body, no item payload, no child links.

    Cookie semantics (surfer/param.go:47-108): ``cookies`` is the
    request jar slice for this host — it keys the returned content;
    the response's Set-Cookie headers come back in ``set_cookies``
    (body-carrying responses only — the synthetic HEAD is header-free).
    """
    if fetch_fails(url, attempt, failure_pct):
        return FetchResult(url=url, ok=False, error="synthetic transient error")
    if method == "HEAD":
        return FetchResult(url=url, ok=True)
    ck = content_key(url, method, post_data, cookies, downloader)
    arr, fmt = image_for(ck, px_scale)
    payload = encode_image(arr, fmt)
    host = url.split("://", 1)[-1].split("/", 1)[0]
    return FetchResult(
        url=url,
        ok=True,
        image_id=image_id_for(ck),
        payload=payload,
        w=arr.shape[1],
        h=arr.shape[0],
        fmt=fmt,
        caption=caption_for(ck),
        phash=phash64(arr),
        links=child_links(ck, depth, n_hosts),
        set_cookies=set_cookies_for(url, host),
    )
