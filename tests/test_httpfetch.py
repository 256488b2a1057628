"""Real-network fetcher twin (httpfetch) driven entirely by injected
fakes — decode, retry, DNS-cache, header/cookie construction parity
with surf.go, zero network."""

from __future__ import annotations

import gzip
import zlib

import pytest

from pholcus_spark.httpfetch import (
    DnsCache,
    HttpFetcher,
    HttpResponse,
    decode_body,
)


def test_decode_body_encodings():
    raw = b"hello pholcus" * 10
    assert decode_body(raw, "") == raw
    assert decode_body(raw, "identity") == raw
    assert decode_body(gzip.compress(raw), "gzip") == raw
    # deflate: servers send BOTH raw rfc1951 and zlib-wrapped rfc1950
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw_deflate = co.compress(raw) + co.flush()
    assert decode_body(raw_deflate, "deflate") == raw
    assert decode_body(zlib.compress(raw), "deflate") == raw
    assert decode_body(zlib.compress(raw), "zlib") == raw
    with pytest.raises(ValueError, match="br"):
        decode_body(raw, "br")


class _FakeNet:
    """Scripted transport + resolver + sleeper with call logs."""

    def __init__(self, script):
        self.script = list(script)  # HttpResponse | Exception per call
        self.calls = []
        self.resolved = []
        self.slept = []

    def transport(self, method, url, ip_port, headers, body,
                  dial_timeout, conn_timeout):
        self.calls.append(
            {"method": method, "url": url, "ip_port": ip_port,
             "headers": {k: list(v) for k, v in headers.items()},
             "body": body, "dial": dial_timeout, "conn": conn_timeout}
        )
        step = self.script.pop(0)
        if isinstance(step, Exception):
            raise step
        return step

    def resolver(self, host, port):
        self.resolved.append((host, port))
        return f"10.0.0.7:{port}"

    def fetcher(self, **kw):
        return HttpFetcher(
            transport=self.transport, resolver=self.resolver,
            sleeper=self.slept.append, **kw
        )


def _ok(body=b"ok", headers=None, status=200):
    return HttpResponse(status, headers or {}, body)


def test_request_headers_cookies_and_body():
    net = _FakeNet([_ok()])
    f = net.fetcher()
    resp = f.request(
        "http://h.example.com/p?q=1",
        method="POST",
        headers={"Accept": ["text/html", "image/*"]},
        post_data="a=1&b=2",
        cookies={"sid": "s1", "tok": "t2"},
    )
    assert resp.status == 200 and resp.body == b"ok"
    call = net.calls[0]
    assert call["method"] == "POST"
    assert call["ip_port"] == "10.0.0.7:80"
    h = call["headers"]
    assert h["Accept"] == ["text/html", "image/*"]  # multi-value kept
    assert h["Connection"] == ["close"]
    assert h["Cookie"] == ["sid=s1; tok=t2"]
    assert h["Content-Type"] == ["application/x-www-form-urlencoded"]
    assert call["body"] == b"a=1&b=2"
    # POST-M rides POST at the wire level
    net2 = _FakeNet([_ok()])
    net2.fetcher().request("http://h/", method="POST-M", post_data="x=1")
    assert net2.calls[0]["method"] == "POST"


def test_gzip_response_decoded_through_request():
    body = b"<html>page</html>"
    net = _FakeNet(
        [_ok(gzip.compress(body), {"content-encoding": ["gzip"]})]
    )
    assert net.fetcher().request("http://h/").body == body


def test_retry_pause_and_exhaustion():
    boom = ConnectionError("refused")
    net = _FakeNet([boom, boom, _ok()])
    f = net.fetcher(try_times=3, retry_pause_s=0.25)
    assert f.request("http://h/").body == b"ok"
    assert net.slept == [0.25, 0.25]  # between attempts only
    # exhaustion re-raises the last error
    net2 = _FakeNet([boom, boom])
    with pytest.raises(ConnectionError):
        net2.fetcher(try_times=2).request("http://h/")
    assert len(net2.calls) == 2


def test_dns_cache_reg_reuse_and_evict_on_failure():
    net = _FakeNet([_ok(), _ok(), ConnectionError("stale"), _ok()])
    f = net.fetcher(try_times=2)
    f.request("http://h.example.com/a")
    assert f.dns.query("h.example.com:80") == "10.0.0.7:80"
    assert net.resolved == [("h.example.com", 80)]
    # second request reuses the cache — no new resolve
    f.request("http://h.example.com/b")
    assert net.resolved == [("h.example.com", 80)]
    # a dial failure through the cached entry evicts it; the retry
    # re-resolves (surf.go:121-132)
    f.request("http://h.example.com/c")
    assert net.resolved == [("h.example.com", 80), ("h.example.com", 80)]
    assert f.dns.query("h.example.com:80") == "10.0.0.7:80"


def test_redirects_followed_like_go_client():
    """301/302/303 demote to a bodyless GET and follow Location
    (relative or absolute); 307 preserves method+body; >10 hops raise.
    Without this the common http→https 301 came back ok=True with the
    redirect stub as page content."""
    net = _FakeNet([
        _ok(b"", {"location": ["https://h2.example.com/next"]}, 301),
        _ok(b"landed"),
    ])
    f = net.fetcher(try_times=1)
    resp = f.request(
        "http://h1.example.com/a", method="POST", post_data="x=1"
    )
    assert resp.body == b"landed"
    assert [c["url"] for c in net.calls] == [
        "http://h1.example.com/a", "https://h2.example.com/next",
    ]
    # 301 POST→GET, body and its headers dropped
    assert net.calls[1]["method"] == "GET"
    assert net.calls[1]["body"] is None
    assert "Content-Length" not in net.calls[1]["headers"]
    # relative Location resolves against the redirecting URL
    net2 = _FakeNet([_ok(b"", {"location": ["/other"]}, 302), _ok(b"r")])
    net2.fetcher(try_times=1).request("http://h/x/y")
    assert net2.calls[1]["url"] == "http://h/other"
    # 307 preserves method + body
    net3 = _FakeNet([_ok(b"", {"location": ["/p"]}, 307), _ok(b"r")])
    net3.fetcher(try_times=1).request("http://h/a", method="POST",
                                      post_data="x=1")
    assert net3.calls[1]["method"] == "POST"
    assert net3.calls[1]["body"] == b"x=1"
    # a redirect loop stops after 10 hops
    net4 = _FakeNet([_ok(b"", {"location": ["/l"]}, 302)] * 11)
    with pytest.raises(RuntimeError, match="10 redirects"):
        net4.fetcher(try_times=1).request("http://h/l")


def test_dns_cache_surface():
    d = DnsCache()
    assert d.query("a:80") is None
    d.reg("a:80", "1.2.3.4:80")
    assert d.query("a:80") == "1.2.3.4:80"
    d.delete("a:80")
    assert d.query("a:80") is None


def test_fetch_one_boundary_shape():
    page = b"<html>x</html>"
    net = _FakeNet(
        [
            _ok(page, {"set-cookie": ["sid=abc; Path=/", "t=9"]}),
            _ok(b"", status=404),
            ConnectionError("down"),
            _ok(b""),
        ]
    )
    f = net.fetcher()
    r = f.fetch_one("http://h/", 0, 0, method="GET")
    assert r.ok and r.payload == page
    assert r.set_cookies == {"sid": "abc", "t": "9"}
    r404 = f.fetch_one("http://h/x", 0, 0)
    assert not r404.ok and "404" in r404.error
    rerr = f.fetch_one("http://h/y", 0, 0)
    assert not rerr.ok and "down" in rerr.error
    # fetch_one makes exactly ONE attempt per call — fetch_batch owns
    # the retry loop, so attempts must not multiply
    head = f.fetch_one("http://h/z", 0, 0, method="HEAD")
    assert head.ok and head.payload is None
    assert len(net.calls) == 4


def test_redirect_strips_credentials_cross_host():
    """Cookie/Authorization follow a redirect only to the same host or
    a subdomain (Go net/http isDomainOrSubdomain) — a foreign host the
    page 302s to must not see the session cookie."""
    # cross-host: both credential headers dropped
    net = _FakeNet([
        _ok(b"", {"location": ["http://evil.example.net/grab"]}, 302),
        _ok(b"landed"),
    ])
    net.fetcher(try_times=1).request(
        "http://site-a.com/a",
        headers={"Authorization": ["Bearer tok"]},
        cookies={"sid": "secret"},
    )
    h0, h1 = net.calls[0]["headers"], net.calls[1]["headers"]
    assert h0["Cookie"] == ["sid=secret"]
    assert h0["Authorization"] == ["Bearer tok"]
    assert "Cookie" not in h1 and "Authorization" not in h1
    # subdomain: credentials follow
    net2 = _FakeNet([
        _ok(b"", {"location": ["http://img.site-a.com/b"]}, 302),
        _ok(b"landed"),
    ])
    net2.fetcher(try_times=1).request(
        "http://site-a.com/a", cookies={"sid": "s"}
    )
    assert net2.calls[1]["headers"]["Cookie"] == ["sid=s"]
