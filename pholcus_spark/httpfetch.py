"""Real-network fetcher twin (D1's production half) — the drop-in
behind the synthetic fetch boundary.

The engine's ``fetch_batch`` runs a per-URL ``fetch_one`` inside an
Arrow-batched ``mapInPandas`` pass; the sandbox wires it to
``synthetic.fetch_one`` (deterministic content, no network). This
module is the REAL counterpart with the same call surface and result
shape, reproducing Surf's client behaviors
(``app/downloader/surfer/surf.go``):

- **DNS cache** (surf.go:80-100, 112-133): first dial resolves and
  registers host:port → ip:port; later dials reuse it; a dial failure
  through a cached entry evicts it so the next attempt re-resolves.
- **Body decoding** (surf.go:59-74): ``Content-Encoding`` gzip /
  deflate (raw AND zlib-wrapped — servers disagree) / zlib.
- **TLS**: https connections skip certificate verification
  (surf.go:149-151, ``InsecureSkipVerify: true``) and disable
  transparent compression negotiation.
- **Timeouts** (surf.go:134-140): ``dial_timeout`` bounds the connect,
  ``conn_timeout`` sets the whole-connection deadline.
- **Retry loop** (surf.go:180-194): up to ``try_times`` attempts with
  ``retry_pause`` between; ``try_times <= 0`` retries forever.
- **Headers/cookies** (param.go:47-108): multi-value request headers,
  ``Connection: close``, jar dict → ``Cookie`` header, response
  ``Set-Cookie`` values returned multi-valued.

No network I/O happens at import or construction: the transport (and
the resolver and sleeper) are injectable, so the unit tests drive the
full decode/retry/DNS-cache logic with fakes. The default transport is
stdlib ``http.client`` — usable as-is outside the sandbox.
"""

from __future__ import annotations

import gzip
import http.client
import socket
import ssl
import time
import zlib
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit

from .synthetic import FetchResult


def _same_cookie_domain(src_url: str, dest_url: str) -> bool:
    """Go net/http isDomainOrSubdomain: credentials follow a redirect
    only to the same host or a subdomain of it (client.go)."""
    src = (urlsplit(src_url).hostname or "").lower()
    dest = (urlsplit(dest_url).hostname or "").lower()
    return dest == src or dest.endswith("." + src) if src else False


@dataclass
class HttpResponse:
    status: int
    headers: dict[str, list[str]]  # lower-cased names, multi-value
    body: bytes


class DnsCache:
    """host:port → ip:port, Surf's Reg/Del/Query surface
    (surf.go:82-100)."""

    def __init__(self) -> None:
        self._lib: dict[str, str] = {}

    def reg(self, addr: str, ip_port: str) -> None:
        self._lib[addr] = ip_port

    def delete(self, addr: str) -> None:
        self._lib.pop(addr, None)

    def query(self, addr: str) -> str | None:
        return self._lib.get(addr)


def decode_body(body: bytes, content_encoding: str) -> bytes:
    """Content-Encoding decode (surf.go:59-74). Deflate accepts both
    the RFC-1951 raw stream and the RFC-1950 zlib-wrapped stream real
    servers send interchangeably."""
    enc = (content_encoding or "").strip().lower()
    if enc in ("", "identity"):
        return body
    if enc == "gzip":
        return gzip.decompress(body)
    if enc == "deflate":
        try:
            return zlib.decompress(body, -zlib.MAX_WBITS)  # raw
        except zlib.error:
            return zlib.decompress(body)  # zlib-wrapped
    if enc == "zlib":
        return zlib.decompress(body)
    raise ValueError(f"unsupported Content-Encoding {enc!r}")


def _default_resolver(host: str, port: int) -> str:
    infos = socket.getaddrinfo(host, port, type=socket.SOCK_STREAM)
    ip, prt = infos[0][4][0], infos[0][4][1]
    return f"{ip}:{prt}"


@dataclass
class HttpFetcher:
    """Surf-equivalent HTTP fetcher with injectable I/O.

    ``transport(method, url, ip_port, headers, body, dial_timeout,
    conn_timeout) -> HttpResponse`` performs one exchange;
    ``resolver(host, port) -> "ip:port"`` resolves; ``sleeper`` paces
    retries. All three default to real stdlib implementations and are
    replaced with fakes in tests (no network in the sandbox).
    """

    transport: object = None
    resolver: object = None
    sleeper: object = time.sleep
    dial_timeout_s: float = 30.0
    conn_timeout_s: float = 60.0
    retry_pause_s: float = 0.1
    try_times: int = 3
    user_agent: str = "pholcus-spark/1.0"
    dns: DnsCache = field(default_factory=DnsCache)

    def __post_init__(self) -> None:
        if self.transport is None:
            self.transport = self._stdlib_transport
        if self.resolver is None:
            self.resolver = _default_resolver

    # --- default transport (real network; never touched by tests) ---

    def _stdlib_transport(self, method, url, ip_port, headers, body,
                          dial_timeout, conn_timeout) -> HttpResponse:
        parts = urlsplit(url)
        ip, _, port_s = ip_port.rpartition(":")
        if parts.scheme == "https":
            # InsecureSkipVerify twin (surf.go:149-151). The TCP dial
            # goes to the DNS-cached IP, but the TLS handshake must
            # carry the ORIGINAL hostname as SNI — HTTPSConnection(ip)
            # alone would send no SNI (Python ssl omits it for IP
            # literals) and name-routed frontends (CDNs, vhosts) would
            # serve the wrong cert or 421. Dial + wrap explicitly.
            ctx = ssl._create_unverified_context()
            conn = http.client.HTTPSConnection(
                ip, int(port_s), timeout=dial_timeout, context=ctx
            )
            sock = socket.create_connection(
                (ip, int(port_s)), timeout=dial_timeout
            )
            conn.sock = ctx.wrap_socket(
                sock, server_hostname=parts.hostname
            )
        else:
            conn = http.client.HTTPConnection(
                ip, int(port_s), timeout=dial_timeout
            )
        try:
            if conn.sock is None:  # https pre-dialed above with SNI
                conn.connect()
            conn.sock.settimeout(conn_timeout)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            conn.putrequest(
                method, path, skip_host=True, skip_accept_encoding=True
            )
            host_hdr = parts.hostname + (
                f":{parts.port}" if parts.port else ""
            )
            conn.putheader("Host", host_hdr)
            for k, vs in headers.items():
                for v in vs:
                    conn.putheader(k, v)
            conn.endheaders(message_body=body)
            resp = conn.getresponse()
            hdrs: dict[str, list[str]] = {}
            for k, v in resp.getheaders():
                hdrs.setdefault(k.lower(), []).append(v)
            return HttpResponse(resp.status, hdrs, resp.read())
        finally:
            conn.close()

    # --- the Surf request path ---

    def _addr_of(self, url: str) -> tuple[str, int]:
        parts = urlsplit(url)
        port = parts.port or (443 if parts.scheme == "https" else 80)
        return parts.hostname or "", port

    def request(
        self,
        url: str,
        method: str = "GET",
        headers: dict[str, list[str]] | None = None,
        post_data: str | None = None,
        cookies: dict[str, str] | None = None,
        try_times: int | None = None,
    ) -> HttpResponse:
        """One Surf Download: build → dial (DNS-cached) → send → decode,
        retrying ≤ try_times (forever when ≤ 0, surf.go:157-181)."""
        method = (method or "GET").upper()
        if method == "POST-M":
            method = "POST"  # multipart rides POST at the wire level
        hdrs = {k: list(v) for k, v in (headers or {}).items()}
        hdrs.setdefault("Connection", ["close"])
        hdrs.setdefault("User-Agent", [self.user_agent])
        if cookies:
            hdrs.setdefault(
                "Cookie",
                ["; ".join(f"{k}={v}" for k, v in sorted(cookies.items()))],
            )
        body = post_data.encode("utf-8") if post_data else None
        if body is not None:
            hdrs.setdefault("Content-Length", [str(len(body))])
            hdrs.setdefault(
                "Content-Type", ["application/x-www-form-urlencoded"]
            )
        tries = self.try_times if try_times is None else try_times
        # redirect loop: Surf rides Go's http.Client, which follows up
        # to 10 redirects transparently — without this the common
        # http→https 301 came back ok=True with the redirect stub as
        # page content and the crawl silently dead-ended. 301/302/303
        # demote to a bodyless GET (HEAD stays HEAD); 307/308 preserve
        # method + body, per the Go client.
        for _hop in range(10):
            resp = self._exchange(url, method, hdrs, body, tries)
            if resp.status in (301, 302, 303, 307, 308):
                loc = (resp.headers.get("location") or [None])[0]
                if loc:
                    dest = urljoin(url, loc)
                    if not _same_cookie_domain(url, dest):
                        # Go's client strips credential headers when the
                        # redirect leaves the host (or its subdomains) —
                        # net/http shouldCopyHeaderOnRedirect; without
                        # this a site's session cookie leaks to whatever
                        # foreign host it 302s to
                        for k in list(hdrs):
                            if k.lower() in (
                                "cookie", "cookie2", "authorization",
                                "www-authenticate",
                            ):
                                del hdrs[k]
                    url = dest
                    if resp.status in (301, 302, 303) and method != "HEAD":
                        method, body = "GET", None
                        hdrs.pop("Content-Length", None)
                        hdrs.pop("Content-Type", None)
                    continue
            return resp
        raise RuntimeError("stopped after 10 redirects")

    def _exchange(self, url, method, hdrs, body, tries) -> HttpResponse:
        """One URL's dial→send→decode with the ≤ try_times retry loop
        (forever when ≤ 0, surf.go:157-181) and the DNS cache
        register/evict protocol (surf.go:112-133)."""
        host, port = self._addr_of(url)
        addr = f"{host}:{port}"
        attempt = 0
        last_err: Exception | None = None
        while tries <= 0 or attempt < tries:
            attempt += 1
            cached = self.dns.query(addr)
            ip_port = cached if cached is not None else self.resolver(
                host, port
            )
            try:
                resp = self.transport(
                    method, url, ip_port, hdrs, body,
                    self.dial_timeout_s, self.conn_timeout_s,
                )
            except Exception as e:  # noqa: BLE001 — retry loop boundary
                last_err = e
                if cached is not None:
                    # failed through a cached entry: evict so the next
                    # attempt re-resolves (surf.go:121-127)
                    self.dns.delete(addr)
                if tries <= 0 or attempt < tries:
                    self.sleeper(self.retry_pause_s)
                continue
            if cached is None:
                self.dns.reg(addr, ip_port)  # surf.go:128-132
            enc = (resp.headers.get("content-encoding") or [""])[0]
            return HttpResponse(
                resp.status, resp.headers, decode_body(resp.body, enc)
            )
        raise last_err if last_err is not None else RuntimeError(
            "unreachable: zero attempts"
        )

    # --- engine-boundary twin of synthetic.fetch_one ---

    def fetch_one(
        self,
        url: str,
        depth: int,
        attempt: int,
        n_hosts: int = 0,
        failure_pct: int = 0,
        px_scale: int = 1,
        method: str = "GET",
        post_data: str | None = None,
        cookies: dict | None = None,
        downloader: str = "surf",
    ) -> FetchResult:
        """Same signature/result shape as ``synthetic.fetch_one`` so
        ``fetch_batch`` can close over this instead. The real fetch
        returns raw payload bytes + response cookies; decode/parse
        (imaging, DOM, JS rules) happen downstream exactly as they do
        for synthetic content. The synthetic-only knobs (n_hosts,
        failure_pct, px_scale, downloader renderer) are accepted and
        ignored — a rendering downloader needs a browser, which is the
        documented D2 boundary."""
        try:
            resp = self.request(
                url, method=method, post_data=post_data, cookies=cookies,
                try_times=1,  # fetch_batch drives the retry loop itself
            )
        except Exception as e:  # noqa: BLE001 — boundary: error → row
            return FetchResult(url=url, ok=False, error=str(e))
        if resp.status >= 400:
            return FetchResult(url=url, ok=False, error=f"HTTP {resp.status}")
        set_cookies: dict[str, str] = {}
        for line in resp.headers.get("set-cookie", []):
            head = line.split(";", 1)[0]
            if "=" in head:
                k, v = head.split("=", 1)
                set_cookies[k.strip()] = v.strip()
        if method == "HEAD":
            return FetchResult(url=url, ok=True)
        return FetchResult(
            url=url,
            ok=True,
            image_id=None,
            payload=resp.body,
            caption=None,
            links=[],
            set_cookies=set_cookies or None,
        )
