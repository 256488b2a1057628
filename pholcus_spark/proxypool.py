"""F12 proxy pool with REAL probing (reference app/aid/proxy/proxy.go).

The engine's batch-side assignment (``frontier.assign_proxies``)
consumes a speed-ranked live list; in the sandbox that list comes from
``synthetic.live_proxies``. This module is the production twin that
produces the same ``[(proxy, latency_ms)]`` ranking by actually
probing the pool, mirroring the reference's three loops:

- ``update()``: parse the proxy file — IP-form and URL-form regexes
  (proxy.go:54-56, Update proxy.go:79-104) — then liveness-filter with
  a bounded worker pool (findOnline, proxy.go:106-128; the reference
  caps at MAX_THREAD_NUM=1000 goroutines with 4 s timeouts,
  proxy.go:42-48).
- ``test_and_sort(key, test_host)``: HEAD-probe every online proxy
  against the target host, keep the ones that answer 200, sort by
  measured delay (testAndSort proxy.go:200-232 + the ProxyForHost
  sort.Interface in host.go:18-29).
- ``get_one(url)``: per-host-key rotation over the sorted usable list,
  re-probing when the rotation wraps or the update ticker fires
  (GetOne proxy.go:141-197; host key strips the first DNS label when
  the host has >1 dot, proxy.go:151-154).

All I/O is injectable so the loops are unit-testable without a
network: ``pinger(ip) -> bool`` (liveness) and
``prober(proxy, test_host) -> latency_ms | None`` (per-host speed)
default to stdlib socket/urllib implementations, and ``clock`` defaults
to ``time.monotonic``. The sandbox test suite injects fakes; on a real
deployment the defaults probe the actual proxies.
"""

from __future__ import annotations

import re
import socket
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional
from urllib.parse import urlsplit

# reference constants (proxy.go:41-48)
CONN_TIMEOUT_S = 4.0
TRY_TIMES = 3
MAX_THREAD_NUM = 1000

# IP-form proxies: http(s)://[user:pass@]1.2.3.4:8080 (proxy.go:54-55)
_IP_RE = re.compile(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+")
_PROXY_IP_RE = re.compile(
    r"https?://(?:[\w]*:[\w]*@)?[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+:[0-9]+"
)
# URL-form proxies: scheme://[user:pass@]host[:port] (proxy.go:56's
# catch-all grammar, tightened to hostnames so prose doesn't match)
_PROXY_URL_RE = re.compile(
    r"(?:https?|socks5?)://(?:[^:@/\s]+:[^@/\s]+@)?"
    r"(?P<host>[A-Za-z0-9.-]+\.[A-Za-z]{2,})(?::(?P<port>[0-9]{1,5}))?"
)


def parse_proxies(text: str) -> dict[str, str]:
    """Extract proxies from a proxy-file body: ``{proxy_url: probe_host}``
    (Update, proxy.go:79-104). IP-form entries probe the bare IP;
    URL-form entries probe the hostname."""
    out: dict[str, str] = {}
    for m in _PROXY_IP_RE.finditer(text):
        proxy = m.group(0)
        out[proxy] = _IP_RE.search(proxy).group(0)
    for m in _PROXY_URL_RE.finditer(text):
        proxy = m.group(0)
        if proxy not in out:
            out[proxy] = m.group("host")
    return out


def host_key(url: str) -> str:
    """Rotation key for a target URL: the host, minus its first label
    when it has more than one dot (proxy.go:151-154) — so
    ``www.a.example.com`` and ``img.a.example.com`` share one proxy
    rotation."""
    host = urlsplit(url).netloc.rsplit("@", 1)[-1].split(":")[0]
    if host.count(".") > 1:
        host = host[host.index(".") + 1:]
    return host


def default_pinger(host: str, timeout: float = CONN_TIMEOUT_S) -> bool:
    """Liveness check: TCP connect to the proxy host (the reference
    uses raw ICMP, ping.go — a root-only socket; TCP connect is the
    unprivileged equivalent)."""
    for port in (80, 443, 8080):
        try:
            with socket.create_connection((host, port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


def default_prober(
    proxy: str, test_host: str, timeout: float = CONN_TIMEOUT_S,
    try_times: int = TRY_TIMES,
) -> Optional[float]:
    """Speed check: HEAD ``test_host`` through ``proxy``, returning the
    wall latency in ms on HTTP 200, None otherwise (findUsable,
    proxy.go:235-255: HEAD, 4 s dial/conn timeouts, 3 tries)."""
    scheme = urlsplit(proxy).scheme or "http"
    handler = urllib.request.ProxyHandler({"http": proxy, "https": proxy,
                                           scheme: proxy})
    opener = urllib.request.build_opener(handler)
    req = urllib.request.Request(test_host, method="HEAD")
    for _ in range(max(try_times, 1)):
        # clock each attempt separately: timing from before the retry
        # loop charged a succeed-on-retry proxy with its prior ~4 s
        # timeouts, ranking a healthy proxy last (or filtering it out
        # at max_latency_ms) for one transient failure
        t0 = time.monotonic()
        try:
            with opener.open(req, timeout=timeout) as resp:
                if resp.status == 200:
                    return (time.monotonic() - t0) * 1000.0
                return None
        except OSError:
            continue
    return None


def fetcher_prober(fetcher, clock=time.monotonic):
    """A speed prober riding ``httpfetch.HttpFetcher``'s injectable
    transport (VERDICT r4 #7): HTTP proxying at the wire level means
    DIAL the proxy's address and send the request in absolute-URI form
    — exactly the split the fetcher's ``transport(method, url,
    ip_port, ...)`` contract exposes, so the probe needs no separate
    proxy stack. The reference probes with its own Surf downloader
    (findUsable, proxy.go:235-255: HEAD, 4 s timeouts, 3 tries); this
    twin resolves the PROXY host through the fetcher's resolver (DNS
    cache included) and times each attempt separately. Tests inject a
    fake transport + clock; a real deployment gets the stdlib
    transport probing actual proxies."""

    def probe(
        proxy: str,
        test_host: str,
        timeout: float = CONN_TIMEOUT_S,
        try_times: int = TRY_TIMES,
    ) -> Optional[float]:
        parts = urlsplit(proxy if "://" in proxy else "http://" + proxy)
        phost = parts.hostname or proxy
        pport = parts.port or (443 if parts.scheme == "https" else 80)
        url = test_host if "://" in test_host else "http://" + test_host
        hdrs = {
            "Connection": ["close"],
            "User-Agent": [fetcher.user_agent],
        }
        for _ in range(max(try_times, 1)):
            t0 = clock()
            try:
                ip_port = fetcher.resolver(phost, pport)
                resp = fetcher.transport(
                    "HEAD", url, ip_port, hdrs, None, timeout, timeout
                )
            except OSError:
                continue
            if resp.status == 200:
                return (clock() - t0) * 1000.0
            return None
        return None

    return probe


class _HostRotation:
    """Per-host-key usable list: latency-sorted proxies plus the
    rotation cursor (ProxyForHost, host.go:9-29)."""

    __slots__ = ("proxies", "delays_ms", "cur_index")

    def __init__(self) -> None:
        self.proxies: list[str] = []
        self.delays_ms: list[float] = []
        self.cur_index = 0

    def __len__(self) -> int:
        return len(self.proxies)


class ProxyPool:
    """Probed proxy pool with per-host latency-sorted rotation.

    ``tick_minutes`` reproduces UpdateTicker (proxy.go:131-139): once
    per tick every host rotation advances one proxy, re-probing when
    it wraps.
    """

    def __init__(
        self,
        text: str = "",
        *,
        pinger: Callable[[str], bool] = default_pinger,
        prober: Callable[[str, str], Optional[float]] = default_prober,
        clock: Callable[[], float] = time.monotonic,
        tick_minutes: float = 10.0,
        max_threads: int = MAX_THREAD_NUM,
    ) -> None:
        self._pinger = pinger
        self._prober = prober
        self._clock = clock
        self._tick_s = tick_minutes * 60.0
        self._max_threads = max(1, max_threads)
        self._lock = threading.Lock()
        self._all: dict[str, str] = {}      # proxy -> probe host
        self._online: dict[str, bool] = {}  # proxy -> liveness
        self._usable: dict[str, _HostRotation] = {}
        self._last_tick = clock()
        if text:
            self.update(text)

    # --- Update / findOnline (proxy.go:79-128) ---

    def update(self, text: str) -> int:
        """Parse a proxy-file body and liveness-filter the pool;
        returns the online count."""
        self._all = parse_proxies(text)
        return self._find_online()

    def _find_online(self) -> int:
        proxies = list(self._all)
        if not proxies:
            self._online = {}
            return 0
        workers = min(self._max_threads, len(proxies))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            alive = list(pool.map(
                lambda p: bool(self._pinger(self._all[p])), proxies
            ))
        self._online = dict(zip(proxies, alive))
        return self.count()

    def count(self) -> int:
        """Online proxy count (Count, proxy.go:68-70)."""
        return sum(self._online.values())

    # --- testAndSort (proxy.go:200-232) ---

    def test_and_sort(self, key: str, test_host: str) -> _HostRotation:
        """Probe every online proxy against ``test_host``; keep the
        responders sorted by latency; reset the rotation cursor."""
        rot = self._usable.setdefault(key, _HostRotation())
        online = [p for p, ok in self._online.items() if ok]
        timed: list[tuple[float, str]] = []
        if online:
            workers = min(self._max_threads, len(online))
            with ThreadPoolExecutor(max_workers=workers) as pool:
                for proxy, delay in zip(
                    online, pool.map(
                        lambda p: self._prober(p, test_host), online
                    )
                ):
                    if delay is not None:
                        timed.append((float(delay), proxy))
        timed.sort()
        rot.proxies = [p for _, p in timed]
        rot.delays_ms = [d for d, _ in timed]
        rot.cur_index = 0
        return rot

    # --- GetOne (proxy.go:141-197) ---

    def get_one(self, url: str) -> Optional[str]:
        """An up-to-date proxy for ``url``'s host key, or None when the
        pool has nothing usable (the caller then fetches direct)."""
        if self.count() == 0:
            return None
        parts = urlsplit(url)
        if not parts.netloc:
            return None
        key = host_key(url)
        test_host = f"{parts.scheme or 'http'}://{parts.netloc}"
        with self._lock:
            rot = self._usable.get(key)
            now = self._clock()
            if now - self._last_tick >= self._tick_s:
                # ticker fired: advance every rotation one step
                # (UpdateTicker + the ticker branch of GetOne)
                self._last_tick = now
                for r in self._usable.values():
                    r.cur_index += 1
            if rot is None:
                rot = self.test_and_sort(key, test_host)
            elif len(rot) == 0 or rot.cur_index >= len(rot):
                rot = self.test_and_sort(key, test_host)
            if len(rot) == 0:
                return None
            return rot.proxies[rot.cur_index]

    # --- batch bridge ---

    def ranking(
        self, test_host: str, max_latency_ms: Optional[float] = None
    ) -> list[tuple[str, int]]:
        """The ``[(proxy, latency_ms)]`` list ``frontier.assign_proxies``
        consumes — probed against ``test_host``, latency-sorted, and
        optionally speed-filtered. This is how a real deployment feeds
        the batch engine: one probe sweep per fetch round, then the
        per-request choice stays pure JVM column math."""
        # same lock as get_one: test_and_sort swaps rot.proxies and
        # resets the cursor on the shared _usable entry, and a reader
        # mid-swap can index past the new, shorter list
        with self._lock:
            rot = self.test_and_sort(host_key(test_host), test_host)
            pairs = [
                (p, int(round(d)))
                for p, d in zip(rot.proxies, rot.delays_ms)
                if max_latency_ms is None or d <= max_latency_ms
            ]
        return pairs
