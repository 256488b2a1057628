"""HTTP monitoring surface — the reference web UI's headless twin.

The reference serves a beego web app with a spider picker, run
controls, and a websocket log stream
(`/root/reference/web/pholcus-web.go:38-67`,
`web/http_controller.go:27-44`, `web/logsocket_controller.go:13-49`).
On a Spark cluster the run controls belong to the submitting process
(`tools/submit_crawl.py`) and rich dashboards attach via
``spark.sql`` over :meth:`CrawlEngine.register_views`; what remains
genuinely useful from the web surface is a cheap, read-only status
endpoint an operator (or load balancer health check) can poll while a
crawl runs. That is this module: a stdlib ``ThreadingHTTPServer`` on a
daemon thread serving JSON views over the engine's committed tables.

Endpoints:

- ``GET /status`` — snapshot id, rounds completed, cumulative lineage
  totals (pulled/fetched/deduped/failed/items/bytes), wall time.
- ``GET /rounds?n=50`` — per-round aggregated lineage, newest last.
- ``GET /partitions?round=N`` — the raw per-partition lineage rows for
  one round (the ROUNDS_SCHEMA grain).
- ``GET /spiders`` — per-spider resolved/failed counts.

Mutating run controls (round-5 close of the reference's in-browser
Stop/Pause buttons, ``web/websocket_controller.go:196-218``):

- ``POST /stop`` — graceful, RESUMABLE stop at the next round
  boundary (a round commits atomically, so this is exactly the
  kill+resume path F5 already guarantees).
- ``POST /pauseRecover`` — toggle pause↔run (the reference's
  semantics); a paused engine holds between committed rounds.
- ``POST /run`` — explicit resume.

The channel is the store's ``control.json`` (SnapshotStore
read_control/write_control), so an operator shell with store access
works exactly like the endpoints; mutation is POST-only so health
checks can never flip a crawl.

Scale notes: every answer is computed from the *committed* rounds
table — one row per (round, partition), i.e. KBs even for month-long
crawls — never from the fetch log, so a poll costs a tiny driver-side
job over a small parquet file. Responses are cached per snapshot id:
polling between commits does zero Spark work. The server binds
127.0.0.1 by default (operators tunnel in, as with the Spark UI).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F

def _round_sums():
    # built lazily: Column construction needs an active session
    return [
        F.sum(c).alias(c)
        for c in ("pulled", "fetched", "deduped", "failed", "items", "bytes")
    ]


class CrawlMonitor:
    """Serve read-only JSON status for a :class:`CrawlEngine`."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._host = host
        self._port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._cache: dict[tuple, object] = {}
        self._lock = threading.Lock()

    # --- computation (cached per committed snapshot) ---

    def _cached(self, key: tuple, fn):
        snap = self.engine.store.current_snapshot_id()
        full_key = (snap, *key)
        with self._lock:
            if full_key in self._cache:
                return self._cache[full_key]
        value = fn()
        with self._lock:
            # drop entries from older snapshots so a long poll loop
            # holds at most one snapshot's worth of tiny dicts
            stale = [k for k in self._cache if k[0] != snap]
            for k in stale:
                del self._cache[k]
            self._cache[full_key] = value
        return value

    def status(self) -> dict:
        def compute():
            eng = self.engine
            rounds = eng.rounds_df()
            # wall_ms is stamped identically on every (round, partition)
            # row, so total wall = sum of per-round max, not a raw sum
            agg = (
                rounds.groupBy("round")
                .agg(F.max("wall_ms").alias("wall_ms"), *_round_sums())
                .agg(
                    F.max("round").alias("rounds"),
                    F.sum("wall_ms").alias("wall_ms"),
                    *_round_sums(),
                )
                .first()
            )
            row = agg.asDict() if agg else {}
            return {
                "snapshot_id": eng.store.current_snapshot_id(),
                "store": eng.store.root,
                "spiders": list(getattr(eng.cfg, "spiders", ()) or ()),
                "limit": eng.cfg.limit,
                "rounds": row.get("rounds") or 0,
                "wall_ms": row.get("wall_ms") or 0,
                **{
                    c: row.get(c) or 0
                    for c in (
                        "pulled", "fetched", "deduped", "failed",
                        "items", "bytes",
                    )
                },
            }

        return self._cached(("status",), compute)

    def rounds(self, n: int = 50) -> list[dict]:
        def compute():
            df = (
                self.engine.rounds_df()
                .groupBy("round")
                .agg(*_round_sums(), F.max("wall_ms").alias("wall_ms"),
                     F.max("snapshot_id").alias("snapshot_id"))
                .orderBy(F.desc("round"))
                .limit(n)
            )
            return [r.asDict() for r in df.collect()][::-1]

        return self._cached(("rounds", n), compute)

    def partitions(self, round_no: int) -> list[dict]:
        def compute():
            df = (
                self.engine.rounds_df()
                .filter(F.col("round") == round_no)
                .orderBy("partition_id")
            )
            return [r.asDict() for r in df.collect()]

        return self._cached(("partitions", round_no), compute)

    def spiders(self) -> list[dict]:
        def compute():
            df = (
                self.engine.resolved_df()
                .groupBy("spider")
                .agg(
                    F.count("*").alias("resolved"),
                    F.sum(
                        F.when(F.col("status") == "failed", 1).otherwise(0)
                    ).alias("failed"),
                )
                .orderBy("spider")
            )
            return [r.asDict() for r in df.collect()]

        return self._cached(("spiders",), compute)

    # --- server lifecycle ---

    def start(self) -> int:
        """Bind and serve on a daemon thread; returns the bound port."""
        monitor = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *_):  # quiet: the engine owns stdout
                pass

            def do_GET(self):
                url = urlparse(self.path)
                q = parse_qs(url.query)
                try:
                    if url.path == "/status":
                        body = monitor.status()
                    elif url.path == "/rounds":
                        body = monitor.rounds(int(q.get("n", ["50"])[0]))
                    elif url.path == "/partitions":
                        body = monitor.partitions(int(q["round"][0]))
                    elif url.path == "/spiders":
                        body = monitor.spiders()
                    else:
                        self.send_error(404)
                        return
                except (KeyError, ValueError) as exc:
                    self.send_error(400, str(exc))
                    return
                except Exception as exc:  # noqa: BLE001 — a failed
                    # poll (e.g. a transient Spark error) must answer
                    # with a status line, not a dropped connection
                    self.send_error(500, type(exc).__name__)
                    return
                data = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):
                # run controls (reference stop / pauseRecover,
                # web/websocket_controller.go:196-218): write the
                # store-level control command; the engine's run() loop
                # applies it at the next round boundary. POST-only so
                # a health-check GET can never mutate the crawl.
                url = urlparse(self.path)
                store = monitor.engine.store
                try:
                    if url.path == "/stop":
                        store.write_control("stop")
                        body = {"operate": "stop"}
                    elif url.path == "/pauseRecover":
                        now = store.read_control()
                        nxt = "run" if now == "pause" else "pause"
                        store.write_control(nxt)
                        body = {"operate": "pauseRecover", "command": nxt}
                    elif url.path == "/run":
                        store.write_control("run")
                        body = {"operate": "run"}
                    else:
                        self.send_error(404)
                        return
                except Exception as exc:  # noqa: BLE001
                    self.send_error(500, type(exc).__name__)
                    return
                data = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="crawl-monitor",
            daemon=True,
        )
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    @property
    def port(self) -> int:
        assert self._server is not None, "monitor not started"
        return self._server.server_address[1]
