"""Pure-Python reference-semantics oracle — the fidelity contract.

This is the deterministic serialization of Pholcus's Matrix semantics
(SURVEY.md §7 "what's hard"): a single-threaded Pull loop with
batch = ThreadNum, priority-descending FIFO queues
(``app/scheduler/matrix.go:101-124``), Push-time dedup against the
seen set (``matrix.go:51-98``), page budget (``matrix.go:59-61``),
first-failure silent re-queue / second-failure record
(``matrix.go:144-169``), and the end-of-crawl single re-admission of
failures (``matrix.go:172-204``).

The Spark engine (``crawler.py``) must reproduce, under the same seed
list + politeness budget:
- the per-round visit ordering this oracle emits, and
- the final URL-seen set,
which the pytest suite asserts exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import synthetic
from .hashing import url_key as make_url_key
from .urlnorm import canonicalize, host_of


@dataclass
class CrawlConfig:
    spider: str = "imgspider"
    rules: dict = field(
        default_factory=lambda: {
            ("imgspider", "root"): {"child_rule": "page", "max_depth": 3,
                                    "child_priority": 0},
            ("imgspider", "page"): {"child_rule": "page", "max_depth": 3,
                                    "child_priority": 0},
        }
    )
    n_hosts: int = 20
    batch_size: int = 20  # reference ThreadNum default, config.go:156
    limit: int | None = None  # page budget (maxPage, matrix.go:59-61)
    try_times: int = 3  # download retries, request.go:48
    max_requeue_attempt: int = 1  # first failure re-queues silently
    failure_pct: int = synthetic.FAILURE_PCT
    pausetime_ms: int = 300  # reference default, config.go:157
    round_duration_ms: int = 1000
    seed_priority: int = 1
    max_rounds: int = 10_000
    # engine-only knob (no semantic effect): bloom-prefilter the seen
    # check via the seen_sketch table — identical results, smaller
    # exact-join probe side (north-rule 10^10-frontier path)
    use_bloom: bool = False
    # engine-only knob (no semantic effect): store url_seen as a
    # bucketed table so the confirm join never shuffles the seen side
    # (seen_catalog.py); 0 disables (plain per-round parquet appends).
    # At the 10^10-key design point use ~2^13 buckets.
    seen_buckets: int = 32
    # payload-size multiplier for benchmarks (1 = 24-56 px test images)
    img_px_scale: int = 1


@dataclass
class OracleRow:
    url_key: int
    url: str
    host: str
    rule: str
    priority: int
    depth: int
    seq: int
    attempt: int
    parent_url: str | None = None
    method: str = "GET"
    post_data: str | None = None


@dataclass
class OracleResult:
    visits: list[tuple]  # (round, url_key, url, priority, seq, attempt, ok)
    url_seen: set[int]
    done: set[int]
    failed: set[int]
    items: dict[int, dict]  # url_key -> {image_id, caption, phash, fmt, w, h}
    rounds: int


def politeness_map(cfg: CrawlConfig) -> dict[str, dict]:
    out = {}
    for host in synthetic.make_hosts(cfg.n_hosts):
        pol = synthetic.robots_for(host, cfg.pausetime_ms)
        pol["max_per_round"] = synthetic.host_budget(
            pol["crawl_delay_ms"], cfg.round_duration_ms
        )
        out[host] = pol
    return out


def run_oracle(seeds: list[str], cfg: CrawlConfig) -> OracleResult:
    pol = politeness_map(cfg)
    seen: set[int] = set()
    pending: list[OracleRow] = []
    done: set[int] = set()
    failed: set[int] = set()
    failures_store: list[OracleRow] = []
    items: dict[int, dict] = {}
    visits: list[tuple] = []
    next_seq = 0
    admitted = 0
    deferred = False

    def admit(cands: list[tuple[int, dict]]) -> None:
        """cands: (cand_order, row-dict) — Matrix.Push semantics in
        candidate order (dedup, robots, seen, budget, seq)."""
        nonlocal next_seq, admitted
        cands = sorted(cands, key=lambda t: t[0])
        batch_keys: set[int] = set()
        for _order, c in cands:
            if cfg.limit is not None and admitted >= cfg.limit:
                break
            key = c["url_key"]
            if key in batch_keys or key in seen:
                continue
            host_pol = pol.get(c["host"])
            if host_pol is None:
                continue
            path = c["url"].split(c["host"], 1)[-1]
            if not synthetic.robots_allows(path, host_pol["robots_disallow"]):
                continue
            batch_keys.add(key)
            seen.add(key)
            admitted += 1
            pending.append(
                OracleRow(
                    url_key=key,
                    url=c["url"],
                    host=c["host"],
                    rule=c["rule"],
                    priority=c["priority"],
                    depth=c["depth"],
                    seq=next_seq,
                    attempt=0,
                    parent_url=c.get("parent_url"),
                    method=c.get("method", "GET"),
                    post_data=c.get("post_data"),
                )
            )
            next_seq += 1

    # --- seed round (F1, RuleTree.Root) ---
    # seeds may be raw URLs or request dicts with method/post_data
    # (the reference Request surface, request.go:20-43)
    seed_cands = []
    for i, raw in enumerate(seeds):
        req = raw if isinstance(raw, dict) else {"url": raw}
        cu = canonicalize(req["url"])
        if not cu:
            continue
        host = host_of(cu)
        method = req.get("method", "GET")
        seed_cands.append(
            (
                i,
                {
                    "url_key": make_url_key(cfg.spider, "root", cu, method),
                    "url": cu,
                    "host": host,
                    "rule": "root",
                    "priority": cfg.seed_priority,
                    "depth": 0,
                    "method": method,
                    "post_data": req.get("post_data"),
                },
            )
        )
    admit(seed_cands)

    rnd = 0
    while rnd < cfg.max_rounds:
        if not pending:
            # CanStop (matrix.go:172-204): drain-time single re-Push of
            # the failure store.
            if failures_store and not deferred:
                deferred = True
                for row in failures_store:
                    failed.discard(row.url_key)
                    pending.append(row)
                failures_store = []
                continue
            break

        # --- select batch (Pull × ThreadNum + politeness budget) ---
        by_host: dict[str, list[OracleRow]] = {}
        for row in pending:
            by_host.setdefault(row.host, []).append(row)
        candidates: list[OracleRow] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r.priority, r.seq))
            candidates.extend(rows[: pol[host]["max_per_round"]])
        candidates.sort(key=lambda r: (-r.priority, r.seq))
        batch = candidates[: cfg.batch_size]
        batch_keys = {r.url_key for r in batch}
        pending = [r for r in pending if r.url_key not in batch_keys]

        # --- fetch + DoHistory ---
        round_cands: list[tuple[int, dict]] = []
        for row in batch:
            base = row.attempt * cfg.try_times
            res = None
            for i in range(cfg.try_times):
                res = synthetic.fetch_one(
                    row.url, row.depth, base + i, cfg.n_hosts, cfg.failure_pct,
                    cfg.img_px_scale, method=row.method,
                    post_data=row.post_data,
                )
                if res.ok:
                    break
            visits.append(
                (rnd, row.url_key, row.url, row.priority, row.seq,
                 row.attempt, res.ok)
            )
            if res.ok:
                done.add(row.url_key)
                if res.image_id is not None:  # HEAD: no body, no item
                    items[row.url_key] = {
                        "image_id": res.image_id,
                        "caption": res.caption,
                        "phash": res.phash,
                        "fmt": res.fmt,
                        "w": res.w,
                        "h": res.h,
                    }
                rule_cfg = cfg.rules.get((cfg.spider, row.rule), {})
                child_rule = rule_cfg.get("child_rule")
                if child_rule is not None and row.depth < rule_cfg.get("max_depth", 0):
                    for idx, link in enumerate(res.links):
                        cu = canonicalize(link)
                        if not cu:
                            continue
                        round_cands.append(
                            (
                                (row.seq << 20) | idx,
                                {
                                    "url_key": make_url_key(
                                        cfg.spider, child_rule, cu, "GET"
                                    ),
                                    "url": cu,
                                    "host": host_of(cu),
                                    "rule": child_rule,
                                    "priority": rule_cfg.get("child_priority", 0),
                                    "depth": row.depth + 1,
                                    "parent_url": row.url,
                                },
                            )
                        )
            else:
                if row.attempt < cfg.max_requeue_attempt:
                    row.attempt += 1
                    pending.append(row)  # first failure: silent re-queue
                else:
                    row.attempt += 1
                    failed.add(row.url_key)
                    failures_store.append(row)

        admit(round_cands)
        rnd += 1

    return OracleResult(
        visits=visits,
        url_seen=seen,
        done=done,
        failed=failed,
        items=items,
        rounds=rnd,
    )
