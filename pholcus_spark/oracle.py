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
from urllib.parse import urljoin

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
    # multi-spider crawl (reference spider queue,
    # app/crawler/spiderqueue.go:56-90): names of the spiders to run;
    # None = just `spider`. Each spider shares `rules` keyed by its
    # base name and gets its own page budget (`limit` is per spider,
    # like Spider.Limit).
    spiders: tuple = ()
    # keyin fan-out (F13, spiderqueue.go:56-90 + KeyinsParse): every
    # spider expands to one instance per keyin, named "<spider>@<keyin>";
    # "{keyin}" in seed URLs is substituted per instance
    keyins: tuple = ()
    n_hosts: int = 20
    # hosts outside the synthetic h%03d.example.com universe that the
    # crawl may touch (e.g. the dynamic-rule sample's search host) —
    # they get the same deterministic robots/crawl-delay policy
    extra_hosts: tuple = ()
    batch_size: int = 20  # reference ThreadNum default, config.go:156
    limit: int | None = None  # page budget (maxPage, matrix.go:59-61)
    try_times: int = 3  # download retries, request.go:48
    max_requeue_attempt: int = 1  # first failure re-queues silently
    failure_pct: int = synthetic.FAILURE_PCT
    pausetime_ms: int = 300  # reference default, config.go:157
    round_duration_ms: int = 1000
    seed_priority: int = 1
    max_rounds: int = 10_000
    # EXTENSION knob (semantic effect on dispatch ORDER only, default
    # off so reference-fidelity ordering holds): starvation guard —
    # effective dispatch priority climbs one level per `age_ramp`
    # enqueue ticks a URL has waited (frontier.select_batch)
    age_ramp: int | None = None
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
    # EnableCookie (reference request.go:28 + context.go:110-112): keep
    # a per-(spider, host) cookie jar across rounds; responses'
    # Set-Cookie headers merge in at round commit, and the jar keys the
    # content of subsequent fetches (Surf jar, surfer/param.go:47-108).
    # Jar updates are snapshot-consistent at round boundaries — the
    # micro-batch serialization of the reference's sequential jar.
    enable_cookie: bool = False
    # Snapshot retention (engine knob, no semantic effect): when > 0,
    # expire_snapshots(keep_last=snapshot_keep) runs after each round,
    # bounding store growth on long crawls (a 10^10-URL crawl's
    # per-round `pending` overwrite would otherwise pin every dead
    # rewrite forever). 0 = keep all snapshots (full time travel).
    snapshot_keep: int = 0
    # Fetch-stage partition sizing: target rows per fetch partition
    # (caps each partition's payload output so parquet writers and the
    # Python workers' Arrow buffers stay tens-of-MB-sized at any batch
    # size; the 4x-cluster-width wave floor still applies). Engine
    # knob only — visit order/content unaffected.
    fetch_part_rows: int = 512
    # run-control poll cadence (store control.json — the reference
    # web UI's stop/pauseRecover as a store-level channel); engine
    # knob only, no semantic effect on the visit set
    control_poll_s: float = 0.25
    # F15 timer gating (app/spider/timer.go): named clocks, id →
    # {"tol_s": seconds} (countdown) or {"bell": (h, m, s),
    # "tol_days": n} (alarm). A rule with "timer": <id> pauses each
    # round's dispatch until the clock fires (driver-side RunTimer per
    # batch). Wall-time pacing only — visit order/content unaffected,
    # so the Matrix oracle ignores it.
    timers: dict = field(default_factory=dict)
    # F12 proxy pool (app/aid/proxy/proxy.go:141-197): when non-empty,
    # requests rotate across the speed-filtered, speed-ranked live
    # proxies (deterministic synthetic latencies); the routed proxy is
    # recorded per fetch row. Empty pool = direct fetch (NULL proxy).
    proxy_pool: tuple = ()
    proxy_max_latency_ms: int = 300
    # Crawler-trap guard (traps.py, engine extension beyond the
    # reference): when set, each round profiles pending ∪ discovered
    # links per (host, path-prefix) and newly-discovered links under an
    # explosive prefix are capped (default keep=0: a saturated prefix
    # admits nothing more). Keys: depth (default 2), min_urls (100),
    # min_share (0.25), keep (0). Seeds are never guarded — the guard
    # targets link discovery, not operator intent. Changes the visit
    # set by design, so the Matrix fidelity oracle only applies when
    # this is None.
    trap_guard: dict | None = None
    # AIMD politeness adaptation (frontier.adapt_politeness, engine
    # extension beyond the reference): when set, each round's fetch
    # results retune per-host max_per_round — any failure halves the
    # budget (floored), a clean round adds one slot (capped) — and the
    # adapted dims persist in the snapshot store (table "politeness"),
    # surviving resume. Keys: cap (default 64), floor (1). Changes
    # dispatch pacing over time, so the Matrix fidelity oracle only
    # applies when this is None (visit SET is unchanged — only order).
    adaptive_politeness: dict | None = None
    # Shuffle width for this crawl's frontier/commit plans (None =
    # leave the session setting). A politeness-bound crawl moves a few
    # hundred rows per round; scheduling 32 reduce tasks for that is
    # pure fixed cost, so deployments size this to batch volume (the
    # engine-visible twin of AQE's advisory coalescing, which can't
    # shrink the configured width before the first shuffle runs).
    shuffle_partitions: int | None = None


def spider_instances(cfg: "CrawlConfig") -> list[str]:
    """Expand the spider queue × keyins into instance names (the
    reference builds one Spider copy per keyin with a sub-namespaced
    history, spiderqueue.go:56-90, spider.go:108-114)."""
    bases = list(cfg.spiders) if cfg.spiders else [cfg.spider]
    if cfg.keyins:
        return [f"{b}@{k}" for b in bases for k in cfg.keyins]
    return bases


def instance_base(inst: str) -> str:
    return inst.split("@", 1)[0]


def instance_keyin(inst: str) -> str | None:
    return inst.split("@", 1)[1] if "@" in inst else None


def expand_rules(cfg: "CrawlConfig") -> dict:
    """Per-instance rule table: instances inherit their base spider's
    RuleTree (spider.go:48-59)."""
    out = {}
    for inst in spider_instances(cfg):
        base = instance_base(inst)
        for (sp, rule), rc in cfg.rules.items():
            if sp == base:
                out[(inst, rule)] = rc
    return out


def seed_url_for(inst: str, url: str) -> str:
    """Keyin substitution into seed URLs (KeyinsParse fills rule
    templates, common/util/util.go:408-432)."""
    k = instance_keyin(inst)
    return url.replace("{keyin}", k) if k else url


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
    spider: str = ""
    # per-request renderer (JsAddQueue DownloaderID, request.go:37);
    # None = the rule's configured downloader
    downloader: str | None = None
    # per-request retry budget (Request.TryTimes, request.go:48);
    # None = cfg.try_times — mirrors the engine's
    # `row.try_times or try_times_default` (fetch.py)
    try_times: int | None = None


@dataclass
class OracleResult:
    visits: list[tuple]  # (round, url_key, url, priority, seq, attempt, ok)
    url_seen: set[int]
    done: set[int]
    failed: set[int]
    items: dict[int, dict]  # url_key -> {image_id, caption, phash, fmt, w, h}
    rounds: int
    # url_key -> [Output cells] emitted by JS rule bodies (P8)
    js_items: dict = field(default_factory=dict)
    # final cookie jar: (spider, host) -> {name: value} (empty unless
    # cfg.enable_cookie)
    cookies: dict = field(default_factory=dict)
    # url_key -> routed proxy (empty unless cfg.proxy_pool)
    proxies: dict = field(default_factory=dict)


def politeness_map(cfg: CrawlConfig) -> dict[str, dict]:
    out = {}
    hosts = list(synthetic.make_hosts(cfg.n_hosts))
    hosts += [h for h in cfg.extra_hosts if h not in hosts]
    for host in hosts:
        pol = synthetic.robots_for(host, cfg.pausetime_ms)
        pol["max_per_round"] = synthetic.host_budget(
            pol["crawl_delay_ms"], cfg.round_duration_ms
        )
        out[host] = pol
    return out


def run_oracle(seeds: list[str], cfg: CrawlConfig) -> OracleResult:
    pol = politeness_map(cfg)
    instances = spider_instances(cfg)
    rules_x = expand_rules(cfg)
    seen: set[int] = set()
    pending: list[OracleRow] = []
    done: set[int] = set()
    failed: set[int] = set()
    failures_store: list[OracleRow] = []
    items: dict[int, dict] = {}
    js_items: dict[int, list] = {}
    visits: list[tuple] = []
    next_seq = 0
    admitted_by: dict[str, int] = {}
    deferred = False
    # cookie jar (EnableCookie): per-(spider, host) name→value, updated
    # at round boundaries — identical to the engine's snapshot-merge
    jar: dict[tuple[str, str], dict[str, str]] = {}
    # F12: speed-filtered, speed-ranked live proxy list (static config,
    # like the engine's broadcast assignment)
    live_proxies = synthetic.live_proxies(
        list(cfg.proxy_pool), cfg.proxy_max_latency_ms
    )
    proxies: dict[int, str] = {}

    def admit(cands: list[tuple[int, dict]]) -> None:
        """cands: (cand_order, row-dict) — Matrix.Push semantics in
        candidate order (dedup, robots, seen, per-spider budget, seq).
        The page budget is per spider instance (Spider.Limit lives in
        each Matrix, matrix.go:59-61)."""
        nonlocal next_seq
        cands = sorted(cands, key=lambda t: t[0])
        batch_keys: set[int] = set()
        for _order, c in cands:
            sp = c["spider"]
            if cfg.limit is not None and admitted_by.get(sp, 0) >= cfg.limit:
                continue
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
            admitted_by[sp] = admitted_by.get(sp, 0) + 1
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
                    spider=sp,
                    downloader=c.get("downloader"),
                    try_times=c.get("try_times"),
                )
            )
            next_seq += 1

    # --- seed round (F1, RuleTree.Root) ---
    # seeds may be raw URLs or request dicts with method/post_data
    # (the reference Request surface, request.go:20-43). Every spider
    # instance pushes the full seed list (instance-major order, like
    # the spider queue starting each crawler in sequence), with keyin
    # substitution per instance.
    seed_cands = []
    for inst_idx, inst in enumerate(instances):
        for i, raw in enumerate(seeds):
            req = raw if isinstance(raw, dict) else {"url": raw}
            # instance-scoped seeds (JS Root scripts emit per-keyin
            # URLs rather than {keyin} templates): a seed stamped with
            # a keyin only feeds the matching instances
            if req.get("keyin") is not None and (
                instance_keyin(inst) != req["keyin"]
            ):
                continue
            cu = canonicalize(seed_url_for(inst, req["url"]))
            if not cu:
                continue
            host = host_of(cu)
            method = req.get("method", "GET")
            rule = req.get("rule") or "root"
            seed_cands.append(
                (
                    (inst_idx << 44) | i,
                    {
                        "url_key": make_url_key(inst, rule, cu, method),
                        "url": cu,
                        "host": host,
                        "rule": rule,
                        "priority": req.get("priority", cfg.seed_priority),
                        "depth": 0,
                        "method": method,
                        "post_data": req.get("post_data"),
                        "spider": inst,
                        "downloader": req.get("downloader"),
                        "try_times": req.get("try_times"),
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
        if len(candidates) > cfg.batch_size and len(instances) > 1:
            # F4 fair share across spiders (scheduler avgRes,
            # matrix.go:73-79; mirrors frontier.select_batch): each
            # spider present is guaranteed batch//n slots in its own
            # order; unused slots fill globally.
            present = sorted({r.spider for r in candidates})
            quota = max(1, cfg.batch_size // max(len(present), 1))
            rank: dict[str, int] = {}
            guaranteed, rest = [], []
            for r in candidates:  # already in global order
                rank[r.spider] = rank.get(r.spider, 0) + 1
                (guaranteed if rank[r.spider] <= quota else rest).append(r)
            if len(guaranteed) > cfg.batch_size:
                batch = guaranteed[: cfg.batch_size]
            else:
                batch = guaranteed + rest[: cfg.batch_size - len(guaranteed)]
        else:
            batch = candidates[: cfg.batch_size]
        batch_keys = {r.url_key for r in batch}
        pending = [r for r in pending if r.url_key not in batch_keys]

        # --- fetch + DoHistory ---
        round_cands: list[tuple[int, dict]] = []
        round_ck: dict[tuple[str, str, str], str] = {}
        for row in batch:
            tries = row.try_times or cfg.try_times
            base = row.attempt * tries
            req_cookies = (
                jar.get((row.spider, row.host)) if cfg.enable_cookie else None
            )
            dl = row.downloader or rules_x.get((row.spider, row.rule), {}).get(
                "downloader", "surf"
            )
            res = None
            for i in range(tries):
                res = synthetic.fetch_one(
                    row.url, row.depth, base + i, cfg.n_hosts, cfg.failure_pct,
                    cfg.img_px_scale, method=row.method,
                    post_data=row.post_data, cookies=req_cookies,
                    downloader=dl,
                )
                if res.ok:
                    break
            visits.append(
                (rnd, row.url_key, row.url, row.priority, row.seq,
                 row.attempt, res.ok)
            )
            if cfg.proxy_pool:
                proxies[row.url_key] = synthetic.assign_proxy(
                    row.url_key, live_proxies
                )
            if res.ok:
                done.add(row.url_key)
                if cfg.enable_cookie and res.set_cookies:
                    for n, v in res.set_cookies.items():
                        k = (row.spider, row.host, n)
                        if k not in round_ck or v > round_ck[k]:
                            round_ck[k] = v
                if res.image_id is not None:  # HEAD: no body, no item
                    items[row.url_key] = {
                        "image_id": res.image_id,
                        "caption": res.caption,
                        "phash": res.phash,
                        "fmt": res.fmt,
                        "w": res.w,
                        "h": res.h,
                    }
                rule_cfg = rules_x.get((row.spider, row.rule), {})
                child_rule = rule_cfg.get("child_rule")
                n_emitted = 0
                if child_rule is not None and row.depth < rule_cfg.get("max_depth", 0):
                    for link in res.links:
                        cu = canonicalize(link)
                        if not cu:
                            continue
                        round_cands.append(
                            (
                                (row.seq << 20) | n_emitted,
                                {
                                    "url_key": make_url_key(
                                        row.spider, child_rule, cu, "GET"
                                    ),
                                    "url": cu,
                                    "host": host_of(cu),
                                    "rule": child_rule,
                                    "priority": rule_cfg.get("child_priority", 0),
                                    "depth": row.depth + 1,
                                    "parent_url": row.url,
                                    "spider": row.spider,
                                },
                            )
                        )
                        n_emitted += 1
                # P9 form rule: the engine DOM-scrapes the page's login
                # form and enqueues its submit request; the oracle
                # predicts that request DIRECTLY from the synthetic
                # parameters (login_form_request — string construction,
                # no parse), so equality proves the structural
                # extraction is lossless.
                form_cfg = rule_cfg.get("form")
                if (
                    form_cfg is not None
                    and rule_cfg.get("parse") == "dom"
                    and row.depth < rule_cfg.get("max_depth", 0)
                    and synthetic.page_has_login_form(row.url)
                ):
                    req = synthetic.login_form_request(
                        row.url, row.host, form_cfg.get("inputs")
                    )
                    fcu = canonicalize(req["url"])
                    frule = form_cfg.get("rule", row.rule)
                    if fcu:
                        round_cands.append(
                            (
                                (row.seq << 20) | n_emitted,
                                {
                                    "url_key": make_url_key(
                                        row.spider, frule, fcu, req["method"]
                                    ),
                                    "url": fcu,
                                    "host": host_of(fcu),
                                    "rule": frule,
                                    "priority": form_cfg.get("priority", 0),
                                    "depth": row.depth + 1,
                                    "parent_url": row.url,
                                    "method": req["method"],
                                    "post_data": req["post_data"],
                                    "spider": row.spider,
                                },
                            )
                        )
                        n_emitted += 1
                # P8 dynamic rule: run the compiled <Script> body over
                # the page; Output cells and JsAddQueue children mirror
                # the engine's fetch-pass execution exactly (same
                # interpreter, same page). AddQueue children are
                # depth-independent (context.go:104-125).
                if rule_cfg.get("js_parse") is not None:
                    from .jsrules import JsError, JsParseCtx, run_js

                    page = synthetic.html_page_for(
                        row.url, row.depth, cfg.n_hosts,
                        method=row.method, post_data=row.post_data,
                        cookies=req_cookies, downloader=dl,
                    )
                    # temp parity with the engine: a per-REQUEST
                    # downloader travels in temp["__downloader"]
                    # (fetch.py passes row.temp; the oracle models that
                    # one key as OracleRow.downloader — None when the
                    # rule default applies, so GetTemp matches)
                    jctx = JsParseCtx(
                        page, row.url, instance_keyin(row.spider),
                        temp=(
                            {"__downloader": row.downloader}
                            if row.downloader else None
                        ),
                        method=row.method, rule=row.rule,
                        spider=row.spider,
                    )
                    try:
                        run_js(rule_cfg["js_parse"], {"ctx": jctx})
                    except JsError:
                        # same recover-and-keep-partial semantics as the
                        # engine (fetch.py run_js catch; parsejs.go:126)
                        pass
                    if jctx.outputs:
                        js_items[row.url_key] = jctx.outputs
                    for q in jctx.queued:
                        qu = q["url"]
                        if not qu:
                            continue
                        cu = canonicalize(urljoin(row.url, qu))
                        if not cu:
                            continue
                        method_q = q["method"] or "GET"
                        rule_q = q["rule"] or row.rule
                        round_cands.append(
                            (
                                (row.seq << 20) | n_emitted,
                                {
                                    "url_key": make_url_key(
                                        row.spider, rule_q, cu, method_q
                                    ),
                                    "url": cu,
                                    "host": host_of(cu),
                                    "rule": rule_q,
                                    "priority": q["priority"],
                                    "depth": row.depth + 1,
                                    "parent_url": row.url,
                                    "method": method_q,
                                    "post_data": q["post_data"],
                                    "spider": row.spider,
                                    "downloader": q["downloader"],
                                    # JsAddQueue TryTimes wins; else
                                    # inherit the parent's (fetch.py)
                                    "try_times": (
                                        q.get("try_times")
                                        if q.get("try_times") is not None
                                        else row.try_times
                                    ),
                                },
                            )
                        )
                        n_emitted += 1
            else:
                if row.attempt < cfg.max_requeue_attempt:
                    row.attempt += 1
                    pending.append(row)  # first failure: silent re-queue
                else:
                    row.attempt += 1
                    failed.add(row.url_key)
                    failures_store.append(row)

        # jar merge at the round boundary (engine: cookies-table commit)
        for (sp, h, n), v in round_ck.items():
            jar.setdefault((sp, h), {})[n] = v

        admit(round_cands)
        rnd += 1

    return OracleResult(
        visits=visits,
        url_seen=seen,
        done=done,
        failed=failed,
        items=items,
        js_items=js_items,
        rounds=rnd,
        cookies=jar,
        proxies=proxies,
    )
