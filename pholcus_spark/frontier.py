"""Frontier operators — the Matrix semantics as DataFrame programs.

Reference: ``app/scheduler/matrix.go`` (priority FIFOs + dedup caches +
budget). Each function here is one operator from SURVEY.md §2.1,
expressed declaratively so Catalyst handles pushdown/pruning and AQE
handles skew:

- ``enqueue``      = Matrix.Push  (matrix.go:51-98)   — F2
- ``assign_seq``   = the FIFO enqueue counter          — F2/F3 tie-break
- ``select_batch`` = Matrix.Pull × ThreadNum           — F3/F4/F11
- ``apply_results``= DoHistory                         — F7

Scale notes (10^10-URL frontier):
- enqueue dedup is a left-anti hash join on ``url_key`` (bigint) — the
  *only* big-big join; a bloom pre-filter (``seen.py``) prunes the
  probe side before the exact join.
- ``select_batch`` windows are two-phase salted: rank within
  ``(host, salt)`` first (bounded partitions even when one host owns
  most of the frontier), then re-rank the ≤ salt_k × budget survivors
  per host. Identical output to an unsalted per-host rank.
- ``assign_seq`` is a distributed zipWithIndex (range-partition +
  per-partition offsets) — no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import SPARK_HASH_SEED  # noqa: F401  (documents the seed)

SALT_K = 8  # salted sub-queues per host in phase-1 ranking


class CacheScope:
    """Tracked ``.cache()`` handles for one engine operation.

    The engine releases exactly the DataFrames IT cached after each
    commit (``release()``), instead of ``spark.catalog.clearCache()``
    — which evicts every cache in the session and would nuke
    co-resident applications' caches on a shared cluster."""

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def add(self, df: DataFrame) -> DataFrame:
        df = df.cache()
        self._dfs.append(df)
        return df

    def release(self) -> None:
        for df in self._dfs:
            try:
                df.unpersist()
            except Exception:
                pass
        self._dfs.clear()


def _cache(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    return scope.add(df) if scope is not None else df.cache()


def with_url_key(df: DataFrame) -> DataFrame:
    """url_key = xxhash64(spider, rule, url, method) — JVM-side, matching
    the oracle's pure-Python hashing.url_key byte-for-byte.

    Reference analog: MD5(Spider+Rule+URL+Method), request.go:139-145.
    """
    return df.withColumn(
        "url_key", F.xxhash64("spider", "rule", "url", "method")
    )


def dedup_candidates(cands: DataFrame) -> DataFrame:
    """Within-batch dedup: first pushed wins (sequential Push semantics)
    — keep the candidate with the smallest ``cand_order`` per url_key.

    Hash aggregate (min_by) rather than a ranking window: partial
    aggregation combines duplicates map-side before the shuffle, and no
    sort is needed — the cheaper plan at any scale (cand_order is
    unique, so min_by is deterministic)."""
    rest = [c for c in cands.columns if c != "url_key"]
    return (
        cands.groupBy("url_key")
        .agg(F.min_by(F.struct(*rest), F.col("cand_order")).alias("_r"))
        .select("url_key", "_r.*")
    )


def _robots_rule_match(path: Column, rule: Column) -> Column:
    """One Disallow rule vs a path, RFC 9309 semantics, as a pure
    column expression: plain rules stay on the codegen ``startswith``
    fast path; rules containing ``*`` (any octet run) or a trailing
    ``$`` (end anchor) are translated to an anchored regex — escape
    the regex metacharacters, un-escape a trailing ``\\$`` back into
    an anchor, widen ``*`` to ``.*``. Twin of ``robots.rule_matches``
    and ``synthetic.robots_allows``."""
    has_wild = rule.contains("*") | rule.endswith("$")
    esc = F.regexp_replace(rule, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    esc = F.regexp_replace(esc, r"\\\$$", r"\$")
    rx = F.regexp_replace(esc, r"\*", ".*")
    return F.when(
        has_wild, F.rlike(path, F.concat(F.lit("^"), rx))
    ).otherwise(path.startswith(rule))


def _best_match_len(path: Column, rules: Column) -> Column:
    """Length of the longest rule in ``rules`` matching ``path`` (−1
    when none match): the RFC 9309 specificity measure, as one
    codegen ``aggregate`` — no explode, no Python."""
    return F.aggregate(
        F.coalesce(rules, F.array()),
        F.lit(-1),
        lambda acc, p: F.when(
            _robots_rule_match(path, p), F.greatest(acc, F.length(p))
        ).otherwise(acc),
    )


def filter_robots(cands: DataFrame, politeness: DataFrame) -> DataFrame:
    """Drop robots-disallowed URLs (north-rule addition; the reference
    has no robots support). Politeness config is a small dim table →
    broadcast join, no shuffle of the candidate side. Disallow rules
    may use RFC 9309 wildcards (``*``, trailing ``$``).

    When the politeness dim carries a ``robots_allow`` column, full
    RFC 9309 group semantics apply: the most specific matching rule
    wins between Allow and Disallow (specificity = rule octet length,
    Allow wins exact ties — ``robots.RobotsPolicy.allows`` twin).
    Without the column, the engine's conservative disallow-only subset
    is unchanged — the stored 4-column POLITENESS_SCHEMA keeps
    working, no store migration."""
    # inner join: only hosts with a politeness row are crawlable (the
    # oracle enforces the same — unknown hosts are not admitted).
    has_allow = "robots_allow" in politeness.columns
    cols = ["host", "robots_disallow"] + (
        ["robots_allow"] if has_allow else []
    )
    pol = F.broadcast(politeness.select(*cols))
    joined = cands.join(pol, "host", "inner")
    path = F.regexp_replace("url", r"^[a-z]+://[^/]+", "")
    if has_allow:
        keep = _best_match_len(path, F.col("robots_allow")) >= (
            _best_match_len(path, F.col("robots_disallow"))
        )
        return joined.filter(keep).drop("robots_disallow", "robots_allow")
    disallowed = F.exists(
        F.coalesce(F.col("robots_disallow"), F.array()),
        lambda p: _robots_rule_match(path, p),
    )
    return joined.filter(~disallowed).drop("robots_disallow")


def seen_frames(url_seen) -> list[DataFrame]:
    """Normalize a seen set to its join frames: a plain DataFrame, or
    the bucketed store's [base, delta] pair (seen_catalog.frames()) —
    kept separate because a union would discard the base scan's bucket
    partitioning + sortedness that make the confirm shuffle- and
    sort-free on the big side."""
    return list(url_seen) if isinstance(url_seen, (list, tuple)) else [url_seen]


def anti_join_frames(df: DataFrame, url_seen) -> DataFrame:
    """Fold left-anti joins over the seen frames. With [base, delta]
    the candidate side is exchanged+sorted ONCE and reused by both
    SMJs; only the small delta side ever sorts."""
    for frame in seen_frames(url_seen):
        df = df.join(frame, "url_key", "left_anti")
    return df


def anti_join_seen(cands: DataFrame, url_seen) -> DataFrame:
    """Matrix.Push's history check: drop candidates whose url_key is in
    the seen set, unless ``reloadable`` (request.go:36 opt-out)."""
    fresh = anti_join_frames(cands.filter(~F.col("reloadable")), url_seen)
    reloadable = cands.filter(F.col("reloadable"))
    return fresh.unionByName(reloadable)


SMALL_SEQ_ROWS = 65536


def assign_seq(
    cands: DataFrame,
    next_seq: int,
    scope: CacheScope | None = None,
    n_rows_hint: int | None = None,
) -> tuple[DataFrame, int]:
    """Distributed zipWithIndex: global FIFO seq numbers consistent with
    ``cand_order``, without a single-partition window. Range-partition
    by cand_order, count per partition (tiny driver metadata — one long
    per partition), then per-partition local ranks + offsets.

    Returns (df, n_rows) — the total comes free from the offsets pass,
    saving the caller a count() job per round.

    Entirely JVM-side: range shuffle → per-partition counts (tiny
    driver metadata) → row_number within partition + broadcast-joined
    offsets. No Python round-trip of the candidate rows.

    ``n_rows_hint`` is the EXACT row count when the caller already paid
    for it (the budget branches count per round): at or below
    ``SMALL_SEQ_ROWS`` the range machinery is skipped for one global
    window — on politeness-bound rounds of tens of rows the range
    partitioner's sampling pass + counts job are pure fixed overhead,
    and a single-partition sort of ≤64k cached rows is cheaper than
    either. Big rounds (or unknown counts) keep the scalable path.
    """
    if n_rows_hint is not None and n_rows_hint <= SMALL_SEQ_ROWS:
        w = Window.orderBy("cand_order")
        out = cands.withColumn(
            "seq",
            (F.row_number().over(w) - 1 + F.lit(int(next_seq))).cast("long"),
        )
        return out, int(n_rows_hint)
    spark = cands.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = cands.repartitionByRange(n_part, "cand_order").withColumn(
        "_pid", F.spark_partition_id()
    )
    # cache: the counts job and the assign job must see identical
    # partitioning (range boundaries come from sampling).
    ranged = _cache(ranged, scope)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = next_seq
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    n_rows = acc - next_seq
    if not counts:
        out = ranged.drop("_pid").withColumn("seq", F.lit(0).cast("long"))
        return out, 0
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "_pid int, _offset long",
        )
    )
    w = Window.partitionBy("_pid").orderBy("cand_order")
    out = (
        ranged.join(off_df, "_pid")
        .withColumn(
            "seq",
            (F.row_number().over(w) - 1 + F.col("_offset")).cast("long"),
        )
        .drop("_pid", "_offset")
    )
    return out, n_rows


def enqueue(
    cands: DataFrame,
    url_seen: DataFrame,
    politeness: DataFrame,
    next_seq: int,
    round_no: int,
    remaining_budget: int | None,
    sketch: DataFrame | None = None,
    remaining_by_spider: dict[str, int] | None = None,
    default_remaining: int | None = None,
    scope: CacheScope | None = None,
    pin: str = "cache",
) -> tuple[DataFrame, int]:
    """Full Matrix.Push pipeline for one round's candidate links.

    cands columns: url (canonical), host, spider, rule, method,
    priority, depth, parent_url, temp, headers, post_data, reloadable,
    try_times, cand_order (long — parse order, the FIFO tie-break
    source).
    Returns (new frontier rows (status=pending, seq assigned), count).

    With ``sketch`` (the seen_sketch bloom table), the seen check runs
    bloom-prefiltered: only 'maybe seen' rows reach the exact anti-join
    — same result, O(FPR·|cands| + dups) exact-join probe side.
    """
    cands = with_url_key(cands)
    cands = dedup_candidates(cands)
    cands = filter_robots(cands, politeness)
    if sketch is not None:
        from .seen import anti_join_seen_bloom

        cands = anti_join_seen_bloom(cands, url_seen, sketch)
    else:
        cands = anti_join_seen(cands, url_seen)
    # Pin the admitted set: downstream needs several passes (the
    # range-partitioner's sampling scan, the offsets count, the final
    # write) and the upstream chain includes shuffles + Python UDF
    # stages that must not be re-evaluated per pass.
    #
    # pin="checkpoint" (the per-round engine paths) materializes with
    # an EAGER localCheckpoint instead of a cache: the lineage is
    # TRUNCATED at the admitted set, so everything derived from it
    # (new frontier rows, the still-pending union, the bucketed seen
    # append) stays valid even after the append refreshes the seen
    # table the anti-join above read — the caller no longer needs its
    # own second checkpoint job — and the budget counts below become
    # ~free scans of materialized partitions. pin="cache" (bootstrap,
    # unit tests) keeps the evictable cache, released via the caller's
    # CacheScope after the commit.
    if pin == "checkpoint":
        cands = cands.localCheckpoint(eager=True)
    else:
        cands = _cache(cands, scope)
    # exact admitted count when a budget branch pays for one anyway —
    # lets assign_seq skip its range-partitioner on small rounds
    n_final: int | None = None
    if remaining_by_spider is not None:
        # per-spider page budget (Spider.Limit is per Matrix instance,
        # matrix.go:59-61 + spider.go:241-249): admit each spider's
        # candidates in FIFO order until ITS budget is spent. Window
        # rank per spider; skipped entirely (no sort) when no spider
        # can exceed its budget this round.
        n_cand = cands.count()
        min_rem = min(remaining_by_spider.values(), default=0)
        if n_cand > max(min_rem, 0):
            spark = cands.sparkSession
            rb = F.broadcast(
                spark.createDataFrame(
                    [(s_, max(int(r), 0)) for s_, r in remaining_by_spider.items()],
                    "spider string, _rem long",
                )
            )
            wb = Window.partitionBy("spider").orderBy("cand_order")
            # a candidate spider ABSENT from the budget map (e.g. a
            # resume with a narrowed --spiders/--keyins list) starts a
            # fresh per-spider budget, exactly like the oracle's
            # admitted_by.get(sp, 0) — coalesce to the full limit
            # (default_remaining) instead of silently zero-dropping
            fallback = max(
                int(default_remaining)
                if default_remaining is not None
                else (1 << 62),
                0,
            )
            cands = (
                cands.join(rb, "spider", "left")
                .withColumn("_rn", F.row_number().over(wb))
                .filter(
                    F.col("_rn")
                    <= F.coalesce(F.col("_rem"), F.lit(fallback))
                )
                .drop("_rn", "_rem")
            )
            if n_cand <= SMALL_SEQ_ROWS:
                # post-filter count: one cheap job over the cached base
                # that buys the small-round seq fast path below
                n_final = cands.count()
            else:
                # known-large round: the filtered count could still be
                # small, but discovering that would re-run the budget
                # join+window once just for the hint — at 10^10
                # candidates that doubles the stage. Keep the scalable
                # range path without paying the fallback count.
                n_final = -1
        else:
            n_final = n_cand
    elif remaining_budget is not None:
        # global page budget (F6, matrix.go:59-61): admit in FIFO order
        # until the budget is spent. orderBy+limit compiles to
        # TakeOrdered, which funnels everything into ONE partition —
        # only take that path when the budget actually binds; otherwise
        # admit all (identical rows) and stay fully partitioned.
        n_cand = cands.count()
        if n_cand > max(remaining_budget, 0):
            cands = cands.orderBy("cand_order").limit(max(remaining_budget, 0))
            n_final = max(remaining_budget, 0)
        else:
            n_final = n_cand
    if n_final is None:
        # no budget branch paid for a count: one cheap job over the
        # cache (which the range sampler would materialize anyway)
        # buys the small-round fast path in assign_seq — on unbudgeted
        # crawls this skips the range shuffle + sampling + counts jobs
        # entirely for every round up to SMALL_SEQ_ROWS candidates
        n_final = cands.count()
    cands, n_new = assign_seq(
        cands, next_seq, scope=scope,
        n_rows_hint=None if n_final == -1 else n_final,
    )
    out = cands.select(
        "url_key",
        "url",
        "host",
        "spider",
        "rule",
        "method",
        "priority",
        "depth",
        "seq",
        F.lit(round_no).cast("int").alias("round_enqueued"),
        "parent_url",
        "temp",
        "headers",
        "post_data",
        "reloadable",
        "try_times",
        F.lit(0).cast("int").alias("attempt"),
        F.lit("pending").alias("status"),
    )
    return out, n_new


def select_batch(
    pending: DataFrame,
    politeness: DataFrame,
    batch_size: int,
    salt_k: int = SALT_K,
    fair_share_spiders: bool = False,
    scope: CacheScope | None = None,
    age_ramp: int | None = None,
    now_seq: int = 0,
) -> DataFrame:
    """Matrix.Pull × batch: the per-round dispatch set.

    Order contract (matrix.go:101-124): highest priority first, FIFO
    (seq asc) within a priority. Politeness (F11): at most
    ``max_per_round`` rows per host per round. Hot-host skew is defused
    by two-phase ranking — phase 1 ranks within (host, salt) so no
    single task sees a whole hot host; phase 2 re-ranks the pruned
    survivors exactly. Output is identical to a direct per-host rank.

    ``age_ramp`` (an EXTENSION beyond the reference, off by default):
    starvation guard — a row's effective priority for THIS selection is
    ``priority + (now_seq − seq) div age_ramp``, i.e. it climbs one
    level per ``age_ramp`` enqueue ticks spent waiting, so a hot host's
    endless high-priority stream cannot starve an old low-priority URL
    forever. A pure codegen expression used only for ordering — stored
    priorities never change, and ties still break FIFO.
    """
    if age_ramp:
        eff = (
            F.col("priority")
            + F.floor((F.lit(int(now_seq)) - F.col("seq")) / F.lit(int(age_ramp)))
        ).cast("long")
    else:
        eff = F.col("priority")
    pol = F.broadcast(politeness.select("host", "max_per_round"))
    p = pending.join(pol, "host", "left").withColumn(
        "max_per_round", F.coalesce("max_per_round", F.lit(1))
    ).withColumn("_ep", eff)
    salt = (F.pmod(F.col("url_key"), F.lit(salt_k))).cast("int")
    w1 = Window.partitionBy("host", salt).orderBy(
        F.desc("_ep"), F.asc("seq")
    )
    p = p.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("max_per_round")
    )
    w2 = Window.partitionBy("host").orderBy(F.desc("_ep"), F.asc("seq"))
    p = p.withColumn("_r2", F.row_number().over(w2)).filter(
        F.col("_r2") <= F.col("max_per_round")
    )
    p = _cache(p.drop("_r1", "_r2", "max_per_round"), scope)
    # Global batch cap (Pull × ThreadNum). orderBy+limit is TakeOrdered
    # — a single-partition funnel. When the politeness-capped set
    # already fits the batch (the common case for a well-sized round),
    # skip it and keep the batch partitioned end-to-end; the count is a
    # cheap JVM-only agg on the cached capped set.
    if p.count() <= batch_size:
        return p.drop("_ep")
    if fair_share_spiders:
        # F4 fair share (scheduler avgRes, matrix.go:73-79): when the
        # cap binds, each spider is guaranteed batch//n_spiders slots
        # (its own priority/FIFO order); leftover slots fill globally.
        n_spiders = p.select("spider").distinct().count()
        quota = max(1, batch_size // max(n_spiders, 1))
        ws = Window.partitionBy("spider").orderBy(
            F.desc("_ep"), F.asc("seq")
        )
        ranked = _cache(p.withColumn("_rs", F.row_number().over(ws)), scope)
        guaranteed = ranked.filter(F.col("_rs") <= quota)
        # size the leftover fill from the ACTUAL guaranteed-row count —
        # a spider with fewer than `quota` pending rows frees its unused
        # slots for the global fill (matrix.go:73-79 avgRes semantics)
        n_guaranteed = guaranteed.count()
        if n_guaranteed > batch_size:
            # n_spiders > batch_size: even one row per spider overflows
            # the batch — fall back to the global order cap
            out = guaranteed.orderBy(
                F.desc("_ep"), F.asc("seq")
            ).limit(batch_size)
            return out.drop("_rs", "_ep")
        leftover_slots = batch_size - n_guaranteed
        if leftover_slots > 0:
            extra = (
                ranked.filter(F.col("_rs") > quota)
                .orderBy(F.desc("_ep"), F.asc("seq"))
                .limit(leftover_slots)
            )
            out = guaranteed.unionByName(extra)
        else:
            out = guaranteed
        return out.drop("_rs", "_ep")
    return p.orderBy(F.desc("_ep"), F.asc("seq")).limit(batch_size).drop("_ep")


def assign_proxies(
    batch: DataFrame,
    pool: list[str] | tuple[str, ...],
    max_latency_ms: int = 300,
    live: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """F12 proxy assignment (reference app/aid/proxy/proxy.go:141-197):
    speed-filter the pool, speed-rank the survivors, rotate requests
    across them keyed by url_key. The live list is config-sized, so the
    choice compiles to an element_at over an array literal — pure JVM
    column math, no join, no shuffle. Empty/filtered-out pool → NULL
    proxy (direct fetch), like the reference when no proxy is usable.

    ``live`` overrides the synthetic latencies with a real probed
    ranking (``proxypool.ProxyPool.ranking`` — one probe sweep per
    round, then the per-request choice stays driver-free)."""
    from . import synthetic

    if live is None:
        live = synthetic.live_proxies(list(pool), max_latency_ms)
    if not live:
        return batch.withColumn("proxy", F.lit(None).cast("string"))
    arr = F.array(*[F.lit(p) for p, _ in live])
    return batch.withColumn(
        "proxy",
        F.element_at(
            arr, (F.pmod("url_key", F.lit(len(live))) + 1).cast("int")
        ),
    )


def split_results(results: DataFrame, max_requeue_attempt: int = 1):
    """DoHistory (F7, matrix.go:144-169) on a fetched batch:

    - ok            → resolved 'done'
    - failed, attempt < max_requeue_attempt → silently re-queued
      (status pending, attempt+1) — the reference's first-failure
      re-queue
    - failed, attempt ≥ max_requeue_attempt → resolved 'failed' +
      recorded to the failures store (second failure)

    Returns (done, requeued, failed) DataFrames of frontier-row shape.
    """
    frontier_cols = [
        "url_key", "url", "host", "spider", "rule", "method", "priority",
        "depth", "seq", "round_enqueued", "parent_url", "temp",
        "headers", "post_data", "reloadable", "try_times", "attempt",
        "status",
    ]
    done = (
        results.filter(F.col("ok"))
        .withColumn("status", F.lit("done"))
        .select(*frontier_cols)
    )
    failed_all = results.filter(~F.col("ok"))
    requeued = (
        failed_all.filter(F.col("attempt") < max_requeue_attempt)
        .withColumn("attempt", F.col("attempt") + 1)
        .withColumn("status", F.lit("pending"))
        .select(*frontier_cols)
    )
    failed = (
        failed_all.filter(F.col("attempt") >= max_requeue_attempt)
        .withColumn("attempt", F.col("attempt") + 1)
        .withColumn("status", F.lit("failed"))
        .select(*frontier_cols)
    )
    return done, requeued, failed


def adapt_politeness(
    politeness: DataFrame,
    observations: DataFrame,
    cap: int = 64,
    floor: int = 1,
    failed_col: str = "failed",
) -> DataFrame:
    """AIMD budget adaptation: tune each host's ``max_per_round`` from
    the round it just served, TCP-style — multiplicative decrease
    (halve, floored) the moment a host shows ANY failure, additive
    increase (+1, capped) after a clean round, untouched when the host
    was not visited. robots.txt gives the static budget
    (``robots.host_budget``); this is the dynamic half a live crawler
    needs — hosts that start timing out shed load geometrically fast,
    recovered hosts win it back one slot per round, so an outage never
    oscillates.

    ``observations`` is round-sized (the fetch results); the aggregate
    shuffles only (host, failed) pairs and the result stays a
    dimension table (bounded by distinct hosts), so the whole update
    is one hash agg + one dimension-sized outer join per round.
    Unknown-but-observed hosts enter at the floor (conservative
    first contact)."""
    obs = observations.groupBy("host").agg(
        F.sum(F.col(failed_col).cast("int")).alias("_n_fail"),
        F.count("*").alias("_n"),
    )
    j = politeness.join(obs, "host", "full_outer")
    b = F.coalesce(F.col("max_per_round"), F.lit(floor))
    new_budget = (
        F.when(F.col("_n_fail") > 0,
               F.greatest(F.floor(b / 2).cast("int"), F.lit(floor)))
        .when(F.col("_n") > 0, F.least(b + 1, F.lit(cap)))
        .otherwise(b)
    )
    return j.select(
        "host",
        F.coalesce("crawl_delay_ms", F.lit(0)).alias("crawl_delay_ms"),
        "robots_disallow",
        new_budget.cast("int").alias("max_per_round"),
    )


def focused_priority(
    links: DataFrame,
    keywords: tuple[str, ...],
    anchor_col: str = "anchor",
    url_col: str = "target_url",
    anchor_weight: int = 2,
    url_weight: int = 1,
) -> DataFrame:
    """Focused-crawl (Shark-search-family) priority: score each
    discovered link by keyword overlap with its ANCHOR TEXT (the
    strongest cheap relevance signal — it describes the target) and
    its URL path tokens, anchor hits weighted above URL hits. The
    score drops straight into the frontier's ``priority`` column, so
    `select_batch`'s existing priority-ordered dispatch turns into
    best-first topical crawling with no new machinery.

    Pure projection — lowercase/split/`array_intersect` against the
    literal keyword array; integer weights keep the oracle exact.
    Rows score 0 when nothing overlaps (breadth-first tail)."""
    kw = F.array(*[F.lit(k.lower()) for k in keywords])

    def _toks(c) -> F.Column:
        return F.array_distinct(
            F.filter(
                F.split(F.lower(c), r"[^a-z0-9]+"),
                lambda t: t != "",
            )
        )

    a_hits = F.size(F.array_intersect(_toks(F.col(anchor_col)), kw))
    # path+query only: the host would match navigation keywords on
    # every single link of a site
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]*", "")
    u_hits = F.size(F.array_intersect(_toks(path), kw))
    return links.withColumn(
        "priority",
        (a_hits * anchor_weight + u_hits * url_weight).cast("int"),
    )


def politeness_by_ip(
    politeness: DataFrame,
    host_ips: DataFrame,
    per_ip_cap: int = 16,
) -> DataFrame:
    """Server-level politeness: hosts resolving to the same address
    (virtual hosting, CDN edges) must SHARE a budget — per-host
    limits alone let a thousand vhosts hammer one box. Each host's
    ``max_per_round`` is clamped to an even integer share of its
    address's cap (``floor(cap / hosts_on_ip)``, min 1); hosts with
    no resolution keep their own budget (fail-open: politeness by
    host is still enforced).

    ``host_ips`` is the DNS cache as a dimension table (host, ip) —
    the same bounded-by-hosts class as the politeness dims, so the
    whole derivation is two tiny hash aggs + dimension joins; nothing
    frontier-sized moves."""
    share = host_ips.groupBy("ip").agg(
        F.count("*").alias("_n_hosts")
    ).select(
        "ip",
        F.greatest(
            F.floor(F.lit(per_ip_cap) / F.col("_n_hosts")), F.lit(1)
        ).cast("int").alias("_ip_share"),
    )
    j = politeness.join(host_ips, "host", "left").join(share, "ip", "left")
    return j.select(
        "host",
        "crawl_delay_ms",
        "robots_disallow",
        F.least(
            F.col("max_per_round"),
            F.coalesce(F.col("_ip_share"), F.col("max_per_round")),
        ).cast("int").alias("max_per_round"),
    )


def resolve_redirects(edges: DataFrame, max_rounds: int = 6) -> DataFrame:
    """Redirect-chain resolution: collapse 3xx alias graphs into
    (src_url, final_url, n_hops, is_loop) so the seen-set and the
    frontier key on the DESTINATION identity — without this, every
    hop of a moved site is crawled as a distinct URL and the alias
    family defeats URL dedup (the reference follows redirects
    per-request inside surf.Download; here the mapping is resolved
    once, set-wide).

    Input contract: one outgoing edge per src (a URL redirects to one
    target). Pointer doubling: each round every pointer jumps through
    the CURRENT mapping, so a chain of length L resolves in ⌈log₂L⌉
    self-joins — ``max_rounds=6`` covers chains of 64 hops, far past
    any browser's redirect limit. Each round is ONE equi-join keyed on
    the pointer plus a localCheckpoint lineage cut (the
    ``neardup_components`` discipline: no exponential plan growth, no
    driver-side collect).

    Cycles (and chains longer than 2^max_rounds, which no client
    follows anyway) never reach a terminal: after the rounds their
    pointer still sits in the src set — those rows flag
    ``is_loop=true`` with NULL final/hops. The hop count for resolved
    rows is exact (doubling sums the two half-lengths)."""
    cur = edges.select(
        "src",
        F.col("dst").alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(max_rounds):
        m = cur.select(
            F.col("src").alias("m_src"),
            F.col("ptr").alias("m_ptr"),
            F.col("hops").alias("m_hops"),
        )
        cur = (
            cur.join(m, cur["ptr"] == m["m_src"], "left")
            .select(
                "src",
                F.coalesce(F.col("m_ptr"), F.col("ptr")).alias("ptr"),
                (
                    F.col("hops") + F.coalesce(F.col("m_hops"), F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    srcs = edges.select(F.col("src").alias("s_src")).distinct()
    out = cur.join(srcs, cur["ptr"] == srcs["s_src"], "left")
    unresolved = F.col("s_src").isNotNull()
    return out.select(
        F.col("src").alias("src_url"),
        F.when(~unresolved, F.col("ptr")).alias("final_url"),
        F.when(~unresolved, F.col("hops")).alias("n_hops"),
        unresolved.alias("is_loop"),
    )


def host_shards(host_load: DataFrame, n_shards: int) -> DataFrame:
    """Skew-aware host→shard assignment for fetch partitioning:
    serpentine (snake) placement after sorting by expected load —
    rank r goes to shard ``r mod n`` on even passes and the mirrored
    shard on odd passes, so each pass hands every shard exactly one
    host and consecutive passes cancel the within-pass imbalance (the
    deterministic stand-in for greedy LPT, which is inherently
    sequential). Guarantees: shard loads differ by at most one pass's
    spread; identical input → identical assignment (no RNG).

    The global rank window runs on the HOST DIMENSION (the same
    dim-sized relation the engine already broadcasts for politeness)
    — never on the frontier itself; at 10^7 hosts that is one modest
    task, and the result broadcasts back into the fetch partitioner.

    Input: (host, load) where load is the scheduling weight (pending
    count, max_per_round, observed bytes). Returns (host, load,
    shard)."""
    w = Window.orderBy(F.desc("load"), F.asc("host"))
    r = F.row_number().over(w) - 1
    fwd = F.pmod(r, F.lit(n_shards))
    shard = F.when(
        F.pmod(F.floor(r / n_shards), F.lit(2)) == 0, fwd
    ).otherwise(F.lit(n_shards - 1) - fwd)
    return host_load.select(
        "host", "load", shard.cast("int").alias("shard")
    )


def dns_resolve(
    hosts: DataFrame,
    dns_cache: DataFrame,
    now_ms: int,
    default_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """TTL'd DNS cache for the hosts a fetch round is about to touch —
    the resolution stage in front of ``politeness_by_ip`` (per-IP
    budget sharing needs host→address, and resolving every host every
    round would hammer resolvers harder than the crawl hammers
    servers; the reference's surf downloader leans on Go's resolver
    cache implicitly, here the cache is an explicit table).

    Cache rows carry (host, ip, resolved_at_ms, ttl_ms, nxdomain) —
    record-level TTLs, and NEGATIVE entries cached per RFC 2308 (an
    NXDOMAIN answer is an answer; re-asking every round is the classic
    resolver-abuse bug). Triage per host: a fresh hit serves from
    cache ('cache', or 'nxdomain' with NULL ip), anything expired or
    absent re-resolves ('resolved'). The resolver stand-in is the
    sandbox boundary — a deterministic portable-md5-derived address
    (production swaps an async bulk resolver behind the same column
    contract, like fetch_one behind fetch_batch).

    Plan: one host-keyed left join of two dim-sized frames (one row
    per host — ~10^7 at web scale, never the frontier); the fake
    resolve is a codegen projection. ``expires_at_ms`` lets the
    caller write the refreshed cache straight back."""
    j = hosts.join(dns_cache, "host", "left")
    age = F.lit(now_ms) - F.col("resolved_at_ms")
    fresh = F.col("resolved_at_ms").isNotNull() & (
        age <= F.col("ttl_ms")
    )
    from .textops import md5_long

    fake_ip = F.concat(
        F.lit("10."),
        F.pmod(md5_long(F.col("host")), F.lit(250)).cast("string"),
        F.lit("."),
        F.pmod(
            md5_long(F.concat(F.lit("b3|"), F.col("host"))), F.lit(250)
        ).cast("string"),
        F.lit(".1"),
    )
    source = (
        F.when(fresh & F.col("nxdomain"), F.lit("nxdomain"))
        .when(fresh, F.lit("cache"))
        .otherwise(F.lit("resolved"))
    )
    out_ip = (
        F.when(fresh & F.col("nxdomain"), F.lit(None).cast("string"))
        .when(fresh, F.col("ip"))
        .otherwise(fake_ip)
    )
    expires = F.when(
        fresh, (F.col("resolved_at_ms") + F.col("ttl_ms")).cast("long")
    ).otherwise(F.lit(now_ms + default_ttl_ms).cast("long"))
    return j.select(
        "host",
        out_ip.alias("ip"),
        source.alias("source"),
        expires.alias("expires_at_ms"),
    )


def fetch_health(results: DataFrame) -> DataFrame:
    """Per-host fetch-error taxonomy and health rollup — the feedback
    half of adaptive politeness (politeness_adapt consumes rates;
    this produces them with CLASSES, because a crawler reacts
    differently per failure mode: DNS/TCP/TLS/timeout mean the host
    or path is sick, 5xx means the server is, 429 means WE are the
    problem, 4xx is usually our frontier's stale links).

    Input rows: (host, status, err) — one per fetch attempt; ``err``
    is the transport error string (NULL when an HTTP response
    arrived). Classification: transport prefix match first (dns /
    timeout / tls / conn→tcp), then the status bands (5xx, 429
    throttle, other 4xx, 2xx-3xx ok).

    Health states, strictest first: ``dead`` (≥5 attempts, zero
    successes), ``throttled`` (any 429 — back off immediately,
    whatever the rates say), ``degraded`` (error rate ≥ 50%), else
    ``healthy``; ``backoff_mult`` (16/8/4/1) multiplies the host's
    crawl-delay next round. The error rate is exact integer
    permille — no float thresholds.

    One hash aggregation keyed by host (conditional sums partial-
    aggregate map-side); at 10^10 fetches the shuffle carries a
    fixed-width counter row per host."""
    err = F.col("err")
    st = F.col("status")
    cls = (
        F.when(err.startswith("dns"), F.lit("dns"))
        .when(err.startswith("timeout"), F.lit("timeout"))
        .when(err.startswith("tls"), F.lit("tls"))
        .when(err.startswith("conn"), F.lit("tcp"))
        .when(st >= 500, F.lit("http_5xx"))
        .when(st == 429, F.lit("throttled"))
        .when(st >= 400, F.lit("http_4xx"))
        .when(st >= 200, F.lit("ok"))
        .otherwise(F.lit("other"))
    )

    def _n(name: str) -> F.Column:
        return F.sum((F.col("cls") == name).cast("long")).alias(
            "n_" + name
        )

    g = (
        results.withColumn("cls", cls)
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            _n("ok"),
            F.sum(
                F.col("cls").isin("dns", "timeout", "tls", "tcp")
                .cast("long")
            ).alias("n_net"),
            _n("http_5xx"),
            _n("throttled"),
            _n("http_4xx"),
        )
    )
    # floor, not cast: double→long CAST truncates in Spark but ROUNDS
    # in DuckDB — floor is the portable integer-permille
    err_milli = F.floor(
        (F.col("n_total") - F.col("n_ok")) * 1000 / F.col("n_total")
    ).cast("long")
    g = g.withColumn("err_milli", err_milli)
    health = (
        F.when(
            (F.col("n_ok") == 0) & (F.col("n_total") >= 5), F.lit("dead")
        )
        .when(F.col("n_throttled") > 0, F.lit("throttled"))
        .when(F.col("err_milli") >= 500, F.lit("degraded"))
        .otherwise(F.lit("healthy"))
    )
    g = g.withColumn("health", health)
    return g.withColumn(
        "backoff_mult",
        F.when(F.col("health") == "dead", 16)
        .when(F.col("health") == "throttled", 8)
        .when(F.col("health") == "degraded", 4)
        .otherwise(1)
        .cast("int"),
    )


def retry_after_epoch(header, now_epoch: int, cap_s: int = 3600):
    """RFC 9110 §10.2.3 ``Retry-After`` → resume epoch. Servers send
    either delta-seconds (``120``) or an HTTP-date (``Wed, 21 Oct
    2015 07:28:00 GMT``); 429/503 responses carrying it tell the
    crawler EXACTLY when to come back, which beats any backoff
    heuristic (fetch_health's throttle ladder is the fallback when
    the header is absent). Garbage and past dates clamp to now;
    deltas clamp to ``cap_s`` (a server asking for a week gets an
    hour — the crawler's own ceiling). Pure codegen CASE/regex —
    composes as a column over the fetch-results scan."""
    h = F.trim(header)
    delta = F.when(h.rlike("^[0-9]+$"), h.cast("long"))
    # drop the day name before parsing (servers send wrong ones, and
    # Spark's strict formatter would reject the whole date for it);
    # session timezone is UTC so the GMT date parses as-is
    bare = F.regexp_replace(h, r"^[A-Za-z]{3},\s*", "")
    bare = F.regexp_replace(bare, r"\s*GMT$", "")
    date_epoch = F.unix_timestamp(
        F.try_to_timestamp(bare, F.lit("dd MMM yyyy HH:mm:ss"))
    )
    resume = (
        F.when(delta.isNotNull(), F.lit(now_epoch) + delta)
        .when(date_epoch.isNotNull(), date_epoch)
        .otherwise(F.lit(now_epoch))
    )
    lo = F.greatest(resume, F.lit(now_epoch))
    return F.least(lo, F.lit(now_epoch + cap_s)).cast("long")


def apply_health_backoff(
    politeness: DataFrame, health: DataFrame
) -> DataFrame:
    """Fold ``fetch_health``'s backoff ladder into the politeness
    dims for the next round: ``max_per_round' = max(1,
    max_per_round // backoff_mult)`` — throttled/degraded/dead hosts
    get 8×/4×/16× smaller budgets but never zero (one probe per
    round is how a dead host proves recovery; cutting to zero would
    quarantine it forever). Hosts without a health row (not fetched
    yet) keep their configured budget. Dim-sized left join, no
    windows; the output drops the health columns so it slots
    straight back into ``select_batch``."""
    j = politeness.join(
        health.select("host", "backoff_mult"), "host", "left"
    )
    mult = F.coalesce(F.col("backoff_mult"), F.lit(1))
    adjusted = F.greatest(
        F.lit(1),
        F.floor(F.col("max_per_round") / mult).cast("int"),
    )
    return j.withColumn("max_per_round", adjusted).drop("backoff_mult")
