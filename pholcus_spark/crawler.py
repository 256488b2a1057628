"""The crawl engine — Structured-Streaming-style micro-batch rounds.

Each round is one deterministic DataFrame job chain committed as one
snapshot (the Iceberg-style store in ``tables.py``):

    select batch (F3/F4/F11) → fetch UDF (D1-D4) → parse (P1-P3)
    → dedup + enqueue (F2/F6) → DoHistory (F7) → commit (F9/S1)
    → loop until CanStop (F8, incl. the drain-time failure re-Push)

Reference lifecycle being reproduced: ``crawler.Run`` dispatch loop
(``app/crawler/crawler.go:63-109``) + ``Process``
(``crawler.go:112-174``), serialized per the fidelity contract
(oracle.py). Driver-side state is only the loop counter + small
manifest metadata (next_seq, admitted, deferred) — everything else
lives in tables, which is what makes kill-and-resume trivial.
(Driver meta is next_seq, per-spider admitted_by, deferred,
run_start_round, seen_gen — a dozen scalars.)

Tables (FIXTURES.md §2-7):
- ``pending``   (overwrite/round)  the active queue — stays small
- ``resolved``  (append)           done/failed rows + visit_round
- ``visits``    (append)           per-round dispatch log (fidelity)
- ``url_seen``  (append)           every admitted url_key
- ``failures``  (append)           second-failure store
- ``items``     (append)           image+caption payload rows
- ``rounds``    (append)           per-partition lineage metrics
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import frontier as FR
from . import seen as SEEN
from . import synthetic
from . import traps as TRAPS
from .fetch import fetch_batch, links_to_candidates
from .oracle import (
    CrawlConfig,
    expand_rules,
    instance_keyin,
    politeness_map,
    seed_url_for,
    spider_instances,
)
from .schemas import (
    COOKIES_SCHEMA,
    FAILURES_SCHEMA,
    FETCH_RESULT_SCHEMA,
    FRONTIER_SCHEMA,
    ITEMS_SCHEMA,
    POLITENESS_SCHEMA,
    ROUNDS_SCHEMA,
    SEEN_SKETCH_SCHEMA,
    URL_SEEN_SCHEMA,
)
from .tables import SnapshotStore
from .urlnorm import canonicalize, host_of

RESOLVED_SCHEMA = T.StructType(
    FRONTIER_SCHEMA.fields + [T.StructField("visit_round", T.IntegerType(), False)]
)
VISITS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url_key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

# the fetched log — one row per dispatched URL per round, adopted
# zero-copy from the round's staged fetch output. items / visits /
# resolved / failures are VIEWS over this log (single write of the
# payload bytes per round; the Iceberg add-files pattern).
FETCHED_SCHEMA = T.StructType(
    FETCH_RESULT_SCHEMA.fields
    + [
        T.StructField("visit_round", T.IntegerType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("download_time", T.StringType(), False),
    ]
)

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]


def _norm_headers(h: dict) -> dict:
    """Seed-request headers → multi-value form (http.Header is
    map[string][]string, request.go:24): scalar values become
    one-element lists; list values pass through."""
    return {
        k: list(v) if isinstance(v, (list, tuple)) else [v]
        for k, v in h.items()
    }


class CrawlEngine:
    def __init__(self, spark: SparkSession, store: SnapshotStore, cfg: CrawlConfig):
        self.spark = spark
        self.store = store
        self.cfg = cfg
        self._politeness = self._build_politeness()
        # spider queue × keyin expansion (spiderqueue.go:56-90): the
        # engine crawls all instances through one frontier, with
        # fair-share batching and per-instance budgets
        self._instances = spider_instances(cfg)
        self._rules = expand_rules(cfg)
        self._multi = len(self._instances) > 1
        # F15 timer gating (app/spider/timer.go): named clocks from
        # cfg.timers; rules carrying "timer": <id> pause the round's
        # dispatch until that clock fires (RunTimer per batch — the
        # micro-batch serialization of per-page pacing). Swap
        # ``self.timer`` for an injected-clock Timer in tests.
        from .timer import Bell, Timer

        self.timer = Timer()
        for tid, spec in getattr(cfg, "timers", {}).items():
            bell = Bell(*spec["bell"]) if "bell" in spec else None
            tol = spec["tol_days"] if bell is not None else spec["tol_s"]
            if not self.timer.set(tid, tol, bell):
                # a silently-unregistered clock would drop rule pacing
                # with no signal (timer.sleep on an unknown id no-ops)
                raise ValueError(
                    f"invalid timer {tid!r}: tol={tol!r} bell={bell!r}"
                )
        self._timer_rules = {
            k for k, rc in self._rules.items() if rc.get("timer")
        }
        self._migrate_v1_headers()
        self._seen_cat = None
        if getattr(cfg, "seen_buckets", 0):
            from .seen_catalog import BucketedSeen

            self._seen_cat = BucketedSeen(spark, store.root, cfg.seen_buckets)
            self._open_seen_catalog()

    def _migrate_v1_headers(self) -> None:
        """Store-format upgrade: ``headers`` widened from
        map<string,string> to map<string,array<string>> (multi-value
        http.Header, request.go:24) with no on-disk migration at the
        time — resuming a pre-change store failed at parquet read of
        pending/fetched. Detect the old value type in the parquet
        footer and rewrite those tables once (scalar values wrapped
        into one-element arrays), stamping the manifest so later opens
        skip the footer check."""
        manifest = self.store.read_manifest()
        meta = manifest.get("meta", {})
        if int(meta.get("headers_format", 0)) >= 2:
            return
        tables = manifest.get("tables", {})
        writes: dict = {}
        for name, schema in (("pending", FRONTIER_SCHEMA),
                             ("fetched", FETCHED_SCHEMA)):
            files = tables.get(name, [])
            if not files:
                continue
            first = os.path.join(self.store.root, "data", files[0])
            actual = self.spark.read.parquet(first).schema
            h = next((f for f in actual.fields if f.name == "headers"), None)
            if (
                h is None
                or not isinstance(h.dataType, T.MapType)
                or isinstance(h.dataType.valueType, T.ArrayType)
            ):
                continue  # already multi-value (post-change, pre-stamp)
            legacy = T.StructType([
                T.StructField(
                    f.name, T.MapType(T.StringType(), T.StringType()),
                    f.nullable,
                ) if f.name == "headers" else f
                for f in schema.fields
            ])
            paths = [os.path.join(self.store.root, "data", f) for f in files]
            df = self.spark.read.schema(legacy).parquet(*paths).withColumn(
                "headers",
                F.transform_values("headers", lambda _k, v: F.array(v)),
            )
            writes[name] = (df, "overwrite")
        if writes:
            self.store.commit(
                int(meta.get("round", 0)), writes,
                meta={"headers_format": 2},
            )

    def _open_seen_catalog(self) -> None:
        """Register the bucketed url_seen table over the committed
        snapshot (reconciling torn-commit orphans); a store written in
        plain (non-bucketed) mode is migrated in place.

        The bucket count is part of the on-disk layout: part files carry
        their bucket id, and Spark TRUSTS the declared HashPartitioning
        — re-registering old files under a different width would
        mis-co-partition the confirm anti-join and silently re-admit
        seen URLs. The width is therefore recorded in the manifest meta
        (``seen_buckets``); reopening with a different
        ``CrawlConfig.seen_buckets`` transparently rewrites the keys
        into a fresh generation at the new width."""
        manifest = self.store.read_manifest()
        meta = manifest.get("meta", {})
        files = manifest["tables"].get("url_seen", [])
        gen = int(meta.get("seen_gen", 0))
        stored_k = meta.get("seen_buckets")
        from .seen_catalog import DELTA_PREFIX, GEN_PREFIX

        if files and not all(
            f.startswith((GEN_PREFIX, DELTA_PREFIX)) for f in files
        ):
            # migration: load the plain table, rewrite as a compact
            # bucketed base (one sorted file per bucket), commit
            self._seen_cat.open(gen, [])
            plain = self.store.load(self.spark, "url_seen", URL_SEEN_SCHEMA)
            new_files = self._seen_cat.bulk_load(plain, gen)
            self.store.commit(
                int(meta.get("round", 0)),
                {},
                meta={**meta, "seen_gen": gen,
                      "seen_buckets": self._seen_cat.n_buckets},
                registered={"url_seen": (new_files, "overwrite")},
            )
            self._seen_cat.open(gen, new_files)
            return
        if files and stored_k is not None and int(stored_k) != self._seen_cat.n_buckets:
            # width change: rewrite into gen+1's base at the new width
            # (the part files are plain parquet — read by path,
            # re-bucket); open() then GCs the old generation dirs
            new_gen = gen + 1
            data_dir = os.path.join(self.store.root, "data")
            src = self.spark.read.schema("url_key BIGINT").parquet(
                *[os.path.join(data_dir, f) for f in files]
            )
            new_files = self._seen_cat.bulk_load(src, new_gen)
            self.store.commit(
                int(meta.get("round", 0)),
                {},
                meta={**meta, "seen_gen": new_gen,
                      "seen_buckets": self._seen_cat.n_buckets},
                registered={"url_seen": (new_files, "overwrite")},
            )
            self._seen_cat.open(new_gen, new_files)
            return
        self._seen_cat.open(gen, files)
        if files and stored_k is None:
            # legacy store predating the width stamp: record the width
            # it is being (and always was) read with
            self.store.commit(
                int(meta.get("round", 0)),
                {},
                meta={**meta, "seen_buckets": self._seen_cat.n_buckets},
            )

    def _url_seen_df(self) -> DataFrame:
        """The full seen set as ONE DataFrame (whole-set consumers:
        bloom sketch rebuild, exports)."""
        if self._seen_cat is not None:
            return self._seen_cat.df()
        return self.load("url_seen", URL_SEEN_SCHEMA)

    def _url_seen_frames(self):
        """The seen set for the confirm anti-join: the bucketed
        store's [base, delta] frame pair (candidate-side-only Exchange,
        no Sort above the base scan), else the manifest-listed parquet
        files as one frame."""
        if self._seen_cat is not None:
            return self._seen_cat.frames()
        return self.load("url_seen", URL_SEEN_SCHEMA)

    def _build_politeness(self) -> DataFrame:
        rows = [
            (
                h,
                p["crawl_delay_ms"],
                p["robots_disallow"],
                p["max_per_round"],
            )
            for h, p in politeness_map(self.cfg).items()
        ]
        return self.spark.createDataFrame(rows, POLITENESS_SCHEMA)

    def _round_politeness(self) -> DataFrame:
        """The dims `select_batch` paces this round with. Static unless
        ``cfg.adaptive_politeness`` is on, in which case hosts the AIMD
        loop has already retuned (persisted table "politeness",
        written each round, survives resume) override their static
        rows — both frames are dimension-sized, so the anti-join/union
        costs nothing at frontier scale."""
        if self.cfg.adaptive_politeness is None:
            return self._politeness
        adapted = self.load("politeness", POLITENESS_SCHEMA)
        return adapted.unionByName(
            self._politeness.join(
                adapted.select("host"), "host", "left_anti"
            )
        )

    # --- state accessors ---

    def _meta(self) -> dict:
        return self.store.read_manifest().get("meta", {})

    def load(self, table: str, schema) -> DataFrame:
        return self.store.load(self.spark, table, schema)

    def _admitted_by(self, meta: dict) -> dict[str, int]:
        """Per-spider admitted counters (the per-Matrix maxPage,
        matrix.go:59-61); legacy single-spider stores carry a scalar."""
        ab = meta.get("admitted_by")
        if ab is not None:
            return {str(k): int(v) for k, v in ab.items()}
        legacy = int(meta.get("admitted", 0))
        return {self.cfg.spider: legacy} if legacy else {}

    def _remaining_by(self, meta: dict) -> dict[str, int] | None:
        if self.cfg.limit is None:
            return None
        ab = self._admitted_by(meta)
        return {
            inst: self.cfg.limit - ab.get(inst, 0)
            for inst in self._instances
        }

    def _count_by_spider(self, new_rows: DataFrame) -> dict[str, int]:
        return {
            r["spider"]: r["n"]
            for r in new_rows.groupBy("spider").agg(
                F.count("*").alias("n")
            ).collect()
        }

    # --- bootstrap (F1: RuleTree.Root seed generation) ---

    def bootstrap(self, seeds: list | DataFrame) -> None:
        """Seed the frontier (F1). ``seeds`` is a list of raw URLs (or
        request dicts with optional ``method``/``post_data``/
        ``headers`` — the reference's full Request surface,
        request.go:20-43) or a DataFrame with columns (url string,
        cand_order long) — the DataFrame path keeps a multi-million-seed
        bootstrap fully executor-side (canonicalization runs in an
        Arrow-batched UDF, nothing funnels through the driver)."""
        if self.store.current_snapshot_id() is not None:
            return  # resume path: state already in the store
        t0 = time.time()
        _timing = os.environ.get("PHOLCUS_TIMING") == "1"
        _marks: list[tuple[str, float]] = []

        def _mark(label: str) -> None:
            if _timing:
                _marks.append((label, time.time()))
        cfg = self.cfg
        if isinstance(seeds, DataFrame):
            if cfg.keyins:
                raise ValueError(
                    "keyin substitution requires list seeds (the DataFrame"
                    " path is the mass-bootstrap fast lane)"
                )
            base = self._canonicalize_seed_df(seeds)
            # every spider instance pushes the full seed list (the
            # spider queue starts each crawler over its own Root seeds)
            inst_df = F.broadcast(
                self.spark.createDataFrame(
                    [(inst, idx) for idx, inst in enumerate(self._instances)],
                    "spider string, _inst_idx long",
                )
            )
            base = base.crossJoin(inst_df).select(
                "url",
                "host",
                "spider",
                (
                    F.shiftleft(F.col("_inst_idx"), 44) + F.col("cand_order")
                ).alias("cand_order"),
                F.lit("GET").alias("method"),
                F.lit(None).cast("string").alias("post_data"),
                F.lit(None).cast("string").alias("headers_json"),
            )
        else:
            import json

            import pandas as pd

            rows = []
            for inst_idx, inst in enumerate(self._instances):
                for i, raw in enumerate(seeds):
                    req = raw if isinstance(raw, dict) else {"url": raw}
                    # instance-scoped seeds (JS Root scripts emit
                    # per-keyin URLs, not {keyin} templates): a seed
                    # stamped with a keyin feeds only matching instances
                    if req.get("keyin") is not None and (
                        instance_keyin(inst) != req["keyin"]
                    ):
                        continue
                    cu = canonicalize(seed_url_for(inst, req["url"]))
                    if not cu:
                        continue
                    temp = None
                    if req.get("downloader"):
                        # per-request renderer rides temp (fetch reads
                        # temp["__downloader"], request.go:37)
                        temp = json.dumps(
                            {"__downloader": req["downloader"]}
                        )
                    rows.append(
                        (
                            cu,
                            host_of(cu),
                            inst,
                            (inst_idx << 44) | i,
                            req.get("rule") or "root",
                            req.get("method", "GET"),
                            int(req.get("priority", cfg.seed_priority)),
                            req.get("post_data"),
                            json.dumps(_norm_headers(req["headers"]))
                            if req.get("headers")
                            else None,
                            temp,
                            req.get("try_times"),
                        )
                    )
            # Arrow path: ship only the data columns as a pandas frame —
            # the constant request fields are derived JVM-side, no
            # row-at-a-time Python pickling. Headers travel as JSON and
            # become a map column via from_json (Arrow-safe).
            pdf = pd.DataFrame(
                rows,
                columns=[
                    "url", "host", "spider", "cand_order", "rule",
                    "method", "priority", "post_data", "headers_json",
                    "temp_json", "try_times_req",
                ],
            )
            base = self.spark.createDataFrame(
                pdf,
                schema="url string, host string, spider string, "
                "cand_order long, rule string, method string, "
                "priority int, post_data string, headers_json string, "
                "temp_json string, try_times_req int",
            )
        if "rule" not in base.columns:
            base = base.withColumn("rule", F.lit("root")).withColumn(
                "priority", F.lit(cfg.seed_priority).cast("int")
            ).withColumn("temp_json", F.lit(None).cast("string")).withColumn(
                "try_times_req", F.lit(None).cast("int")
            )
        cands = base.select(
            "url",
            "host",
            "spider",
            "rule",
            "method",
            F.col("priority").cast("int").alias("priority"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(None).cast("string").alias("parent_url"),
            F.from_json("temp_json", "map<string,string>").alias("temp"),
            F.from_json("headers_json", "map<string,array<string>>").alias("headers"),
            "post_data",
            F.lit(False).alias("reloadable"),
            # per-seed TryTimes (request.go:48) wins over the config
            F.coalesce(
                F.col("try_times_req"), F.lit(cfg.try_times)
            ).cast("int").alias("try_times"),
            "cand_order",
        )
        _mark("seed_frame")
        empty_seen = self.spark.createDataFrame([], URL_SEEN_SCHEMA)
        remaining_by = (
            {inst: cfg.limit for inst in self._instances}
            if cfg.limit is not None
            else None
        )
        scope = FR.CacheScope()
        new_rows, n_new = FR.enqueue(
            cands, empty_seen, self._politeness, 0, 0, None,
            remaining_by_spider=remaining_by,
            default_remaining=cfg.limit,
            scope=scope,
        )
        new_rows = scope.add(new_rows)
        _mark("enqueue")
        writes = {"pending": (new_rows, "overwrite")}
        registered = None
        if self._seen_cat is not None:
            seen_files = self._seen_cat.append(
                new_rows.select("url_key"), 0, n_hint=n_new
            )
            registered = {"url_seen": (seen_files, "append")}
        else:
            writes["url_seen"] = (new_rows.select("url_key"), "append")
        _mark("seen_append")
        if cfg.use_bloom:
            empty_sketch = self.spark.createDataFrame([], SEEN_SKETCH_SCHEMA)
            writes["seen_sketch"] = (
                SEEN.update_sketch(empty_sketch, new_rows.select("url_key")),
                "overwrite",
            )
        boot_by = (
            self._count_by_spider(new_rows)
            if self._multi
            else ({self._instances[0]: n_new} if n_new else {})
        )
        boot_meta = {"next_seq": n_new, "admitted_by": boot_by,
                     "deferred": False, "round": 0, "seen_gen": 0,
                     # current store format — new stores must carry the
                     # stamp or every open re-reads parquet footers in
                     # _migrate_v1_headers
                     "headers_format": 2}
        if self._seen_cat is not None:
            # layout stamp: reopening with a different bucket width
            # triggers a transparent rewrite (_open_seen_catalog)
            boot_meta["seen_buckets"] = self._seen_cat.n_buckets
        self.store.commit(
            0,
            writes,
            meta=boot_meta,
            registered=registered,
        )
        scope.release()
        _mark("commit")
        if _timing:
            prev = t0
            spans = []
            for label, ts in _marks:
                spans.append(f"{label}={ts - prev:.1f}s")
                prev = ts
            print("[bootstrap] " + " ".join(spans), flush=True)

    def _canonicalize_seed_df(self, seeds: DataFrame) -> DataFrame:
        """(url, cand_order) → canonical (url, host, cand_order) via a
        vectorized pandas UDF; invalid URLs dropped."""
        import pandas as pd

        from .urlnorm import canonicalize_series, host_series

        def _canon(pdf_iter):
            for pdf in pdf_iter:
                cu = canonicalize_series(pdf["url"])
                out = pd.DataFrame(
                    {
                        "url": cu,
                        "host": host_series(cu),
                        "cand_order": pdf["cand_order"],
                    }
                )
                yield out[out["url"] != ""]

        return seeds.select("url", "cand_order").mapInPandas(
            _canon, "url string, host string, cand_order long"
        )

    def _load_sketch(self, url_seen: DataFrame) -> DataFrame:
        """The seen_sketch bloom table — rebuilt from the exact url_seen
        table when use_bloom was enabled on a store bootstrapped without
        it (an empty sketch over a non-empty seen set would mark every
        historical key 'definitely new' and bypass the exact anti-join).
        Emptiness comes from manifest file lists — no Spark job."""
        tables = self.store.read_manifest()["tables"]
        if not tables.get("seen_sketch") and tables.get("url_seen"):
            return SEEN.build_sketch(url_seen)
        return self.load("seen_sketch", SEEN_SKETCH_SCHEMA)

    # --- one micro-batch round; returns rows dispatched ---

    def run_round(self) -> int:
        cfg = self.cfg
        t0 = time.time()
        _timing = os.environ.get("PHOLCUS_TIMING") == "1"
        _marks: list[tuple[str, float]] = []

        def _mark(label: str) -> None:
            if _timing:
                _marks.append((label, time.time()))
        meta = self._meta()
        round_no = int(meta.get("round", 0)) + 1
        next_seq = int(meta.get("next_seq", 0))
        admitted_by = self._admitted_by(meta)

        pending = self.load("pending", FRONTIER_SCHEMA)
        politeness = self._round_politeness()
        # No separate drained-frontier count: the batch count below
        # (needed anyway) returns 0 for an empty frontier and exits
        # before the fetch/stage cycle — one job per round instead of
        # two, and the final drained round costs one select instead of
        # a full empty round.
        scope = FR.CacheScope()
        batch = scope.add(
            FR.select_batch(
                pending, politeness, cfg.batch_size,
                fair_share_spiders=self._multi, scope=scope,
                age_ramp=cfg.age_ramp, now_seq=next_seq,
            )
        )
        # cookie jar as of the round start (EnableCookie,
        # context.go:110-112): a small dim table — bounded by
        # spiders × hosts, broadcast into the fetch join
        cookies_df = (
            self.load("cookies", COOKIES_SCHEMA) if cfg.enable_cookie else None
        )
        # Exact batch size, counted once on the cached batch (the
        # select_batch evaluation happens exactly once either way — the
        # cache pins it). Downstream it (a) skips the fetch job when
        # politeness admitted nothing, (b) sizes fetch partitions to
        # the real row count instead of the 4x-width floor, and (c)
        # replaces the post-fetch results.count() — fetch output is
        # 1:1 with batch rows.
        n_batch = batch.count()
        _mark("select")
        if n_batch == 0:
            scope.release()
            return 0

        # F15: pause until each timer-gated rule present in this batch
        # fires (config-gated — zero cost for crawls with no timers;
        # the distinct() is a tiny agg over the cached batch)
        if self._timer_rules:
            present = {
                (r.spider, r.rule)
                for r in batch.select("spider", "rule").distinct().collect()
            }
            for tid in sorted(
                {self._rules[k]["timer"] for k in present & self._timer_rules}
            ):
                self.timer.sleep(tid)

        # Stage the fetch output as a per-round scratch parquet table:
        # the fetch UDF runs exactly once, and every consumer (items,
        # visits, resolved, child links, metrics) re-reads it with
        # column pruning — Spark's in-memory cache handles the
        # binary+array-of-struct row shape badly (full-row scans per
        # consumer), while pruned parquet reads stay columnar.
        scratch = os.path.join(self.store.root, "scratch", f"round-{round_no}")
        dispatch = (
            FR.assign_proxies(
                batch, cfg.proxy_pool, cfg.proxy_max_latency_ms
            )
            if cfg.proxy_pool
            else batch
        )
        # Size fetch partitions by ROWS, not just cluster width: a
        # partition's payload output feeds one parquet writer and one
        # Python worker's Arrow buffers, so fat partitions (100s of MB)
        # thrash both (measured ~35% per-URL slowdown at 1875 rows x
        # 140 KB vs ~500-row partitions). batch <= pending, so the
        # pending count (already taken) bounds the hint.
        n_part_hint = n_batch // max(
            int(getattr(cfg, "fetch_part_rows", 512)), 1
        )
        fetch_batch(
            dispatch,
            self._rules,
            cfg.n_hosts,
            cfg.try_times,
            cfg.failure_pct,
            cfg.img_px_scale,
            cookies=cookies_df,
            n_part_hint=n_part_hint,
            n_rows=n_batch,
        ).select(
            "*",
            F.lit(round_no).cast("int").alias("visit_round"),
            F.coalesce(F.length("bytes"), F.lit(0)).cast("int").alias("n_bytes"),
            F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(
                "download_time"
            ),
        ).write.mode("overwrite").parquet(scratch)
        _mark("fetch_scratch")
        results = self.spark.read.schema(FETCHED_SCHEMA).parquet(scratch)
        _, requeued, _failed = FR.split_results(
            results.select(*FETCH_RESULT_SCHEMA.fieldNames()),
            cfg.max_requeue_attempt,
        )

        cands = links_to_candidates(results)
        if cfg.trap_guard is not None:
            tg = cfg.trap_guard
            depth = tg.get("depth", TRAPS.PREFIX_DEPTH)
            # profile the accumulated picture (already-pending + this
            # round's discoveries), cap only the new discoveries
            profile = pending.select("host", "url").unionByName(
                cands.select("host", "url")
            )
            trap_list = TRAPS.detect_traps(
                profile,
                depth=depth,
                min_urls=tg.get("min_urls", TRAPS.MIN_TRAP_URLS),
                min_share=tg.get("min_share", TRAPS.MIN_TRAP_SHARE),
            )
            cands = TRAPS.cap_traps(
                cands, trap_list, depth=depth, keep=tg.get("keep", 0)
            )
        url_seen = self._url_seen_frames()
        sketch = (
            self._load_sketch(self._url_seen_df()) if cfg.use_bloom else None
        )
        # pin="checkpoint": enqueue truncates lineage at the admitted
        # set with one eager localCheckpoint, so new_rows stays valid
        # after the bucketed seen append refreshes the url_seen table
        # the anti-join read — the old second checkpoint job here is
        # gone (round-5 fixed-cost shave, VERDICT r4 #9).
        new_rows, n_new = FR.enqueue(
            cands, url_seen, self._politeness, next_seq, round_no, None,
            sketch=sketch, remaining_by_spider=self._remaining_by(meta),
            default_remaining=cfg.limit, scope=scope, pin="checkpoint",
        )
        _mark("enqueue")

        still_pending = (
            pending.join(batch.select("url_key"), "url_key", "left_anti")
            .unionByName(requeued)
            .unionByName(new_rows)
        )

        # per-partition lineage metrics (S9 / north rule): the lineage
        # partition key = pmod(url_key, shuffle partitions). Reads only
        # small columns (n_bytes, not bytes) from the staged log.
        n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        wall_ms = int((time.time() - t0) * 1000)
        part_metrics = (
            results.groupBy(
                F.pmod("url_key", F.lit(n_part)).cast("int").alias("partition_id")
            )
            .agg(
                F.count("*").alias("pulled"),
                F.sum(F.col("ok").cast("long")).alias("fetched"),
                F.sum((~F.col("ok")).cast("long")).alias("failed"),
                F.sum(F.col("ok").cast("long")).alias("items"),
                F.sum(F.when(F.col("ok"), F.col("n_bytes").cast("long"))
                      .otherwise(F.lit(0))).alias("bytes"),
            )
            .select(
                F.lit(round_no).cast("int").alias("round"),
                "partition_id",
                "pulled",
                "fetched",
                F.lit(0).cast("long").alias("deduped"),
                "failed",
                "items",
                "bytes",
                F.lit(wall_ms).cast("long").alias("wall_ms"),
                F.lit(-1).cast("long").alias("snapshot_id"),
            )
        )

        writes = {
            "pending": (still_pending, "overwrite"),
            "rounds": (part_metrics, "append"),
        }
        if cfg.enable_cookie:
            # merge the round's Set-Cookie headers into the jar:
            # new-overrides-old per (spider, host, name); within-round
            # multi-setter ties resolve by max(value) — deterministic
            # and order-free (the reference's sequential last-wins is
            # unobservable under the synthetic host-keyed sessions).
            # Overwrite of a dim-table-sized frame each round.
            new_ck = (
                results.filter(F.col("ok") & F.col("set_cookies").isNotNull())
                .select(
                    "spider", "host",
                    F.explode("set_cookies").alias("name", "value"),
                )
                .groupBy("spider", "host", "name")
                .agg(F.max("value").alias("value"))
            )
            writes["cookies"] = (
                cookies_df.join(
                    new_ck, ["spider", "host", "name"], "left_anti"
                ).unionByName(new_ck),
                "overwrite",
            )
        if cfg.adaptive_politeness is not None:
            ap = cfg.adaptive_politeness
            # retune per-host budgets from this round's outcomes; the
            # frame re-derives from the scratch parquet + the persisted
            # dims, so lineage stays one round deep
            writes["politeness"] = (
                FR.adapt_politeness(
                    politeness,
                    results.select(
                        "host", (~F.col("ok")).alias("failed")
                    ),
                    cap=ap.get("cap", 64),
                    floor=ap.get("floor", 1),
                ),
                "overwrite",
            )
        registered_fn = None
        seen_gen = int(meta.get("seen_gen", 0))
        if self._seen_cat is not None:
            # deferred: the bucketed insert runs concurrently with the
            # pending/rounds writers inside commit() — new_rows is
            # checkpointed, so the thread reads materialized partitions
            registered_fn = lambda: {  # noqa: E731
                "url_seen": (
                    self._seen_cat.append(
                        new_rows.select("url_key"), seen_gen, n_hint=n_new
                    ),
                    "append",
                )
            }
        else:
            writes["url_seen"] = (new_rows.select("url_key"), "append")
        if cfg.use_bloom:
            writes["seen_sketch"] = (
                SEEN.update_sketch(sketch, new_rows.select("url_key")),
                "overwrite",
            )
        if self._multi:
            new_by = self._count_by_spider(new_rows)
        else:
            # single spider: the total IS the per-spider count — no
            # extra collect job per round
            new_by = {self._instances[0]: n_new} if n_new else {}
        self.store.commit(
            round_no,
            writes,
            meta={
                "next_seq": next_seq + n_new,
                "admitted_by": {
                    **admitted_by,
                    **{
                        sp: admitted_by.get(sp, 0) + n
                        for sp, n in new_by.items()
                    },
                },
                "round": round_no,
                "deferred": meta.get("deferred", False),
                "run_start_round": int(meta.get("run_start_round", 0)),
                "seen_gen": seen_gen,
                # free format stamp: pre-stamp stores (already
                # multi-value but unstamped) stop paying the per-open
                # footer check after their first committed round
                "headers_format": 2,
            },
            # zero-copy: the staged fetch output becomes this round's
            # slice of the fetched log (renamed after writes finish, so
            # the writers above could still read it)
            adopts={"fetched": (scratch, "append")},
            registered_fn=registered_fn,
        )
        _mark("commit")
        scope.release()
        self._maybe_compact("url_seen", URL_SEEN_SCHEMA, round_no)
        _mark("compact")
        if _timing:
            prev = t0
            spans = []
            for label, ts in _marks:
                spans.append(f"{label}={ts - prev:.1f}s")
                prev = ts
            print(
                f"[round {round_no}] " + " ".join(spans)
                + f" wall={time.time() - t0:.1f}s n={n_batch}",
                flush=True,
            )
        return n_batch

    def _maybe_compact(self, table: str, schema, round_no: int) -> None:
        """Rewrite an append-only table when its file count has grown
        past 2× the shuffle width — url_seen is re-read (anti-join
        build side) every round, so unbounded file counts would make
        round cost creep up with crawl age. The rewrite is just another
        snapshot commit (time travel keeps working).

        In bucketed-seen mode url_seen compaction rewrites into a fresh
        generation directory and flips the manifest before the old one
        is deleted (crash-safe at every step; seen_catalog.compact)."""
        n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        files = self.store.read_manifest()["tables"].get(table, [])
        if table == "url_seen" and self._seen_cat is not None:
            if len(files) <= 4 * self._seen_cat.n_buckets:
                return
            meta = self._meta()
            gen = int(meta.get("seen_gen", 0))
            new_gen, new_files = self._seen_cat.compact(gen, files)
            self.store.commit(
                round_no,
                {},
                meta={**meta, "seen_gen": new_gen},
                registered={"url_seen": (new_files, "overwrite")},
            )
            import shutil as _sh

            _sh.rmtree(self._seen_cat._gen_dir(gen), ignore_errors=True)
            _sh.rmtree(self._seen_cat._delta_dir(gen), ignore_errors=True)
            return
        if len(files) <= 2 * n_part:
            return
        compacted = self.load(table, schema).repartition(n_part, "url_key")
        meta = self._meta()
        self.store.commit(round_no, {table: (compacted, "overwrite")}, meta=meta)

    # --- CanStop / drain-time failure re-admission (F8) ---

    def _try_defer(self) -> bool:
        meta = self._meta()
        if meta.get("deferred", False):
            return False
        # only THIS run's failures are drain-re-admitted; earlier runs'
        # failures come back solely via start_new_run(failure_inherit)
        run_start = int(meta.get("run_start_round", 0))
        failures = self.failures_df().filter(
            F.col("visit_round") >= run_start
        )
        scope = FR.CacheScope()
        re_rows = scope.add(
            failures.select(*FRONTIER_COLS).withColumn(
                "status", F.lit("pending")
            )
        )
        n = re_rows.count()
        if n == 0:
            # mark deferred anyway so CanStop is a pure table predicate
            scope.release()
            self.store.commit(
                int(meta.get("round", 0)),
                {},
                meta={**meta, "deferred": True},
            )
            return False
        round_no = int(meta.get("round", 0))
        self.store.commit(
            round_no,
            {"pending": (re_rows, "overwrite")},
            meta={**meta, "deferred": True},
        )
        scope.release()
        return True

    def run(self, seeds: list[str] | None = None, max_rounds: int | None = None) -> int:
        """Run to completion (or max_rounds); resumable — call again
        after a kill and it continues from the last snapshot."""
        if seeds is not None:
            self.bootstrap(seeds)
        cfg = self.cfg
        if cfg.shuffle_partitions is not None:
            # right-size reduce width to this crawl's batch volume
            # (see CrawlConfig.shuffle_partitions); session-level —
            # the last-set crawl wins, which is the deployment model
            # (one engine per session)
            self.spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(int(cfg.shuffle_partitions)),
            )
        limit = max_rounds if max_rounds is not None else cfg.max_rounds
        rounds_run = 0
        while rounds_run < limit:
            # run controls (reference stop/pauseRecover,
            # web/websocket_controller.go:196-218): polled at round
            # boundaries — a round is the atomic unit, so 'stop' here
            # is a graceful, resumable exit (call run() again after
            # write_control('run') and the crawl continues), and
            # 'pause' holds BETWEEN committed rounds.
            cmd = self.store.read_control()
            while cmd == "pause":
                time.sleep(self.cfg.control_poll_s)
                cmd = self.store.read_control()
            if cmd == "stop":
                break
            dispatched = self.run_round()
            if cfg.snapshot_keep:
                self.store.expire_snapshots(cfg.snapshot_keep)
            if dispatched == 0:
                if self._try_defer():
                    continue
                break
            rounds_run += 1
        if cfg.snapshot_keep:
            # the drain/defer path commits after the loop's last expire
            self.store.expire_snapshots(cfg.snapshot_keep)
        return rounds_run

    # --- run boundaries: history inherit + failure export (F5/F7) ---

    def import_seen(self, keys: DataFrame) -> int:
        """Append foreign url_keys to the seen history (the
        SuccessInherit source side, history.go:83-104): URLs whose keys
        are imported will never be admitted by this store. Also the
        bench's pre-seeding hook. Returns the committed snapshot id."""
        meta = self._meta()
        round_no = int(meta.get("round", 0))
        keys = keys.select(F.col("url_key").cast("long"))
        if self._seen_cat is not None:
            gen = int(meta.get("seen_gen", 0))
            files = self._seen_cat.append(keys, gen)
            return self.store.commit(
                round_no, {}, meta=meta,
                registered={"url_seen": (files, "append")},
            )
        return self.store.commit(
            round_no, {"url_seen": (keys, "append")}, meta=meta
        )

    def start_new_run(
        self,
        seeds: list | DataFrame | None = None,
        success_inherit: bool = True,
        failure_inherit: bool = True,
    ) -> None:
        """Begin a new crawl run over this store — the reference's
        process-start semantics (``runtime/cache/cache.go:23-24``,
        ``app/aid/history/history.go:83-104``):

        - ``success_inherit=False`` drops the URL-seen history (and its
          bloom sketch / bucketed generation), so previously-crawled
          URLs are admissible again;
        - ``failure_inherit=True`` re-admits the failure store's
          serialized requests as pending with a fresh attempt counter
          (``matrix.go:42-47``); False abandons them.

        New ``seeds`` (if given) are enqueued after the history
        decision, through the normal Push pipeline."""
        meta = self._meta()
        if self.store.current_snapshot_id() is None:
            if seeds is not None:
                self.bootstrap(seeds)
            return
        round_no = int(meta.get("round", 0))
        writes: dict = {}
        registered = None
        # per-run state: the page budget resets (the reference's maxPage
        # lives in the per-run Matrix, matrix.go:42-47), the drain-time
        # failure re-admission is scoped to THIS run's failures
        # (run_start_round), and the defer latch re-arms
        new_meta = {
            **meta,
            "deferred": False,
            "admitted_by": {},
            "run_start_round": round_no + 1,
        }
        if not success_inherit:
            empty_seen = self.spark.createDataFrame([], URL_SEEN_SCHEMA)
            if self._seen_cat is not None:
                # flip to a fresh (empty) generation; reconcile GCs the
                # old one after the manifest commit
                gen = int(meta.get("seen_gen", 0)) + 1
                self._seen_cat._create(gen)
                self.spark.catalog.refreshTable(self._seen_cat.table)
                self.spark.catalog.refreshTable(self._seen_cat.delta_table)
                registered = {"url_seen": ([], "overwrite")}
                new_meta["seen_gen"] = gen
            else:
                writes["url_seen"] = (empty_seen, "overwrite")
            if self.cfg.use_bloom:
                writes["seen_sketch"] = (
                    self.spark.createDataFrame([], SEEN_SKETCH_SCHEMA),
                    "overwrite",
                )
        pending = self.load("pending", FRONTIER_SCHEMA)
        if failure_inherit:
            re_rows = (
                self.failures_df()
                .select(*FRONTIER_COLS)
                .withColumn("status", F.lit("pending"))
                .withColumn("attempt", F.lit(0).cast("int"))
            )
            pending = pending.unionByName(re_rows).dropDuplicates(["url_key"])
        # no caches to release here: pending is pinned by the eager
        # localCheckpoint (freed by the ContextCleaner when the handle
        # drops), and run_round/_enqueue_new_seeds manage their own
        # CacheScopes
        writes["pending"] = (pending.localCheckpoint(eager=True), "overwrite")
        self.store.commit(round_no, writes, meta=new_meta,
                          registered=registered)
        if seeds is not None:
            self._enqueue_new_seeds(seeds)

    def _enqueue_new_seeds(self, seeds: list | DataFrame) -> None:
        """Push extra seeds into an existing store (rule 'root', the
        normal dedup/robots/budget pipeline)."""
        meta = self._meta()
        store_round = int(meta.get("round", 0))
        next_seq = int(meta.get("next_seq", 0))
        cfg = self.cfg
        if isinstance(seeds, DataFrame):
            if cfg.keyins:
                raise ValueError("keyin substitution requires list seeds")
            inst_df = F.broadcast(
                self.spark.createDataFrame(
                    [(inst, idx) for idx, inst in enumerate(self._instances)],
                    "spider string, _inst_idx long",
                )
            )
            base = self._canonicalize_seed_df(seeds).crossJoin(inst_df).select(
                "url", "host", "spider",
                (
                    F.shiftleft(F.col("_inst_idx"), 44) + F.col("cand_order")
                ).alias("cand_order"),
                F.lit("GET").alias("method"),
                F.lit(None).cast("string").alias("post_data"),
                F.lit(None).cast("string").alias("headers_json"),
            )
        else:
            import json as _json

            import pandas as pd

            rows = []
            for inst_idx, inst in enumerate(self._instances):
                for i, raw in enumerate(seeds):
                    req = raw if isinstance(raw, dict) else {"url": raw}
                    cu = canonicalize(seed_url_for(inst, req["url"]))
                    if not cu:
                        continue
                    rows.append(
                        (cu, host_of(cu), inst, (inst_idx << 44) | i,
                         req.get("method", "GET"), req.get("post_data"),
                         _json.dumps(_norm_headers(req["headers"]))
                         if req.get("headers") else None)
                    )
            base = self.spark.createDataFrame(
                pd.DataFrame(rows, columns=[
                    "url", "host", "spider", "cand_order", "method",
                    "post_data", "headers_json"]),
                schema="url string, host string, spider string, "
                "cand_order long, method string, post_data string, "
                "headers_json string",
            )
        cands = base.select(
            "url", "host",
            "spider",
            F.lit("root").alias("rule"),
            "method",
            F.lit(cfg.seed_priority).cast("int").alias("priority"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit(None).cast(T.MapType(T.StringType(), T.StringType()))
            .alias("temp"),
            F.from_json("headers_json", "map<string,array<string>>").alias("headers"),
            "post_data",
            F.lit(False).alias("reloadable"),
            F.lit(cfg.try_times).cast("int").alias("try_times"),
            "cand_order",
        )
        url_seen = self._url_seen_frames()
        sketch = (
            self._load_sketch(self._url_seen_df()) if cfg.use_bloom else None
        )
        scope = FR.CacheScope()
        new_rows, n_new = FR.enqueue(
            cands, url_seen, self._politeness, next_seq, store_round,
            None, sketch=sketch,
            remaining_by_spider=self._remaining_by(meta),
            default_remaining=cfg.limit, scope=scope, pin="checkpoint",
        )
        pending = self.load("pending", FRONTIER_SCHEMA).unionByName(new_rows)
        writes = {"pending": (pending, "overwrite")}
        registered = None
        if self._seen_cat is not None:
            gen = int(meta.get("seen_gen", 0))
            files = self._seen_cat.append(new_rows.select("url_key"), gen)
            registered = {"url_seen": (files, "append")}
        else:
            writes["url_seen"] = (new_rows.select("url_key"), "append")
        if cfg.use_bloom:
            writes["seen_sketch"] = (
                SEEN.update_sketch(sketch, new_rows.select("url_key")),
                "overwrite",
            )
        admitted_by = self._admitted_by(meta)
        self.store.commit(
            store_round, writes,
            meta={**meta, "next_seq": next_seq + n_new,
                  "admitted_by": {
                      **admitted_by,
                      **{
                          sp: admitted_by.get(sp, 0) + n
                          for sp, n in self._count_by_spider(new_rows).items()
                      },
                  },
                  "deferred": False},
            registered=registered,
        )
        scope.release()

    def export_failures(self, path: str) -> int:
        """Serialize the failure store as JSON request rows (the
        reference's failure persistence shape, failure.go:51-107 —
        full requests, re-loadable via start_new_run). Returns count."""
        failed = self.failures_df().localCheckpoint(eager=True)
        failed.write.mode("overwrite").json(path)
        return failed.count()

    # --- read-side views over the fetched log (+ small tables) ---

    def fetched_df(self) -> DataFrame:
        """The append-only fetch log: one row per dispatched URL per
        round (payload + outcome). Source of the views below."""
        return self.load("fetched", FETCHED_SCHEMA)

    def items_df(self) -> DataFrame:
        """DataCell view (ITEMS_SCHEMA): successful fetches' payloads.
        HEAD responses carry no body (surf.go:103-140) and so produce
        no item row — filtered via the null image_id."""
        return self.fetched_df().filter(
            F.col("ok") & F.col("image_id").isNotNull()
        ).select(*[f.name for f in ITEMS_SCHEMA.fields])

    def js_items_df(self) -> DataFrame:
        """Dynamic-rule Output cells (ctx.Output, context.go:244-280):
        one row per emitted cell, ``fields`` carrying the script's
        key→value map — the dynamic DataCell the static ITEMS_SCHEMA
        cannot hold."""
        return (
            self.fetched_df()
            .filter(F.col("ok") & F.col("outs").isNotNull())
            .select(
                "rule", "url", "parent_url", "download_time", "url_key",
                F.posexplode("outs").alias("cell_idx", "fields"),
            )
        )

    def resolved_df(self) -> DataFrame:
        """Latest-wins resolution view of the fetched log (the MERGE
        INTO equivalent): done on success, failed once requeue attempts
        are exhausted (DoHistory increments the attempt when recording
        a failure, matrix.go:144-169); a drain-time re-admission
        appends a later visit_round whose status wins."""
        from pyspark.sql import Window

        f = self.fetched_df().filter(
            F.col("ok")
            | (F.col("attempt") >= self.cfg.max_requeue_attempt)
        )
        resolved = f.select(
            *[c for c in FRONTIER_COLS if c not in ("attempt", "status")],
            F.when(F.col("ok"), F.col("attempt"))
            .otherwise(F.col("attempt") + 1)
            .cast("int")
            .alias("attempt"),
            F.when(F.col("ok"), F.lit("done")).otherwise(F.lit("failed"))
            .alias("status"),
            "visit_round",
        ).select(*FRONTIER_COLS, "visit_round")
        w = Window.partitionBy("url_key").orderBy(F.desc("visit_round"))
        return (
            resolved.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def host_authority(
        self, iterations: int = 3, damping: float = 0.85
    ) -> DataFrame:
        """Host-authority scores from THIS crawl's observed link graph
        (hostrank.host_rank over parent_host → host edges of every
        fetched row with a parent). Feed the result into
        hostrank.apply_authority on the next run's seeds/candidates to
        order the politeness budget by importance — the OPIC-style
        frontier prioritization loop, closed over the engine's own
        output tables."""
        from . import hostrank

        f = self.fetched_df().filter(F.col("parent_url").isNotNull())
        edges = f.select(
            F.regexp_extract("parent_url", r"^[a-z]+://([^/:]+)", 1).alias(
                "src"
            ),
            F.col("host").alias("dst"),
        )
        return hostrank.host_rank(
            edges, iterations=iterations, damping=damping
        )

    def failures_df(self) -> DataFrame:
        """Final-status failures (the Failure store view,
        failure.go:18-24)."""
        return self.resolved_df().filter(F.col("status") == "failed")

    def rounds_df(self) -> DataFrame:
        return self.load("rounds", ROUNDS_SCHEMA)

    def cookies_df(self) -> DataFrame:
        """The committed cookie jar (EnableCookie state,
        COOKIES_SCHEMA); empty unless cfg.enable_cookie."""
        return self.load("cookies", COOKIES_SCHEMA)

    def register_views(self, prefix: str = "crawl") -> list[str]:
        """Expose crawl state to spark.sql as temp views
        (``<prefix>_pending``, ``_fetched``, ``_items``, ``_resolved``,
        ``_failures``, ``_url_seen``, ``_rounds``) — the engine's
        tables are then queryable like any warehouse table."""
        views = {
            f"{prefix}_pending": self.load("pending", FRONTIER_SCHEMA),
            f"{prefix}_fetched": self.fetched_df(),
            f"{prefix}_items": self.items_df(),
            f"{prefix}_resolved": self.resolved_df(),
            f"{prefix}_failures": self.failures_df(),
            f"{prefix}_url_seen": self.load("url_seen", URL_SEEN_SCHEMA),
            f"{prefix}_rounds": self.rounds_df(),
            f"{prefix}_cookies": self.cookies_df(),
        }
        for name, df in views.items():
            df.createOrReplaceTempView(name)
        return sorted(views)
