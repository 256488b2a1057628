"""Frontier-contract tests — the DataFrame port of the reference's
scheduler contract (``app/scheduler/scheduler_test.go``):

- priority-descending pull, FIFO within priority   (:262-278)
- duplicate push skipped                           (:251-260)
- push ignored once the page budget is exhausted   (:103-111)
- reloadable bypasses dedup                        (README.md:432-436)
- robots disallow filtering (north-rule addition)
- hot-host politeness cap + salted ranking equivalence
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pholcus_spark import frontier as FR
from pholcus_spark.schemas import POLITENESS_SCHEMA, URL_SEEN_SCHEMA

CAND_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("spider", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("temp", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("headers", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("post_data", T.StringType(), True),
        T.StructField("reloadable", T.BooleanType(), False),
        T.StructField("try_times", T.IntegerType(), False),
        T.StructField("cand_order", T.LongType(), False),
    ]
)


def _cand(url, host, order, priority=0, reloadable=False):
    return ("http://" + host + url, host, "sp", "r", "GET", priority, 0,
            None, None, None, None, reloadable, 3, order)


def _politeness(spark, hosts, max_per_round=100, disallow=None):
    rows = [(h, 300, disallow or [], max_per_round) for h in hosts]
    return spark.createDataFrame(rows, POLITENESS_SCHEMA)


def _seen(spark, keys=()):
    return spark.createDataFrame([(k,) for k in keys], URL_SEEN_SCHEMA)


def test_enqueue_dedups_within_batch_first_wins(spark):
    cands = spark.createDataFrame(
        [_cand("/a", "h1", 0, priority=5), _cand("/a", "h1", 1, priority=9),
         _cand("/b", "h1", 2)],
        CAND_SCHEMA,
    )
    out, _n = FR.enqueue(cands, _seen(spark), _politeness(spark, ["h1"]), 0, 0, None)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 2
    # first push wins: the priority-5 copy was kept (matrix.go:51-98)
    assert rows["http://h1/a"]["priority"] == 5
    # FIFO seq follows cand_order
    assert rows["http://h1/a"]["seq"] < rows["http://h1/b"]["seq"]


def test_enqueue_skips_seen_unless_reloadable(spark):
    cands = spark.createDataFrame(
        [_cand("/a", "h1", 0), _cand("/b", "h1", 1, reloadable=True)],
        CAND_SCHEMA,
    )
    keyed = FR.with_url_key(cands).collect()
    seen = _seen(spark, [r["url_key"] for r in keyed])
    out, _n = FR.enqueue(cands, seen, _politeness(spark, ["h1"]), 0, 0, None)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["url"] == "http://h1/b"


def test_enqueue_budget_exhausted(spark):
    cands = spark.createDataFrame(
        [_cand(f"/{i}", "h1", i) for i in range(10)], CAND_SCHEMA
    )
    out, _n = FR.enqueue(cands, _seen(spark), _politeness(spark, ["h1"]), 0, 0, 3)
    rows = sorted(out.collect(), key=lambda r: r["seq"])
    # budget admits in FIFO order (matrix.go:59-61)
    assert [r["url"] for r in rows] == [f"http://h1/{i}" for i in range(3)]
    zero, _zn = FR.enqueue(cands, _seen(spark), _politeness(spark, ["h1"]), 0, 0, 0)
    assert zero.count() == 0


def test_enqueue_robots_disallow(spark):
    cands = spark.createDataFrame(
        [_cand("/private/x", "h1", 0), _cand("/public/y", "h1", 1)],
        CAND_SCHEMA,
    )
    pol = _politeness(spark, ["h1"], disallow=["/private"])
    out, _n = FR.enqueue(cands, _seen(spark), pol, 0, 0, None)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["url"].endswith("/public/y")


def test_select_batch_priority_then_fifo(spark):
    cands = spark.createDataFrame(
        [
            _cand("/low1", "h1", 0, priority=0),
            _cand("/hi1", "h1", 1, priority=9),
            _cand("/low2", "h1", 2, priority=0),
            _cand("/hi2", "h1", 3, priority=9),
        ],
        CAND_SCHEMA,
    )
    pending, _pn = FR.enqueue(cands, _seen(spark), _politeness(spark, ["h1"]), 0, 0, None)
    batch = FR.select_batch(pending, _politeness(spark, ["h1"]), 3).collect()
    urls = [r["url"] for r in sorted(batch, key=lambda r: (-r["priority"], r["seq"]))]
    # highest priority first (matrix.go:107-110), FIFO within priority
    assert urls == ["http://h1/hi1", "http://h1/hi2", "http://h1/low1"]


def test_select_batch_per_host_cap(spark):
    cands = spark.createDataFrame(
        [_cand(f"/{i}", "hot", i) for i in range(20)]
        + [_cand(f"/{i}", "cold", 100 + i) for i in range(2)],
        CAND_SCHEMA,
    )
    pol = spark.createDataFrame(
        [("hot", 300, [], 3), ("cold", 300, [], 3)], POLITENESS_SCHEMA
    )
    pending, _pn = FR.enqueue(cands, _seen(spark), pol, 0, 0, None)
    batch = FR.select_batch(pending, pol, 50).collect()
    by_host = {}
    for r in batch:
        by_host[r["host"]] = by_host.get(r["host"], 0) + 1
    # politeness budget: ≤ max_per_round per host per round (F11)
    assert by_host == {"hot": 3, "cold": 2}
    # the hot host's 3 slots go to its FIFO head
    hot = sorted([r["seq"] for r in batch if r["host"] == "hot"])
    all_hot = sorted(
        r["seq"] for r in pending.filter("host='hot'").collect()
    )
    assert hot == all_hot[:3]


def test_salted_ranking_equals_unsalted(spark):
    """Two-phase salted rank must pick exactly the per-host top-k."""
    cands = spark.createDataFrame(
        [_cand(f"/{i}", "h1", i, priority=i % 4) for i in range(50)],
        CAND_SCHEMA,
    )
    pol = spark.createDataFrame([("h1", 300, [], 7)], POLITENESS_SCHEMA)
    pending, _pn = FR.enqueue(cands, _seen(spark), pol, 0, 0, None)
    got = {
        r["url_key"]
        for r in FR.select_batch(pending, pol, 7, salt_k=4).collect()
    }
    expected = {
        r["url_key"]
        for r in pending.orderBy(F.desc("priority"), "seq").limit(7).collect()
    }
    assert got == expected


def test_split_results_dohistory(spark):
    """DoHistory transitions (scheduler_test.go:140-185): success → done;
    first failure → silent re-queue; second failure → failed."""
    rows = [
        # url_key,url,host,spider,rule,method,prio,depth,seq,renq,parent,
        # temp,headers,post_data,reload,try,attempt,ok...
        (1, "u1", "h", "s", "r", "GET", 0, 0, 0, 0, None, None, None, None,
         False, 3, 0, True, None, None, None, None, None, None, None, None,
         [], None, None, None),
        (2, "u2", "h", "s", "r", "GET", 0, 0, 1, 0, None, None, None, None,
         False, 3, 0, False, "err", None, None, None, None, None, None, None,
         [], None, None, None),
        (3, "u3", "h", "s", "r", "GET", 0, 0, 2, 0, None, None, None, None,
         False, 3, 1, False, "err", None, None, None, None, None, None, None,
         [], None, None, None),
    ]
    from pholcus_spark.schemas import FETCH_RESULT_SCHEMA

    results = spark.createDataFrame(rows, FETCH_RESULT_SCHEMA)
    done, requeued, failed = FR.split_results(results, max_requeue_attempt=1)
    assert [r["url_key"] for r in done.collect()] == [1]
    rq = requeued.collect()
    assert [r["url_key"] for r in rq] == [2] and rq[0]["attempt"] == 1
    assert rq[0]["status"] == "pending"
    fl = failed.collect()
    assert [r["url_key"] for r in fl] == [3] and fl[0]["status"] == "failed"


def test_zipf_hot_host_skew_bounded(spark):
    """Hot-host skew (SURVEY §7 step 6): one host owning ~60% of the
    frontier must not defeat the per-host cap, and the salted two-phase
    ranking must pick exactly the same rows as the semantic contract
    (top max_per_round per host by priority desc, seq asc)."""
    rows = []
    order = 0
    for host, n in (("hot", 600), ("warm", 250), ("c1", 80), ("c2", 70)):
        for i in range(n):
            rows.append(_cand(f"/{i}", host, order, priority=i % 3))
            order += 1
    cands = spark.createDataFrame(rows, CAND_SCHEMA)
    pol = spark.createDataFrame(
        [("hot", 300, [], 5), ("warm", 300, [], 5), ("c1", 300, [], 5),
         ("c2", 300, [], 5)],
        POLITENESS_SCHEMA,
    )
    pending, _n = FR.enqueue(cands, _seen(spark), pol, 0, 0, None)
    pending = pending.cache()
    batch = FR.select_batch(pending, pol, 1000).collect()
    by_host = {}
    for r in batch:
        by_host.setdefault(r["host"], []).append(r)
    # cap holds even for the hot host
    assert {h: len(v) for h, v in by_host.items()} == {
        "hot": 5, "warm": 5, "c1": 5, "c2": 5
    }
    # and the picked rows are exactly the per-host top-(priority,seq)
    all_rows = pending.collect()
    for host, picked in by_host.items():
        expect = sorted(
            [r for r in all_rows if r["host"] == host],
            key=lambda r: (-r["priority"], r["seq"]),
        )[:5]
        assert sorted(r["url_key"] for r in picked) == sorted(
            r["url_key"] for r in expect
        )


def test_register_views(spark, tmp_store_dir):
    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.tables import SnapshotStore

    cfg = CrawlConfig(n_hosts=8, batch_size=10, limit=30)
    eng = CrawlEngine(spark, SnapshotStore(tmp_store_dir), cfg)
    eng.run(synthetic.seed_urls(6, cfg.n_hosts))
    views = eng.register_views()
    assert "crawl_items" in views
    n_items = spark.sql("SELECT count(*) AS n FROM crawl_items").first()["n"]
    assert n_items == eng.items_df().count() > 0
    joined = spark.sql(
        """SELECT f.url, r.status FROM crawl_fetched f
           JOIN crawl_resolved r USING (url_key) LIMIT 5"""
    ).collect()
    assert len(joined) > 0


def test_fair_share_across_spiders(spark):
    """F4 avgRes (scheduler.go:93-99): with the batch cap binding, each
    spider is guaranteed batch//n_spiders slots; a spider flooding the
    frontier cannot starve the other."""
    rows = []
    order = 0
    for spider, n, prio in (("spA", 200, 5), ("spB", 30, 0)):
        for i in range(n):
            r = _cand(f"/{spider}/{i}", "h1", order, priority=prio)
            rows.append(tuple([r[0], r[1], spider] + list(r[3:])))
            order += 1
    cands = spark.createDataFrame(rows, CAND_SCHEMA)
    pol = spark.createDataFrame([("h1", 300, [], 1000)], POLITENESS_SCHEMA)
    pending, _n = FR.enqueue(cands, _seen(spark), pol, 0, 0, None)
    pending = pending.cache()

    # without fair share: spA's priority 5 floods the whole batch
    batch = FR.select_batch(pending, pol, 20).collect()
    assert all(r["spider"] == "spA" for r in batch)

    # with fair share: each spider gets its quota
    fair = FR.select_batch(pending, pol, 20, fair_share_spiders=True).collect()
    counts = {}
    for r in fair:
        counts[r["spider"]] = counts.get(r["spider"], 0) + 1
    assert counts == {"spA": 10, "spB": 10}


def test_fair_share_underfilled_spider_frees_slots(spark):
    """ADVICE r1 low: when a spider has fewer pending rows than its
    quota, the leftover fill must be sized from the ACTUAL guaranteed
    count — the batch stays full instead of being under-filled."""
    rows = []
    order = 0
    for spider, n, prio in (("spA", 200, 5), ("spB", 3, 0)):
        for i in range(n):
            r = _cand(f"/{spider}/{i}", "h1", order, priority=prio)
            rows.append(tuple([r[0], r[1], spider] + list(r[3:])))
            order += 1
    cands = spark.createDataFrame(rows, CAND_SCHEMA)
    pol = spark.createDataFrame([("h1", 300, [], 1000)], POLITENESS_SCHEMA)
    pending, _n = FR.enqueue(cands, _seen(spark), pol, 0, 0, None)
    pending = pending.cache()

    fair = FR.select_batch(pending, pol, 20, fair_share_spiders=True).collect()
    counts = {}
    for r in fair:
        counts[r["spider"]] = counts.get(r["spider"], 0) + 1
    # spB only has 3 rows; its unused 7 quota slots go to spA
    assert counts == {"spA": 17, "spB": 3}


def test_budget_missing_spider_gets_fresh_budget(spark):
    """A candidate spider absent from the budget map (resume with a
    narrowed --spiders list) starts a fresh per-spider budget — it must
    not be silently zero-dropped (ADVICE r2)."""
    known = [_cand(f"/{i}", "h1", i) for i in range(5)]
    foreign = [
        (f"http://h1/o{i}", "h1", "other", "r", "GET", 0, 0,
         None, None, None, None, False, 3, 100 + i)
        for i in range(5)
    ]
    cands = spark.createDataFrame(known + foreign, CAND_SCHEMA)
    out, _n = FR.enqueue(
        cands, _seen(spark), _politeness(spark, ["h1"]), 0, 0, None,
        remaining_by_spider={"sp": 2}, default_remaining=3,
    )
    by: dict[str, list] = {}
    for r in out.collect():
        by.setdefault(r["spider"], []).append(r["url"])
    assert len(by["sp"]) == 2          # its mapped remaining budget
    assert len(by["other"]) == 3       # fresh budget = default_remaining


def test_select_batch_age_ramp_rescues_starved_url(spark):
    """One host, one politeness slot per round: an old low-priority URL
    loses to a stream of newer high-priority URLs forever with aging
    off, but with age_ramp it climbs to the stream's level and FIFO
    breaks the tie in its favor."""
    from pholcus_spark import frontier as FR

    rows = [(0, "h0.example.com", 0, 0)]  # the starved old URL
    rows += [(100 + i, "h0.example.com", 5, 100 + i) for i in range(10)]
    pending = spark.createDataFrame(
        rows, "url_key long, host string, priority long, seq long"
    )
    pol = spark.createDataFrame(
        [("h0.example.com", 1)], "host string, max_per_round int"
    )
    now = 111
    plain = FR.select_batch(pending, pol, 1).collect()
    assert [r["seq"] for r in plain] == [100]  # aging off: newest wave wins

    # ramp 20: ep(old) = 0 + (111-0)//20 = 5 ties the wave, FIFO wins
    aged = FR.select_batch(
        pending, pol, 1, age_ramp=20, now_seq=now
    ).collect()
    assert [r["seq"] for r in aged] == [0]
    # stored priority is untouched and _ep never leaks into the output
    assert aged[0]["priority"] == 0
    assert "_ep" not in aged[0].asDict()


def test_adapt_politeness_aimd(spark):
    from pholcus_spark.frontier import adapt_politeness
    dims = spark.createDataFrame(
        [("fail.example.com", 100, ["/p"], 8),
         ("clean.example.com", 200, ["/p"], 8),
         ("capped.example.com", 0, ["/p"], 10),
         ("idle.example.com", 300, ["/p"], 5),
         ("floored.example.com", 0, ["/p"], 1)],
        "host string, crawl_delay_ms long, robots_disallow array<string>,"
        " max_per_round int",
    )
    obs = spark.createDataFrame(
        [("fail.example.com", False), ("fail.example.com", True),
         ("clean.example.com", False), ("clean.example.com", False),
         ("capped.example.com", False),
         ("floored.example.com", True),
         ("new.example.com", False)],
        "host string, failed boolean",
    )
    got = {r["host"]: r for r in
           adapt_politeness(dims, obs, cap=10, floor=1).collect()}
    assert got["fail.example.com"]["max_per_round"] == 4    # halved
    assert got["clean.example.com"]["max_per_round"] == 9   # +1 on clean
    assert got["capped.example.com"]["max_per_round"] == 10  # stays capped
    assert got["idle.example.com"]["max_per_round"] == 5    # unvisited
    assert got["floored.example.com"]["max_per_round"] == 1  # floor holds
    assert got["new.example.com"]["max_per_round"] == 2     # floor+1, clean
    assert got["new.example.com"]["crawl_delay_ms"] == 0
    assert len(got) == 6


def test_engine_adaptive_politeness_retunes_and_persists(
    spark, tmp_store_dir
):
    """Opt-in cfg.adaptive_politeness: budgets move with observed
    failures (synthetic fetch fails ~FAILURE_PCT% of first attempts),
    the adapted dims persist in the store across rounds, and the
    crawl still lands the full visit set."""
    import tempfile

    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.schemas import POLITENESS_SCHEMA
    from pholcus_spark.tables import SnapshotStore
    from pholcus_spark import synthetic

    cfg = CrawlConfig(
        n_hosts=6, batch_size=32, limit=120,
        adaptive_politeness={"cap": 9, "floor": 1},
    )
    seeds = synthetic.seed_urls(12, cfg.n_hosts)
    store = SnapshotStore(tempfile.mkdtemp(dir=tmp_store_dir))
    eng = CrawlEngine(spark, store, cfg)
    eng.run(seeds)
    assert eng.items_df().count() == cfg.limit

    dims = {r["host"]: r for r in
            eng.load("politeness", POLITENESS_SCHEMA).collect()}
    assert dims  # the adapted table was committed
    budgets = {r["max_per_round"] for r in dims.values()}
    # clean hosts climbed above the static budget; every budget obeys
    # the [floor, cap] clamp
    static = {r["host"]: r["max_per_round"]
              for r in eng._politeness.collect()}
    assert all(1 <= b <= 9 for b in budgets)
    assert any(dims[h]["max_per_round"] > static[h] for h in dims)
    # robots carry through the adaptation unchanged
    assert all(r["robots_disallow"] is not None for r in dims.values())

    # default OFF: no politeness table is ever written
    store2 = SnapshotStore(tempfile.mkdtemp(dir=tmp_store_dir))
    eng2 = CrawlEngine(
        spark, store2,
        CrawlConfig(n_hosts=6, batch_size=32, limit=60),
    )
    eng2.run(synthetic.seed_urls(12, 6))
    assert eng2.load("politeness", POLITENESS_SCHEMA).count() == 0


def test_resolve_redirects_edge_cases(spark):
    """Pointer doubling: 2-cycle, self-loop, single hop, and a chain
    longer than 2^max_rounds flagged as unresolved."""
    from pholcus_spark import frontier

    edges = [("a", "b"), ("b", "a"),        # 2-cycle
             ("s", "s"),                     # self-loop
             ("x", "y"),                     # 1 hop, y terminal
             ]
    # 20-hop chain c0→…→c20: resolvable at max_rounds=6 (64 hops),
    # unresolved at max_rounds=2 (4 hops)
    edges += [(f"c{i}", f"c{i+1}") for i in range(20)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["src_url"]: r for r in frontier.resolve_redirects(df).collect()}
    for u in ("a", "b", "s"):
        assert got[u]["is_loop"] and got[u]["final_url"] is None
    assert got["x"]["final_url"] == "y" and got["x"]["n_hops"] == 1
    assert got["c0"]["final_url"] == "c20" and got["c0"]["n_hops"] == 20
    assert got["c19"]["n_hops"] == 1
    shallow = {
        r["src_url"]: r
        for r in frontier.resolve_redirects(df, max_rounds=2).collect()
    }
    assert shallow["c0"]["is_loop"]  # too deep for the cap → flagged
    assert shallow["c16"]["final_url"] == "c20"  # 4 hops: exactly at cap


def test_host_shards_balance(spark):
    """Snake placement: every pass hands each shard one host; shard
    load spread stays within one pass's spread on a Zipf profile."""
    from pholcus_spark import frontier

    hosts = spark.createDataFrame(
        [(f"h{i:03d}", 1000 // (1 + i)) for i in range(64)],
        "host string, load long",
    )
    rows = frontier.host_shards(hosts, n_shards=8).collect()
    assert len(rows) == 64
    per_shard: dict = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["load"])
    assert sorted(per_shard) == list(range(8))
    assert all(len(v) == 8 for v in per_shard.values())
    totals = [sum(v) for v in per_shard.values()]
    # the hottest host (1000) dwarfs everything; spread must stay in
    # the same ballpark as that single host, not accumulate per pass
    assert max(totals) - min(totals) <= 1000
    # determinism incl. tie-break on equal loads
    again = frontier.host_shards(hosts, n_shards=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dns_resolve_cache_ttl_and_negative(spark):
    from pholcus_spark import frontier

    now = 1_000_000
    hosts = spark.createDataFrame(
        [("hit",), ("expired",), ("missing",), ("nxfresh",), ("nxold",)],
        "host string",
    )
    cache = spark.createDataFrame(
        [("hit", "1.2.3.4", now - 100, 1000, False),
         ("expired", "1.2.3.5", now - 5000, 1000, False),
         ("nxfresh", None, now - 100, 1000, True),
         ("nxold", None, now - 5000, 1000, True)],
        "host string, ip string, resolved_at_ms long, ttl_ms long,"
        " nxdomain boolean",
    )
    out = {r["host"]: r for r in frontier.dns_resolve(
        hosts, cache, now_ms=now, default_ttl_ms=7000).collect()}
    assert out["hit"]["source"] == "cache"
    assert out["hit"]["ip"] == "1.2.3.4"
    assert out["hit"]["expires_at_ms"] == now - 100 + 1000
    assert out["expired"]["source"] == "resolved"
    assert out["expired"]["ip"].startswith("10.")
    assert out["expired"]["expires_at_ms"] == now + 7000
    assert out["missing"]["source"] == "resolved"
    # fresh negative entry serves NXDOMAIN from cache (RFC 2308)
    assert out["nxfresh"]["source"] == "nxdomain"
    assert out["nxfresh"]["ip"] is None
    # an EXPIRED negative entry re-resolves like any other
    assert out["nxold"]["source"] == "resolved"
    # the stand-in resolver is deterministic per host
    again = {r["host"]: r["ip"] for r in frontier.dns_resolve(
        hosts, cache, now_ms=now).collect()}
    assert again["expired"] == out["expired"]["ip"]


def test_fetch_health_classes_and_ladder(spark):
    from pholcus_spark import frontier

    rows = (
        # healthy: 3 ok, 1 dns
        [("good", 200, None)] * 3 + [("good", None, "dns fail")]
        # degraded: 2 ok, 2 5xx, 1 timeout (err 600 permille)
        + [("deg", 200, None)] * 2 + [("deg", 503, None)] * 2
        + [("deg", None, "timeout hard")]
        # throttled: mostly fine but one 429 -> throttled wins
        + [("thr", 200, None)] * 9 + [("thr", 429, None)]
        # dead: 6 transport errors, zero ok
        + [("dead", None, "conn reset")] * 6
        # few-failures host: all failed but < 5 attempts -> NOT dead
        + [("young", None, "conn reset")] * 3
    )
    df = spark.createDataFrame(rows, "host string, status int, err string")
    out = {r["host"]: r for r in frontier.fetch_health(df).collect()}
    assert out["good"]["health"] == "healthy"
    assert out["good"]["backoff_mult"] == 1
    assert out["good"]["err_milli"] == 250
    assert out["deg"]["health"] == "degraded"
    assert out["deg"]["backoff_mult"] == 4
    assert out["deg"]["n_http_5xx"] == 2 and out["deg"]["n_net"] == 1
    assert out["thr"]["health"] == "throttled"  # 429 beats good rates
    assert out["thr"]["backoff_mult"] == 8
    assert out["dead"]["health"] == "dead" and out["dead"]["backoff_mult"] == 16
    assert out["young"]["health"] == "degraded"  # err 1000 but n<5


def test_retry_after_epoch_forms_and_clamps(spark):
    from pyspark.sql import functions as F

    from pholcus_spark import frontier

    now = 1_700_000_000
    rows = [("delta", "90"), ("padded", " 45 "),
            ("date", "Tue, 14 Nov 2023 22:50:00 GMT"),
            ("wrong-dayname", "Xxx, 14 Nov 2023 22:50:00 GMT"),
            ("past", "Mon, 01 Jan 2001 00:00:00 GMT"),
            ("overcap", "7200"), ("junk", "soon"), ("empty", "")]
    df = spark.createDataFrame(rows, "k string, ra string")
    got = {r["k"]: r["e"] for r in df.select(
        "k", frontier.retry_after_epoch(F.col("ra"), now, cap_s=3600)
        .alias("e")).collect()}
    assert got["delta"] == now + 90
    assert got["padded"] == now + 45
    assert got["date"] == 1700002200
    # servers send wrong day names; the day name is ignored entirely
    assert got["wrong-dayname"] == 1700002200
    assert got["past"] == now
    assert got["overcap"] == now + 3600
    assert got["junk"] == now and got["empty"] == now


def test_apply_health_backoff_floor_and_fail_open(spark):
    from pholcus_spark import frontier

    dims = spark.createDataFrame(
        [("a", 100, ["/p"], 8), ("b", 100, ["/p"], 8),
         ("c", 100, ["/p"], 2), ("unseen", 100, ["/p"], 5)],
        "host string, crawl_delay_ms long,"
        " robots_disallow array<string>, max_per_round int",
    )
    health = spark.createDataFrame(
        [("a", 1), ("b", 4), ("c", 16)],
        "host string, backoff_mult int",
    )
    out = {r["host"]: r["max_per_round"] for r in
           frontier.apply_health_backoff(dims, health).collect()}
    assert out["a"] == 8          # healthy: unchanged
    assert out["b"] == 2          # 8 // 4
    assert out["c"] == 1          # 2 // 16 floors at 1, never 0
    assert out["unseen"] == 5     # no health row: fail open
