"""Trap detection + capping on hand-built frontiers."""

from __future__ import annotations

from pholcus_spark import traps


def _frontier(spark, rows):
    return spark.createDataFrame(rows, ["host", "url"])


def test_detect_traps_needs_both_thresholds(spark):
    rows = []
    # explosive prefix: 30 unique calendar pages on trap.test
    rows += [("trap.test", f"http://trap.test/cal/day/{i}") for i in range(30)]
    # same host, benign prefix
    rows += [("trap.test", f"http://trap.test/item/{i % 3}/view") for i in range(10)]
    # big.test has 30 URLs under one prefix too, but they're only 30 of
    # 200 — fails the share threshold
    rows += [("big.test", f"http://big.test/cal/day/{i}") for i in range(30)]
    rows += [("big.test", f"http://big.test/item/{i}/view") for i in range(170)]
    fr = _frontier(spark, rows)

    got = {
        (r["host"], r["prefix"])
        for r in traps.detect_traps(fr, min_urls=20, min_share=0.5).collect()
    }
    assert got == {("trap.test", "/cal/day")}


def test_cap_traps_keeps_first_k_and_passthrough(spark):
    rows = [("h", f"http://h/cal/day/{i:03d}") for i in range(20)]
    rows += [("h", f"http://h/item/{i}/view") for i in range(5)]
    fr = _frontier(spark, rows)
    trap_list = traps.detect_traps(fr, min_urls=10, min_share=0.5)
    out = traps.cap_traps(fr, trap_list, keep=7)

    kept = sorted(r["url"] for r in out.collect())
    # 7 trapped survivors (first by url order) + all 5 benign rows
    assert len(kept) == 12
    assert [u for u in kept if "/cal/" in u] == [
        f"http://h/cal/day/{i:03d}" for i in range(7)
    ]
    assert sum("/item/" in u for u in kept) == 5


def test_cap_traps_no_traps_is_identity(spark):
    rows = [("h", f"http://h/item/{i}/view") for i in range(9)]
    fr = _frontier(spark, rows)
    trap_list = traps.detect_traps(fr, min_urls=100, min_share=0.9)
    assert trap_list.count() == 0
    assert traps.cap_traps(fr, trap_list).count() == 9


def test_path_prefix_edge_cases(spark):
    fr = _frontier(
        spark,
        [
            ("h", "http://h/a/b/c/d"),
            ("h", "http://h/a/b?q=1"),
            ("h", "http://h/onlyone"),
            ("h", "http://h/"),
            ("h", "http://h"),
        ],
    )
    got = [
        r["p"]
        for r in fr.select(
            traps.path_prefix(fr["url"]).alias("p")
        ).collect()
    ]
    assert got == ["/a/b", "/a/b", "", "", ""]


def test_engine_trap_guard_bounds_explosive_prefix(spark, tmp_store_dir):
    """Opt-in cfg.trap_guard: the synthetic link space is explosive
    under the depth-1 '/page' prefix (unique 9-digit pages) and small
    under '/pop'; the guarded crawl must admit no new /page URLs after
    detection, visiting a strict subset of the unguarded run."""
    import tempfile

    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.tables import SnapshotStore
    from pholcus_spark import synthetic

    seeds = synthetic.seed_urls(20, 4)

    def run(trap_guard):
        cfg = CrawlConfig(n_hosts=4, batch_size=64, trap_guard=trap_guard)
        store = SnapshotStore(tempfile.mkdtemp(dir=tmp_store_dir))
        eng = CrawlEngine(spark, store, cfg)
        eng.run(seeds)
        return {r["url"] for r in eng.items_df().select("url").collect()}

    free = run(None)
    guarded = run({"depth": 1, "min_urls": 20, "min_share": 0.5, "keep": 0})

    assert guarded <= free
    n_page_free = sum("/page/" in u for u in free)
    n_page_guarded = sum("/page/" in u for u in guarded)
    assert n_page_guarded < n_page_free
    # the benign /pop pool must survive the guard
    assert any("/pop/" in u for u in guarded)
