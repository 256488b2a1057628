"""spark-submit entry point.

Run the crawl engine as a Spark application:

    spark-submit --master <cluster> --py-files pholcus_spark.zip \
        tools/submit_crawl.py --store /data/crawl1 --seeds seeds.txt

or locally:

    python -m pholcus_spark --store /tmp/crawl1 --synthetic-seeds 100

On a cluster, omit --cores and let the session builder inherit the
submitted master/executor configuration (get_spark only forces
``local[N]`` when --cores is given or no master is configured).
Re-running with the same --store resumes from the last committed
snapshot (checkpoint semantics).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pholcus_spark")
    ap.add_argument("--store", required=True, help="snapshot store directory")
    ap.add_argument("--seeds", help="file of seed URLs, one per line")
    ap.add_argument(
        "--synthetic-seeds", type=int, default=0,
        help="generate N deterministic synthetic seeds instead of --seeds",
    )
    ap.add_argument("--n-hosts", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--limit", type=int, default=None, help="page budget")
    ap.add_argument("--max-rounds", type=int, default=10_000)
    ap.add_argument("--round-duration-ms", type=int, default=1000)
    ap.add_argument("--use-bloom", action="store_true",
                    help="bloom-prefilter the URL-seen check")
    ap.add_argument("--seen-buckets", type=int, default=32,
                    help="bucketed url_seen table width (0 = plain parquet)")
    ap.add_argument("--spiders", help="comma-separated spider names "
                    "(multi-spider crawl; default single 'imgspider')")
    ap.add_argument("--spider-xml",
                    help="XML <Spider> spec file (P8 dynamic rules, "
                         "declarative bodies): rules, seeds, pausetime, "
                         "EnableCookie and timers come from the spec; "
                         "explicit flags below still override")
    ap.add_argument("--keyins", help="comma-separated keyins — one spider "
                    "instance per keyin, '{keyin}' substituted in seeds")
    ap.add_argument("--new-run", action="store_true",
                    help="start a new run over an existing store")
    ap.add_argument("--no-success-inherit", action="store_true",
                    help="with --new-run: drop the URL-seen history")
    ap.add_argument("--no-failure-inherit", action="store_true",
                    help="with --new-run: abandon stored failures")
    ap.add_argument("--export-failures",
                    help="export the failure store as JSON to this dir")
    ap.add_argument("--enable-cookie", action="store_true",
                    help="keep a per-(spider,host) cookie jar across "
                         "rounds (EnableCookie)")
    ap.add_argument("--proxy-pool",
                    help="comma-separated proxy URLs; requests rotate "
                         "across the speed-filtered live pool (F12)")
    ap.add_argument("--proxy-max-latency-ms", type=int, default=300)
    ap.add_argument("--monitor-port", type=int, default=None,
                    help="serve the JSON status endpoints on "
                         "127.0.0.1:PORT while the crawl runs (0 = "
                         "ephemeral; the bound port is printed)")
    ap.add_argument("--cores", type=int, default=None,
                    help="force local[N] (default: inherit spark-submit conf)")
    ap.add_argument("--export-csv", help="export items as CSV to this dir")
    ap.add_argument("--export-excel",
                    help="export items as one OOXML workbook at this "
                         "path (sheet per rule; human-sized exports — "
                         "the row tripwire aborts crawl-sized tables)")
    ap.add_argument("--export-files", help="export payload files to this dir")
    ap.add_argument("--export-warc",
                    help="export the crawl as a WARC archive to this "
                         "dir: deterministic segments + a cdx.parquet "
                         "URL index + WET extracted-text records")
    ap.add_argument("--snapshot-keep", type=int, default=0,
                    help="retain only the newest N snapshots, expiring "
                         "older manifests + dead files after each round "
                         "(0 = keep all; Iceberg expire_snapshots analog)")
    ap.add_argument("--pausetime-ms", type=int, default=None,
                    help="per-host pause between fetches (reference "
                         "-pause, config.go:157; explicitly set, it "
                         "overrides an XML <Pausetime> like the "
                         "reference's task-level flag)")
    args = ap.parse_args(argv)

    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.session import get_spark
    from pholcus_spark.tables import SnapshotStore

    spark = get_spark("pholcus_spark", cores=args.cores)
    knobs = dict(
        n_hosts=args.n_hosts,
        batch_size=args.batch_size,
        limit=args.limit,
        max_rounds=args.max_rounds,
        round_duration_ms=args.round_duration_ms,
        use_bloom=args.use_bloom,
        seen_buckets=args.seen_buckets,
        spiders=tuple(args.spiders.split(",")) if args.spiders else (),
        keyins=tuple(args.keyins.split(",")) if args.keyins else (),
        proxy_pool=tuple(args.proxy_pool.split(","))
        if args.proxy_pool else (),
        proxy_max_latency_ms=args.proxy_max_latency_ms,
        snapshot_keep=args.snapshot_keep,
    )
    if args.pausetime_ms is not None:
        knobs["pausetime_ms"] = args.pausetime_ms
    spec = None
    if args.spider_xml:
        from pholcus_spark.spiderspec import (
            load_spider_xml,
            root_seeds,
            to_crawl_config,
        )

        with open(args.spider_xml) as f:
            spec = load_spider_xml(f.read())
        if args.enable_cookie:
            knobs["enable_cookie"] = True
        cfg = to_crawl_config(spec, **knobs)
    else:
        cfg = CrawlConfig(enable_cookie=args.enable_cookie, **knobs)
    if args.synthetic_seeds:
        seeds = synthetic.seed_urls(args.synthetic_seeds, cfg.n_hosts)
    elif args.seeds:
        with open(args.seeds) as f:
            seeds = [ln.strip() for ln in f if ln.strip()]
    elif spec is not None and (spec.seeds or spec.js_root is not None):
        # declarative <Seed> URLs, plus a <Root><Script> body executed
        # per keyin (RuleTree.Root fires once per spider instance)
        seeds = root_seeds(spec, cfg.keyins)
    else:
        seeds = None  # pure resume

    if seeds:
        # hosts outside the synthetic h%03d.example.com universe (e.g.
        # a dynamic spider's search host) need a politeness policy or
        # their seeds are silently dropped at admission — derive them
        # from the resolved seed list like run_oracle callers do by
        # hand with extra_hosts
        import re
        from dataclasses import replace as _dc_replace

        from pholcus_spark.urlnorm import canonicalize, host_of

        extra = set()
        for s in seeds:
            u = canonicalize(s["url"] if isinstance(s, dict) else s)
            h = host_of(u) if u else None
            if h and not re.fullmatch(r"h\d{3}\.example\.com", h):
                extra.add(h)
        extra -= set(cfg.extra_hosts)
        if extra:
            cfg = _dc_replace(
                cfg, extra_hosts=tuple(cfg.extra_hosts) + tuple(sorted(extra))
            )

    eng = CrawlEngine(spark, SnapshotStore(args.store), cfg)
    monitor = None
    if args.monitor_port is not None:
        from pholcus_spark.monitor import CrawlMonitor

        monitor = CrawlMonitor(eng, port=args.monitor_port)
        print(f"monitor: http://127.0.0.1:{monitor.start()}/status",
              file=sys.stderr)
    t0 = time.time()
    if args.new_run:
        eng.start_new_run(
            seeds,
            success_inherit=not args.no_success_inherit,
            failure_inherit=not args.no_failure_inherit,
        )
        seeds = None
    try:
        rounds = eng.run(seeds)
    finally:
        if monitor is not None:
            monitor.stop()
    wall = time.time() - t0
    visits = eng.fetched_df().count()
    items = eng.items_df().count()

    if args.export_failures:
        eng.export_failures(args.export_failures)
    if args.export_csv:
        from pholcus_spark import sinks

        sinks.write_csv(eng.items_df().drop("bytes"), args.export_csv)
    if args.export_excel:
        from pholcus_spark import sinks

        sinks.write_excel(eng.items_df().drop("bytes"), args.export_excel)
    if args.export_files:
        from pholcus_spark import sinks

        sinks.export_files(eng.items_df(), args.export_files)
    if args.export_warc:
        from pholcus_spark import sinks

        sinks.export_warc_bundle(
            eng.fetched_df().select("url", "bytes", "download_time"),
            args.export_warc,
        )

    print(
        json.dumps(
            {
                "rounds": rounds,
                "visits": visits,
                "items": items,
                "wall_s": round(wall, 2),
                "urls_per_sec": round(visits / wall, 2) if wall else None,
                "snapshot_id": eng.store.current_snapshot_id(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
