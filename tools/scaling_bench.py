"""Scaling-efficiency evidence: the same fetch-round job at two
parallelism levels (the sandbox stand-in for N vs 4N executors —
BASELINE.json requires ≥0.8 throughput scaling efficiency).

Workload: a wide single-round crawl — W URLs spread uniformly over
2000 hosts, no child links — so the measured quantity is the engine's
fetch+decode+commit capacity, the part that must scale with cluster
width. (Politeness windows still run; budgets are sized not to bind.)

Usage:
    python tools/scaling_bench.py                 # orchestrate 8 vs 32
    python tools/scaling_bench.py --worker CORES  # one level (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_URLS = int(os.environ.get("SCALING_URLS", "200000"))
N_HOSTS = 2000
LEVELS = (8, 32)


def run_worker(cores: int) -> None:
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.session import get_spark
    from pholcus_spark.tables import SnapshotStore

    spark = get_spark(f"scaling-{cores}", cores=cores)
    cfg = CrawlConfig(
        n_hosts=N_HOSTS,
        batch_size=N_URLS,
        limit=None,
        round_duration_ms=600_000,  # politeness must not bind a capacity test
        rules={("imgspider", "root"): {"child_rule": None, "max_depth": 0}},
    )
    seeds = [
        f"http://h{i % N_HOSTS:03d}.example.com/cap/{i}" for i in range(N_URLS)
    ]
    store_dir = tempfile.mkdtemp(prefix=f"pholcus_scale_{cores}_")
    try:
        eng = CrawlEngine(spark, SnapshotStore(store_dir), cfg)
        t0 = time.time()
        eng.run(seeds)
        wall = time.time() - t0
        items = eng.items_df().count()
        print(
            json.dumps(
                {
                    "cores": cores,
                    "urls": N_URLS,
                    "items": items,
                    "wall_s": round(wall, 2),
                    "urls_per_sec": round(items / wall, 1),
                }
            )
        )
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]))
        return
    results = {}
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)
    lo, hi = LEVELS
    eff = (results[hi]["urls_per_sec"] / results[lo]["urls_per_sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "levels": {str(k): v for k, v in results.items()},
                "efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
