"""Raw fetch-kernel scaling ceiling (measurement control for
tools/scaling_bench.py): quantifies how much of the 4->16-core
efficiency loss is the BOX (shared-host variance, memory bandwidth)
versus the engine. Run: python tools/kernel_scaling.py: the same per-URL work the engine's
fetch UDF does (synthetic image gen + encode + phash), run through a
plain multiprocessing pool at N procs — no Spark, no shuffle, no I/O.
Whatever efficiency THIS loses 4->16 is the box's intrinsic ceiling
(memory bandwidth/allocator contention), not engine overhead."""
import sys, time, os
from multiprocessing import Pool
sys.path.insert(0, "/root/repo")

def work(args):
    lo, hi = args
    from pholcus_spark import synthetic
    n = 0
    for i in range(lo, hi):
        r = synthetic.fetch_one(
            f"http://h{i % 2000:03d}.example.com/page/{i:09d}", 1, 0, 2000, 5, 6)
        n += len(r.payload or b"")
    return n

def leg(procs, total=24000):
    chunk = total // procs
    spans = [(i * chunk, (i + 1) * chunk) for i in range(procs)]
    t0 = time.time()
    with Pool(procs) as p:
        sizes = p.map(work, spans)
    wall = time.time() - t0
    return total / wall, wall

if __name__ == "__main__":
    levels = tuple(
        int(x) for x in os.environ.get("KERNEL_LEVELS", "4,16,4,16").split(",")
    )
    for procs in levels:
        ups, wall = leg(procs)
        print(f"KERNEL procs={procs} urls_per_sec={ups:.1f} wall={wall:.1f}")
