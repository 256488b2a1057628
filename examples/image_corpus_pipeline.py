"""End-to-end example: crawl → ingest chain → curation → WebDataset.

Runs the whole image-corpus path on the synthetic sandbox web in one
session — the script a new user reads to see how the pieces snap
together:

  1. polite crawl (robots + crawl-delay budgets, resumable store)
  2. ingest chain over the fetched payloads (sniff → decode with the
     sniffed codec → entropy junk gate → dihedral-orbit dedup)
  3. caption consolidation + duplicated-caption spam gate
  4. aspect bucketing + patch-token budget selection
  5. WebDataset tar shards + a WARC archive with revisit dedup

Usage:  python examples/image_corpus_pipeline.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from pholcus_spark import harvest, multimodal, pipeline, synthetic
from pholcus_spark.crawler import CrawlEngine
from pholcus_spark.oracle import CrawlConfig
from pholcus_spark.session import get_spark
from pholcus_spark.tables import SnapshotStore
from pholcus_spark.webdataset import write_webdataset


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="image_corpus_"
    )
    spark = get_spark(cores=8)

    # 1. crawl: 10 hosts, 120 pages, politeness on
    cfg = CrawlConfig(n_hosts=10, batch_size=32, limit=120)
    eng = CrawlEngine(
        spark, SnapshotStore(f"{out_dir}/store"), cfg
    )
    rounds = eng.run(synthetic.seed_urls(10, cfg.n_hosts))
    fetched = eng.fetched_df()
    print(f"crawl: {rounds} rounds, {fetched.count()} pages")

    # 2. ingest chain over the image payloads the crawl captured
    images = fetched.filter(F.col("image_id").isNotNull()).select(
        "image_id", "bytes", F.col("fmt").alias("fmt"),
        "url", "caption",
    )
    triage = pipeline.ingest_images(images)
    triage.groupBy("status").count().orderBy("status").show()
    kept = triage.filter(F.col("status") == "kept").select("image_id")

    # 3. caption hygiene: spam gate then per-image consolidation
    pairs = images.join(kept, "image_id")
    pairs = harvest.caption_spam(pairs, image_col="image_id")
    pairs = pairs.filter(~F.col("is_spam"))
    meta = multimodal.decode_image_meta(pairs)
    best = harvest.caption_consolidate(
        pairs.join(
            meta.select("image_id", "phash"), "image_id"
        ),
        key_col="phash",
    )
    print(f"corpus: {best.count()} (image, caption) rows after hygiene")

    # 4. geometry: aspect buckets + vision-token budget
    sized = meta.join(
        best.select(F.col("caption").alias("caption"), "phash"),
        "phash",
    )
    bucketed = multimodal.aspect_buckets(sized)
    selected = multimodal.patch_budget_select(
        bucketed, budget_tokens=200_000
    )
    print(f"selected {selected.count()} images within the patch budget")

    # 5. ship: WebDataset shards + WARC with revisit dedup
    shard_rows = (
        selected.select("image_id")
        .join(meta.select("image_id", "w", "h", "fmt", "phash"),
              "image_id")
        .join(pairs.select("image_id", "bytes", "caption"), "image_id")
    )
    write_webdataset(shard_rows, f"{out_dir}/wds", n_shards=4)
    print(f"webdataset shards under {out_dir}/wds")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
