"""url_seen as a bucketed datasource table — the shuffle-free confirm
join (round-2 #1 scale item).

The default anti-join (`frontier.anti_join_seen`) hash-shuffles the
full seen table every round; at the 10^10-key design point that shuffle
dominates round cost. Storing ``url_seen`` as a Spark bucketed table
(``CLUSTERED BY (url_key) INTO k BUCKETS``) makes the confirm join read
the seen side in place: the scan reports ``HashPartitioning(url_key,
k)``, so the planner shuffles only the (small) candidate side to k
partitions and the seen table NEVER moves — per-round join cost is
O(|candidates|) + a co-located streamed scan, flat in crawl age.

Reference semantics preserved: the table is exactly the success-history
set (``app/aid/history/success.go:16-45``), append-only per round.

Snapshot-store integration (torn-commit safety):
- every append goes through a bucketed ``insertInto`` (bucket ids are
  encoded in the file names, so only table inserts may write here);
  the new file names are recorded in the round's manifest;
- the catalog table scans the whole location dir, so files from a
  commit that died before the manifest flip would be visible — at
  engine open, ``reconcile`` deletes any file not listed in the
  current manifest (the snapshot contract's orphan rule);
- compaction rewrites into a fresh *generation* directory and flips
  the manifest before deleting the old one, so a crash at any point
  leaves a readable store (stale generations are removed by
  ``reconcile``).

Sizing: k=32 matches the local test width; at 10^10 keys use k≈2^13 so
each bucket holds ~10 MB of keys (set ``CrawlConfig.seen_buckets``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEN_PREFIX = "url_seen_b_g"


class BucketedSeen:
    def __init__(self, spark: SparkSession, store_root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = store_root
        self.n_buckets = n_buckets
        # one catalog table per store (tests run many stores in one
        # session; the name must not collide)
        import hashlib

        tag = hashlib.md5(os.path.abspath(store_root).encode()).hexdigest()[:8]
        self.table = f"url_seen_b_{tag}"

    # --- location/generation bookkeeping ---

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, "data", f"{GEN_PREFIX}{gen}")

    def _gen_rel(self, gen: int) -> str:
        return f"{GEN_PREFIX}{gen}"

    def _create(self, gen: int, table: str | None = None) -> None:
        table = table or self.table
        loc = self._gen_dir(gen)
        os.makedirs(loc, exist_ok=True)
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        self.spark.sql(
            f"""CREATE TABLE {table} (url_key BIGINT)
                USING parquet
                CLUSTERED BY (url_key) SORTED BY (url_key)
                INTO {self.n_buckets} BUCKETS
                LOCATION '{loc}'"""
        )

    def open(self, gen: int, manifest_files: list[str]) -> None:
        """(Re-)register the catalog table over generation ``gen`` and
        reconcile the directory against the manifest: files written by
        a torn commit (and whole stale generations) are deleted so the
        table scan sees exactly the committed snapshot."""
        self._create(gen)
        listed = {os.path.basename(f) for f in manifest_files}
        gen_rel = self._gen_rel(gen)
        for f in manifest_files:
            assert f.startswith(gen_rel + "/"), (
                f"manifest url_seen file {f!r} outside generation {gen}"
            )
        loc = self._gen_dir(gen)
        for name in os.listdir(loc):
            if name.startswith("part-") and name not in listed:
                os.remove(os.path.join(loc, name))
        # stale generations from interrupted compactions
        data_dir = os.path.join(self.root, "data")
        for name in os.listdir(data_dir):
            if name.startswith(GEN_PREFIX) and name != gen_rel:
                shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)
        self.spark.catalog.refreshTable(self.table)

    # --- read / write ---

    def df(self) -> DataFrame:
        """The seen set as a bucketed scan — join this on url_key and
        the planner shuffles only the other side."""
        return self.spark.table(self.table)

    def _part_files(self, loc: str) -> set[str]:
        return {n for n in os.listdir(loc) if n.startswith("part-")}

    def append(self, new_keys: DataFrame, gen: int,
               n_hint: int | None = None) -> list[str]:
        """Bucketed append of the round's new keys; returns the new
        files' manifest-relative names. Large appends pre-repartition
        to the bucket layout (~1 file per bucket); small rounds
        coalesce to one task (the writer re-buckets rows into per-
        bucket files regardless of input partitioning), avoiding
        n_buckets tiny tasks per round."""
        loc = self._gen_dir(gen)
        before = self._part_files(loc)
        keys = new_keys.select("url_key")
        if n_hint is not None and n_hint < 4096 * self.n_buckets:
            keys = keys.coalesce(1)
        else:
            keys = keys.repartition(self.n_buckets, "url_key")
        keys.write.mode("append").insertInto(self.table)
        self.spark.catalog.refreshTable(self.table)
        new = sorted(self._part_files(loc) - before)
        return [f"{self._gen_rel(gen)}/{n}" for n in new]

    def compact(self, gen: int,
                manifest_files: list[str] | None = None) -> tuple[int, list[str]]:
        """Rewrite all committed files into generation ``gen+1`` (one
        file per bucket). Returns (new_gen, new file names); the caller
        commits the manifest flip, after which ``open``/``reconcile``
        garbage-collects the old generation.

        Reads from the MANIFEST file list, not the directory-scanning
        catalog table: an orphan part file from a torn commit earlier in
        the same session (insert finished, manifest flip aborted) must
        not be folded into the new committed generation — reconcile only
        runs at engine open, so the directory can be dirtier than the
        snapshot."""
        new_gen = gen + 1
        tmp_table = f"{self.table}_c{new_gen}"
        self._create(new_gen, tmp_table)
        if manifest_files is not None:
            data_dir = os.path.join(self.root, "data")
            paths = [os.path.join(data_dir, f) for f in manifest_files]
            src = (
                self.spark.read.schema("url_key BIGINT").parquet(*paths)
                if paths
                else self.spark.createDataFrame([], "url_key BIGINT")
            )
        else:
            src = self.df()
        (
            src
            .repartition(self.n_buckets, "url_key")
            .write.mode("append")
            .insertInto(tmp_table)
        )
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        loc = self._gen_dir(new_gen)
        files = [f"{self._gen_rel(new_gen)}/{n}" for n in sorted(self._part_files(loc))]
        # re-point the main table at the new generation
        self._create(new_gen)
        self.spark.catalog.refreshTable(self.table)
        return new_gen, files
