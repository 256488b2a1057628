"""url_seen as a bucketed base+delta catalog table pair — the
shuffle-free, sort-free confirm join (round-2 #1, round-3 #5 scale
items).

The default anti-join (`frontier.anti_join_seen`) hash-shuffles the
full seen table every round; at the 10^10-key design point that shuffle
dominates round cost. Storing ``url_seen`` as Spark bucketed tables
(``CLUSTERED BY (url_key) INTO k BUCKETS``) makes the confirm join read
the seen side in place: the scan reports ``HashPartitioning(url_key,
k)``, so the planner shuffles only the (small) candidate side to k
partitions and the seen table NEVER moves.

Round-3 refinement — kill the per-round seen-side SORT too. A
SortMergeJoin needs both sides ordered; Spark only trusts a bucketed
table's ``SORTED BY`` metadata when every bucket holds at most ONE
file (and only with ``spark.sql.legacy.bucketedTableScan.
outputOrdering=true``, set here). Per-round appends would break that
immediately, so the table is split:

- **base**: one sorted file per bucket, rewritten only by compaction —
  its scan feeds the SMJ with NO Sort operator (O(10^10) streamed, not
  re-sorted, per round);
- **delta**: the appends since the last compaction, same bucket width
  (so the already-exchanged candidate side is reused), multiple files
  per bucket — its SMJ sorts only the delta (bounded by the compaction
  trigger), never the base.

The confirm is ``cands ⟕̸ base ⟕̸ delta`` (two anti-joins; one
candidate Exchange + Sort, reused across both). Compaction folds
base+delta into a fresh base generation.

Reference semantics preserved: the table is exactly the success-history
set (``app/aid/history/success.go:16-45``), append-only per round.

Snapshot-store integration (torn-commit safety):
- every append goes through a bucketed ``insertInto`` of the delta
  table (bucket ids are encoded in the file names, so only table
  inserts may write here); the new file names are recorded in the
  round's manifest;
- the catalog tables scan their whole location dirs, so files from a
  commit that died before the manifest flip would be visible — at
  engine open, ``open`` deletes any file not listed in the current
  manifest (the snapshot contract's orphan rule);
- compaction rewrites into a fresh *generation* directory pair and
  flips the manifest before deleting the old one, so a crash at any
  point leaves a readable store (stale generations are removed at
  ``open``).

Sizing: k=32 matches the local test width; at 10^10 keys use k≈2^13 so
each bucket holds ~10 MB of keys (set ``CrawlConfig.seen_buckets``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

GEN_PREFIX = "url_seen_b_g"
DELTA_PREFIX = "url_seen_d_g"


class BucketedSeen:
    def __init__(self, spark: SparkSession, store_root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = store_root
        self.n_buckets = n_buckets
        # required for the scan to report SORTED BY ordering at all;
        # Spark still falls back to an explicit Sort whenever a bucket
        # holds more than one file, so this is never a correctness risk
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        # one catalog table pair per store (tests run many stores in
        # one session; the names must not collide)
        import hashlib

        tag = hashlib.md5(os.path.abspath(store_root).encode()).hexdigest()[:8]
        self.table = f"url_seen_b_{tag}"
        self.delta_table = f"url_seen_d_{tag}"

    # --- location/generation bookkeeping ---

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, "data", f"{GEN_PREFIX}{gen}")

    def _gen_rel(self, gen: int) -> str:
        return f"{GEN_PREFIX}{gen}"

    def _delta_dir(self, gen: int) -> str:
        return os.path.join(self.root, "data", f"{DELTA_PREFIX}{gen}")

    def _delta_rel(self, gen: int) -> str:
        return f"{DELTA_PREFIX}{gen}"

    def _create_table(self, table: str, loc: str) -> None:
        os.makedirs(loc, exist_ok=True)
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        self.spark.sql(
            f"""CREATE TABLE {table} (url_key BIGINT)
                USING parquet
                CLUSTERED BY (url_key) SORTED BY (url_key)
                INTO {self.n_buckets} BUCKETS
                LOCATION '{loc}'"""
        )

    def _create(self, gen: int) -> None:
        self._create_table(self.table, self._gen_dir(gen))
        self._create_table(self.delta_table, self._delta_dir(gen))

    def open(self, gen: int, manifest_files: list[str]) -> None:
        """(Re-)register the catalog tables over generation ``gen`` and
        reconcile the directories against the manifest: files written
        by a torn commit (and whole stale generations) are deleted so
        the table scans see exactly the committed snapshot."""
        self._create(gen)
        gen_rel, delta_rel = self._gen_rel(gen), self._delta_rel(gen)
        for f in manifest_files:
            assert f.startswith((gen_rel + "/", delta_rel + "/")), (
                f"manifest url_seen file {f!r} outside generation {gen}"
            )
        listed_base = {
            os.path.basename(f)
            for f in manifest_files
            if f.startswith(gen_rel + "/")
        }
        listed_delta = {
            os.path.basename(f)
            for f in manifest_files
            if f.startswith(delta_rel + "/")
        }
        for loc, listed in (
            (self._gen_dir(gen), listed_base),
            (self._delta_dir(gen), listed_delta),
        ):
            for name in os.listdir(loc):
                if name.startswith("part-") and name not in listed:
                    os.remove(os.path.join(loc, name))
        # stale generations from interrupted compactions
        data_dir = os.path.join(self.root, "data")
        for name in os.listdir(data_dir):
            if (
                name.startswith((GEN_PREFIX, DELTA_PREFIX))
                and name not in (gen_rel, delta_rel)
            ):
                shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.delta_table)

    # --- read / write ---

    def frames(self) -> list[DataFrame]:
        """[base, delta] for the confirm anti-joins: fold
        ``cands.join(f, 'url_key', 'left_anti')`` over these and the
        planner shuffles+sorts only the candidate side (once) plus the
        small delta — the base streams in place, pre-sorted."""
        return [self.spark.table(self.table),
                self.spark.table(self.delta_table)]

    def df(self) -> DataFrame:
        """The full seen set (base ∪ delta) for whole-set consumers
        (bloom sketch rebuild, exports). The union discards the bucket
        property — use ``frames()`` for joins."""
        base, delta = self.frames()
        return base.unionByName(delta)

    def _part_files(self, loc: str) -> set[str]:
        return {n for n in os.listdir(loc) if n.startswith("part-")}

    def append(self, new_keys: DataFrame, gen: int,
               n_hint: int | None = None) -> list[str]:
        """Bucketed append of the round's new keys to the DELTA table;
        returns the new files' manifest-relative names. Large appends
        pre-repartition to the bucket layout (~1 file per bucket);
        small rounds coalesce to one task (the writer re-buckets rows
        into per-bucket files regardless of input partitioning),
        avoiding n_buckets tiny tasks per round."""
        loc = self._delta_dir(gen)
        before = self._part_files(loc)
        keys = new_keys.select("url_key")
        if n_hint is not None and n_hint < 4096 * self.n_buckets:
            keys = keys.coalesce(1)
        else:
            keys = keys.repartition(self.n_buckets, "url_key")
        keys.write.mode("append").insertInto(self.delta_table)
        self.spark.catalog.refreshTable(self.delta_table)
        new = sorted(self._part_files(loc) - before)
        return [f"{self._delta_rel(gen)}/{n}" for n in new]

    def bulk_load(self, src: DataFrame, gen: int) -> list[str]:
        """Write ``src`` as generation ``gen``'s BASE: one sorted file
        per (non-empty) bucket — the layout whose scan needs no Sort.
        ``repartition(k, url_key)`` uses the same murmur3-pmod hash as
        the bucket assignment, so each output task holds exactly one
        bucket's keys. Used by compaction and bulk migrations."""
        tmp_table = f"{self.table}_load{gen}"
        loc = self._gen_dir(gen)
        self._create_table(tmp_table, loc)
        (
            src.repartition(self.n_buckets, "url_key")
            .write.mode("append")
            .insertInto(tmp_table)
        )
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        # bulk_load may run before the catalog pair exists (the
        # bucket-width-change path at engine open in a FRESH session
        # loads the new generation first and registers tables after);
        # refreshing an unregistered table raises TABLE_OR_VIEW_NOT_FOUND
        if self.spark.catalog.tableExists(self.table):
            self.spark.catalog.refreshTable(self.table)
        return [
            f"{self._gen_rel(gen)}/{n}" for n in sorted(self._part_files(loc))
        ]

    def compact(self, gen: int,
                manifest_files: list[str] | None = None) -> tuple[int, list[str]]:
        """Fold the committed base+delta files into generation
        ``gen+1``'s base (one sorted file per bucket, empty delta).
        Returns (new_gen, new file names); the caller commits the
        manifest flip, after which ``open`` garbage-collects the old
        generation.

        Reads from the MANIFEST file list, not the directory-scanning
        catalog tables: an orphan part file from a torn commit earlier
        in the same session (insert finished, manifest flip aborted)
        must not be folded into the new committed generation — orphan
        cleanup only runs at engine open, so the directory can be
        dirtier than the snapshot."""
        new_gen = gen + 1
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
        files = self.bulk_load(src, new_gen)
        # re-point the table pair at the new generation (fresh empty
        # delta dir)
        self._create(new_gen)
        self.spark.catalog.refreshTable(self.table)
        self.spark.catalog.refreshTable(self.delta_table)
        return new_gen, files
