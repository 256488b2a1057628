"""Snapshot table store — Iceberg-style semantics on parquet + JSON
manifests (the Iceberg runtime jar is not in the sandbox; SURVEY.md §7
step 8 keeps the table layer behind this one interface so a real
Iceberg catalog can be swapped in unchanged).

Semantics provided:
- multi-table atomic commit: one snapshot covers the whole round's
  state (frontier, url_seen, failures, items, rounds metrics) —
  ``os.replace`` of the ``current`` pointer is the atomic step;
- time-travel/resume: any snapshot can be re-opened; a killed crawl
  resumes from the last committed snapshot (north-rule checkpoint);
- append vs overwrite per table per commit (url_seen/items/rounds are
  append-only; frontier/failures are rewritten per round like the
  reference's failure store rewrite ``failure.go:51-107``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # --- snapshot bookkeeping ---

    def _current_path(self) -> str:
        return os.path.join(self.root, "current")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.root, "snapshots", f"snap-{snapshot_id:08d}.json")

    # --- run controls (the reference web UI's stop / pauseRecover,
    # web/websocket_controller.go:196-218, as a store-level control
    # channel: any process with store access — the monitor's mutating
    # endpoints, an operator shell — flips the command; the engine
    # polls it at round boundaries, where a pause/stop is safe by
    # construction (every round commits atomically, so a stop here is
    # indistinguishable from a kill+resume, which F5 already covers).

    def _control_path(self) -> str:
        return os.path.join(self.root, "control.json")

    def read_control(self) -> str:
        """Current run command: 'run' (default), 'pause', or 'stop'."""
        try:
            with open(self._control_path()) as f:
                cmd = json.load(f).get("command", "run")
        except (FileNotFoundError, json.JSONDecodeError):
            return "run"
        return cmd if cmd in ("run", "pause", "stop") else "run"

    def write_control(self, command: str) -> None:
        if command not in ("run", "pause", "stop"):
            raise ValueError(f"bad control command {command!r}")
        tmp = self._control_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"command": command, "ts_ms": int(time.time() * 1000)}, f
            )
        os.replace(tmp, self._control_path())

    def read_manifest(self, snapshot_id: int | None = None) -> dict:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return {"snapshot_id": -1, "round": -1, "tables": {}, "meta": {}}
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    # --- read ---

    def load(
        self,
        spark: SparkSession,
        table: str,
        schema: T.StructType,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """DataFrame over all files of ``table`` at a snapshot; empty DF
        with the right schema when the table has no data yet."""
        manifest = self.read_manifest(snapshot_id)
        files = manifest["tables"].get(table, [])
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, "data", f) for f in files]
        return spark.read.schema(schema).parquet(*paths)

    # --- write ---

    def commit(
        self,
        round_no: int,
        writes: dict[str, tuple[DataFrame, str]],
        meta: dict | None = None,
        adopts: dict[str, tuple[str, str]] | None = None,
        registered: dict[str, tuple[list[str], str]] | None = None,
        registered_fn=None,
    ) -> int:
        """Commit one snapshot. ``writes[table] = (df, mode)`` where mode
        is 'append' (new files added to the table's file list) or
        'overwrite' (file list replaced). Tables not mentioned carry
        their previous file lists forward unchanged.

        ``adopts[table] = (src_dir, mode)`` registers parquet files
        already on disk (e.g. a round's staged fetch output) by RENAMING
        the directory into the table — a zero-copy commit, the Iceberg
        add-files analog. Adoption happens after all ``writes`` finish,
        so writers may still read from ``src_dir`` while committing.

        ``registered[table] = (files, mode)`` records files a caller
        already wrote under ``data/`` (e.g. a bucketed-table insert,
        whose file names encode bucket ids and so must be written by
        the table writer itself) — manifest bookkeeping only.

        ``registered_fn`` is the deferred variant: a callable returning
        such a dict, executed CONCURRENTLY with the ``writes`` jobs so
        a bucketed-table insert overlaps the round's other writers
        instead of serializing before them."""
        for table, (_df, mode) in writes.items():
            if mode not in ("append", "overwrite"):
                raise ValueError(f"bad mode {mode!r} for table {table!r}")
        for table, (_src, mode) in (adopts or {}).items():
            if mode not in ("append", "overwrite"):
                raise ValueError(f"bad adopt mode {mode!r} for table {table!r}")
        for table, (_files, mode) in (registered or {}).items():
            if mode not in ("append", "overwrite"):
                raise ValueError(f"bad registered mode {mode!r} for {table!r}")
        prev = self.read_manifest()
        snapshot_id = prev["snapshot_id"] + 1
        tables: dict[str, list[str]] = {k: list(v) for k, v in prev["tables"].items()}

        _timing = os.environ.get("PHOLCUS_TIMING") == "1"

        def _write(item):
            table, (df, mode) = item
            rel = f"{table}/snap-{snapshot_id:08d}"
            out_dir = os.path.join(self.root, "data", rel)
            t0 = time.time()
            df.write.mode("overwrite").parquet(out_dir)
            if _timing:
                print(f"  [commit {snapshot_id}] {table}: {time.time() - t0:.1f}s",
                      flush=True)
            return table, mode, [
                f"{rel}/{f}" for f in os.listdir(out_dir) if f.endswith(".parquet")
            ]

        # independent tables → submit the write jobs concurrently; the
        # Spark scheduler interleaves them across cores, cutting the
        # per-round commit wall to ~the largest single write. The
        # deferred registered_fn (bucketed url_seen insert) rides the
        # same pool.
        reg_from_fn: dict[str, tuple[list[str], str]] = {}
        if len(writes) > 1 or registered_fn is not None:
            from concurrent.futures import ThreadPoolExecutor

            n_workers = len(writes) + (1 if registered_fn else 0)
            with ThreadPoolExecutor(max_workers=max(n_workers, 1)) as pool:
                fut = pool.submit(registered_fn) if registered_fn else None
                results = list(pool.map(_write, writes.items()))
                if fut is not None:
                    reg_from_fn = fut.result()
        else:
            results = [_write(item) for item in writes.items()]
        for table, (src_dir, mode) in (adopts or {}).items():
            rel = f"{table}/snap-{snapshot_id:08d}"
            out_dir = os.path.join(self.root, "data", rel)
            os.makedirs(os.path.dirname(out_dir), exist_ok=True)
            # A crash between this rename and the manifest flip leaves a
            # non-empty out_dir from the torn commit; the resumed crawl
            # recomputes the same snapshot_id, so the stale dir must be
            # cleared or os.replace fails ENOTEMPTY forever.
            if os.path.exists(out_dir):
                shutil.rmtree(out_dir)
            os.replace(src_dir, out_dir)
            results.append(
                (
                    table,
                    mode,
                    [
                        f"{rel}/{f}"
                        for f in os.listdir(out_dir)
                        if f.endswith(".parquet")
                    ],
                )
            )
        for table, (files, mode) in {**(registered or {}), **reg_from_fn}.items():
            results.append((table, mode, list(files)))
        for table, mode, new_files in results:
            if mode == "append":
                tables.setdefault(table, []).extend(new_files)
            elif mode == "overwrite":
                tables[table] = new_files
            else:
                raise ValueError(f"bad mode {mode!r}")
        manifest = {
            "snapshot_id": snapshot_id,
            "round": round_no,
            "committed_at_ms": int(time.time() * 1000),
            "tables": tables,
            "meta": {**prev.get("meta", {}), **(meta or {})},
        }
        tmp = self._manifest_path(snapshot_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(snapshot_id))
        ptr_tmp = self._current_path() + ".tmp"
        with open(ptr_tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(ptr_tmp, self._current_path())
        return snapshot_id

    def read_appended(
        self,
        spark: SparkSession,
        table: str,
        schema: T.StructType,
        from_snapshot: int,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Iceberg incremental-scan analog: rows of ``table`` in files
        ADDED strictly after ``from_snapshot`` up to and including
        ``to_snapshot`` (default: current). The downstream-consumer API
        — a training pipeline tails a crawl store with
        ``read_appended("items", last_seen_snap)`` and processes only
        new work, instead of re-scanning the whole table each time.

        Metadata-only planning: one file-list set-difference between
        two manifests (no data read, no listing of the data dir), so
        planning cost is O(files in manifest) regardless of table size
        — at the 10^10-URL design point the incremental batch reads
        only the appended files' bytes.

        Append-mode tables only ("items", "fetched", "url_seen",
        "rounds"): a table that was OVERWRITTEN in the interval
        (e.g. ``pending``/``failures`` round rewrites, compactions)
        raises ValueError,
        because new-files-minus-old-files would silently misread a
        rewrite as fresh rows (Iceberg's incremental scan refuses
        non-append snapshots the same way).
        """
        base = self.read_manifest(from_snapshot)["tables"].get(table, [])
        head_manifest = (
            self.read_manifest(to_snapshot)
            if to_snapshot is not None
            else self.read_manifest()
        )
        head = head_manifest["tables"].get(table, [])
        base_set = set(base)
        missing = base_set - set(head)
        if missing:
            raise ValueError(
                f"table {table!r} was overwritten/compacted between "
                f"snapshots {from_snapshot} and "
                f"{to_snapshot if to_snapshot is not None else 'current'}: "
                f"{len(missing)} base files no longer present — "
                "incremental read is append-only"
            )
        new_files = [f for f in head if f not in base_set]
        if not new_files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, "data", f) for f in new_files]
        return spark.read.schema(schema).parquet(*paths)

    # --- maintenance ---

    def snapshot_ids(self) -> list[int]:
        """All committed snapshot ids, ascending (from the manifest dir,
        so ids survive process restarts)."""
        out = []
        for name in os.listdir(os.path.join(self.root, "snapshots")):
            if name.startswith("snap-") and name.endswith(".json"):
                out.append(int(name[len("snap-"):-len(".json")]))
        return sorted(out)

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg ``expire_snapshots`` analog: retain the newest
        ``keep_last`` snapshots (always including ``current``), delete
        older manifests, and delete data files referenced ONLY by
        expired manifests (reference ``app/aid/history/failure.go``
        rewrites its whole store each flush; here history accumulates
        as snapshots, so a long crawl needs bounded retention — at the
        10^10-URL design point every round's overwritten ``pending``
        rewrite would otherwise pin dead files forever).

        Deliberately conservative, like Iceberg: only files that appear
        in an expired manifest and in no retained manifest are removed.
        Files never referenced by any manifest (torn-commit leftovers,
        the bucketed seen catalog's own generation dirs) are the
        province of their own cleanup paths and are not touched.

        Returns ``{"expired": [ids], "retained": [ids],
        "files_deleted": n}``. Time-travel ``load()`` keeps working for
        retained ids and raises ``FileNotFoundError`` for expired ones.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        ids = self.snapshot_ids()
        cur = self.current_snapshot_id()
        retained = set(ids[-keep_last:])
        if cur is not None:
            retained.add(cur)
        expired = [i for i in ids if i not in retained]
        if not expired:
            return {"expired": [], "retained": sorted(retained),
                    "files_deleted": 0}
        live: set[str] = set()
        for i in sorted(retained):
            for files in self.read_manifest(i)["tables"].values():
                live.update(files)
        dead: set[str] = set()
        for i in expired:
            for files in self.read_manifest(i)["tables"].values():
                dead.update(f for f in files if f not in live)
        deleted = 0
        for rel in sorted(dead):
            path = os.path.join(self.root, "data", rel)
            try:
                os.remove(path)
                deleted += 1
            except FileNotFoundError:
                pass
            parent = os.path.dirname(path)
            try:  # prune now-empty snap dirs (best effort)
                os.rmdir(parent)
            except OSError:
                pass
        for i in expired:
            try:
                os.remove(self._manifest_path(i))
            except FileNotFoundError:
                pass
        return {"expired": expired, "retained": sorted(retained),
                "files_deleted": deleted}

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
