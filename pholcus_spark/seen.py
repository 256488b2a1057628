"""Partitioned bloom-filter URL-seen sketches — the 10^10-frontier
dedup path (north rule; SURVEY.md §4 custom #1).

The exact ``url_seen`` table stays the source of truth (reference
analog: the success-history map, ``app/aid/history/success.go:16-45``),
but probing it is an O(|seen|) shuffle join per round. The sketch table
``seen_sketch`` holds one bloom filter per ``pmod(url_key, n_buckets)``
bucket; enqueue pre-filters candidates against it:

- bloom says ABSENT  → definitely new → admit without the exact join
  (no false negatives, so this is sound);
- bloom says PRESENT → maybe seen → confirm against the exact table
  (only the FPR-sized remainder + true dups reach the shuffle join).

Per-bucket filters keep each sketch row small (bytes column), let the
prefilter co-locate with a cheap shuffle on the bucket id, and let
updates touch only the buckets a round's new keys fall in. Sizing: at
10^10 keys and 10 bits/key the sketch is ~12.5 GB total — far too big
to broadcast, exactly right as a bucket-partitioned table (~1.2 MB per
bucket at 2^13 buckets).

``CuckooFilter`` is the deletion-capable variant (north-rule fallback):
same per-bucket table shape, used when seen entries must be evicted
(e.g. un-marking a URL so a re-crawl re-admits it). Matrix semantics
keep ``url_seen`` append-only, so the engine defaults to bloom.

All membership math is vectorized numpy inside Arrow-batched
``applyInPandas`` — no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import SEEN_SKETCH_SCHEMA

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@dataclass(frozen=True)
class BloomParams:
    n_buckets: int = 64
    bits_per_bucket: int = 1 << 16  # 64 Kbit → 8 KiB per bucket
    n_hashes: int = 7


def _mix(keys: np.ndarray, salt: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche over int64 keys (vectorized)."""
    x = keys.astype(np.uint64) + salt
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, params: BloomParams) -> np.ndarray:
    """(n_keys, n_hashes) bit positions via double hashing."""
    h1 = _mix(keys, np.uint64(0x9E3779B97F4A7C15))
    h2 = _mix(keys, np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
    i = np.arange(params.n_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(params.bits_per_bucket)).astype(
        np.int64
    )


def bitset_or_keys(bitset: np.ndarray, keys: np.ndarray, params: BloomParams) -> np.ndarray:
    pos = _positions(keys, params)
    np.bitwise_or.at(bitset, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitset


def contains_keys(bitset: np.ndarray, keys: np.ndarray, params: BloomParams) -> np.ndarray:
    """Boolean mask: True = maybe present, False = definitely absent."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(keys, params)
    bits = (bitset[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bucket_col(url_key, n_buckets: int):
    return F.pmod(url_key, F.lit(n_buckets)).cast("int")


def build_sketch(url_seen: DataFrame, params: BloomParams = BloomParams()) -> DataFrame:
    """Full rebuild: one bloom filter per bucket from the exact table.
    One shuffle on the bucket id; each task sees only its bucket's keys."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bitset = np.zeros(params.bits_per_bucket // 8, dtype=np.uint8)
        bitset_or_keys(bitset, pdf["url_key"].to_numpy(np.int64), params)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "sketch": [bitset.tobytes()]}
        )

    keyed = url_seen.select(
        bucket_col(F.col("url_key"), params.n_buckets).alias("bucket"), "url_key"
    )
    return keyed.groupBy("bucket").applyInPandas(_build, SEEN_SKETCH_SCHEMA)


def update_sketch(
    sketch: DataFrame, new_keys: DataFrame, params: BloomParams = BloomParams()
) -> DataFrame:
    """Incremental update: OR the new keys into their buckets' filters;
    untouched buckets pass through unchanged. Cogrouped by bucket —
    cost scales with the round's new keys, not the full seen set."""

    def _merge(sk: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
        if len(sk) > 0:
            bucket = int(sk["bucket"].iloc[0])
            bitset = np.frombuffer(sk["sketch"].iloc[0], dtype=np.uint8).copy()
        else:
            bucket = int(keys["bucket"].iloc[0])
            bitset = np.zeros(params.bits_per_bucket // 8, dtype=np.uint8)
        if len(keys) > 0:
            bitset_or_keys(bitset, keys["url_key"].to_numpy(np.int64), params)
        return pd.DataFrame({"bucket": [bucket], "sketch": [bitset.tobytes()]})

    keyed = new_keys.select(
        bucket_col(F.col("url_key"), params.n_buckets).alias("bucket"), "url_key"
    )
    return (
        sketch.groupBy("bucket")
        .cogroup(keyed.groupBy("bucket"))
        .applyInPandas(lambda sk, k: _merge(sk, k), SEEN_SKETCH_SCHEMA)
    )


def prefilter(
    cands: DataFrame, sketch: DataFrame, params: BloomParams = BloomParams()
) -> DataFrame:
    """Tag candidates with ``maybe_seen``. Shuffles candidates once on
    the bucket id to co-locate with their sketch row; rows in buckets
    with no sketch yet are definitely new."""
    out_schema = T.StructType(
        [f for f in cands.schema.fields]
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    cand_cols = [f.name for f in cands.schema.fields]

    def _probe(sk: pd.DataFrame, rows: pd.DataFrame) -> pd.DataFrame:
        if len(rows) == 0:
            return pd.DataFrame(columns=[*cand_cols, "maybe_seen"])
        rows = rows.drop(columns=["bucket"])
        if len(sk) == 0:
            rows["maybe_seen"] = False
            return rows
        bitset = np.frombuffer(sk["sketch"].iloc[0], dtype=np.uint8)
        rows["maybe_seen"] = contains_keys(
            bitset, rows["url_key"].to_numpy(np.int64), params
        )
        return rows

    keyed = cands.withColumn(
        "bucket", bucket_col(F.col("url_key"), params.n_buckets)
    )
    return (
        sketch.groupBy("bucket")
        .cogroup(keyed.groupBy("bucket"))
        .applyInPandas(lambda sk, rows: _probe(sk, rows), out_schema)
    )


def anti_join_seen_bloom(
    cands: DataFrame,
    url_seen: DataFrame,
    sketch: DataFrame,
    params: BloomParams = BloomParams(),
    broadcast_confirm: bool = False,
) -> DataFrame:
    """Drop-in replacement for frontier.anti_join_seen: bloom-prefilter
    then exact confirmation only for the 'maybe' remainder. Result is
    identical to the exact anti-join (bloom has no false negatives);
    the exact join's probe side shrinks from |cands| to |maybes|.

    With ``broadcast_confirm``, the confirmation inverts so the big
    ``url_seen`` table never shuffles: broadcast the maybe-keys into a
    semi-join SCAN of url_seen (hash probe per row), then anti-join
    the maybes against the (small) hit set. Use when the maybe set is
    known-small (low FPR and few duplicate links); with heavy
    duplication the default shuffle join is the safe plan.
    """
    from .frontier import anti_join_frames, seen_frames

    tagged = prefilter(cands.filter(~F.col("reloadable")), sketch, params)
    fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    if broadcast_confirm:
        confirmed_new = maybes
        for frame in seen_frames(url_seen):
            hits = frame.join(
                F.broadcast(confirmed_new.select("url_key")),
                "url_key", "left_semi",
            )
            confirmed_new = confirmed_new.join(
                F.broadcast(hits), "url_key", "left_anti"
            )
    else:
        confirmed_new = anti_join_frames(maybes, url_seen)
    reloadable = cands.filter(F.col("reloadable"))
    return fresh.unionByName(confirmed_new).unionByName(reloadable)


class CuckooFilter:
    """Deletion-capable seen-set sketch (the cuckoo-filter fallback).

    Standard 2-choice cuckoo hashing with 4-slot buckets and 16-bit
    fingerprints (~3 per-mille FPR): insert kicks resident fingerprints
    between their two candidate buckets; delete removes a matching
    fingerprint from either bucket, which bloom filters cannot do.
    Serializes to bytes for the ``seen_sketch`` table shape
    ``(bucket, sketch)``.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 12, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )

    def _fingerprint(self, key: int) -> int:
        fp = int(_mix(np.array([key], dtype=np.int64), np.uint64(0xDEADBEEF))[0]) & 0xFFFF
        return fp or 1  # 0 means empty slot

    def _index(self, key: int) -> int:
        return int(_mix(np.array([key], dtype=np.int64), np.uint64(0x1234ABCD))[0]) % self.n_buckets

    def _alt_index(self, i: int, fp: int) -> int:
        h = int(_mix(np.array([fp], dtype=np.int64), np.uint64(0x5BD1E995))[0])
        return (i ^ h) % self.n_buckets

    def insert(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index(key)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i][empty[0]] = fp
                return True
        # kick a random-ish resident (deterministic: slot by fp)
        i = i1
        for kick in range(self.MAX_KICKS):
            slot = (fp + kick) % self.SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt_index(i, fp)
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i][empty[0]] = fp
                return True
        return False  # table full — caller should resize

    def contains(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index(key)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            hit = np.flatnonzero(self.table[i] == fp)
            if len(hit):
                self.table[i][hit[0]] = 0
                return True
        return False

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int = 1 << 12) -> "CuckooFilter":
        table = np.frombuffer(data, dtype=np.uint16).reshape(
            n_buckets, cls.SLOTS
        ).copy()
        return cls(n_buckets, table)
