"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed=42).

Spark's ``XxHash64`` expression hashes each column's bytes with the
standard XXH64 algorithm, chaining the running hash as the seed of the
next column (strings are hashed as their UTF-8 bytes, longs as 8
little-endian bytes). We replicate it here so the pure-Python crawl
oracle (tests) computes byte-identical ``url_key`` values to the Spark
engine's JVM-side ``F.xxhash64`` hot path.

Reference semantics being reproduced: pholcus derives its dedup key as
``MD5(Spider + Rule + URL + Method)`` (reference
``app/downloader/request/request.go:139-145``); we use the same tuple
but xxhash64 per the north rule.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * PRIME1 + PRIME4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """Standard XXH64 over ``data`` with ``seed``; returns unsigned 64-bit."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def _to_signed64(x: int) -> int:
    x &= MASK64
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_strings(*cols: str, seed: int = SPARK_HASH_SEED) -> int:
    """Replicates Spark ``F.xxhash64(c1, c2, ...)`` over string columns.

    Spark chains columns: the running hash seeds the next column's hash.
    Returns a signed 64-bit int (Spark LongType).
    """
    h = seed
    for c in cols:
        h = xxh64(c.encode("utf-8"), h)
    return _to_signed64(h)


def url_key(spider: str, rule: str, canonical_url: str, method: str) -> int:
    """The engine-wide dedup key (north rule: xxhash64 of canonical URL
    tuple; reference analog ``request.go:139-145`` uses MD5)."""
    return xxhash64_strings(spider, rule, canonical_url, method)
