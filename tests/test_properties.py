"""Property-based tests (hypothesis) for the invariant-heavy
primitives: URL canonicalization, the Spark-parity xxhash64, the PNG
codec round-trip, and bloom soundness. No Spark session needed —
these pin the pure kernels the distributed operators are built on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pholcus_spark import seen
from pholcus_spark.hashing import url_key, xxh64
from pholcus_spark.imaging import decode_png, encode_png, phash64
from pholcus_spark.urlnorm import canonicalize, host_of

url_chars = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=0,
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https"]),
    host=st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.-]{0,20}[A-Za-z0-9])?", fullmatch=True),
    path=url_chars,
    frag=url_chars,
)
def test_canonicalize_idempotent(scheme, host, path, frag):
    u = f"{scheme}://{host}/{path}#{frag}"
    c = canonicalize(u)
    if c:
        assert canonicalize(c) == c  # idempotence
        assert "#" not in c  # fragment stripped
        h = host_of(c)
        assert h == h.lower()


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(0, 2**63 - 1))
def test_xxh64_deterministic_and_seeded(data, seed):
    a = xxh64(data, seed)
    assert a == xxh64(data, seed)
    assert 0 <= a < 2**64
    # seed sensitivity (differing seeds should virtually never collide)
    if data:
        assert xxh64(data, seed) != xxh64(data, (seed + 1) & (2**63 - 1)) or not data


@settings(max_examples=50, deadline=None)
@given(
    st.text(min_size=0, max_size=20),
    st.text(min_size=0, max_size=20),
)
def test_url_key_stability(spider, rule):
    """Same tuple → same key (the dedup contract, request.go:139-145);
    signed-64 range."""
    k1 = url_key(spider, rule, "http://h/x", "GET")
    assert k1 == url_key(spider, rule, "http://h/x", "GET")
    assert -(2**63) <= k1 < 2**63


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_exact(w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()
    # phash is a pure function of pixels
    assert phash64(arr) == phash64(arr.copy())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=500, unique=True))
def test_bloom_soundness(keys):
    params = seen.BloomParams(n_buckets=4, bits_per_bucket=1 << 12, n_hashes=5)
    bitset = np.zeros(params.bits_per_bucket // 8, dtype=np.uint8)
    arr = np.array(keys, dtype=np.int64)
    seen.bitset_or_keys(bitset, arr, params)
    if len(arr):
        assert seen.contains_keys(bitset, arr, params).all()  # never FN


@settings(max_examples=200, deadline=None)
@given(
    now=st.integers(0, 2**33),
    h=st.integers(0, 23),
    m=st.integers(0, 59),
    s=st.integers(0, 59),
    tol=st.integers(1, 30),
)
def test_alarm_duration_properties(now, h, m, s, tol):
    """Clock.duration alarm arm (timer.go:141-152) invariants: the
    sleep is non-negative, lands exactly on the bell's time of day,
    and wakes at the tol-th occurrence (today's bell counts when it
    has not yet rung)."""
    from pholcus_spark.timer import Bell, alarm_duration_s

    d = alarm_duration_s(float(now), Bell(h, m, s), tol)
    assert d >= 0
    fire = now + int(d)
    assert fire % 86400 == h * 3600 + m * 60 + s
    bell_today = now - (now % 86400) + h * 3600 + m * 60 + s
    if bell_today >= now:  # today's bell still counts as occurrence 1
        assert fire == bell_today + (tol - 1) * 86400
    else:
        assert fire == bell_today + tol * 86400


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    o=st.integers(min_value=1, max_value=8),
)
def test_dihedral_phash_orbit_invariant(seed, o):
    from pholcus_spark.imaging import (
        apply_exif_orientation,
        dihedral_phash64,
    )

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (12, 17, 3), dtype=np.uint8)
    assert dihedral_phash64(apply_exif_orientation(arr, o)) == (
        dihedral_phash64(arr)
    )


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    t=st.integers(min_value=0, max_value=4),
    b=st.integers(min_value=0, max_value=4),
    le=st.integers(min_value=0, max_value=4),
    ri=st.integers(min_value=0, max_value=4),
)
def test_detect_borders_recovers_planted_bars(seed, t, b, le, ri):
    from pholcus_spark.imaging import detect_borders

    rng = np.random.RandomState(seed)
    # inner content with bright edge lines so the scan stops exactly
    inner = rng.randint(0, 256, (6, 7, 3), dtype=np.uint8)
    inner[0] = inner[-1] = 255
    inner[:, 0] = inner[:, -1] = 255
    framed = np.zeros((6 + t + b, 7 + le + ri, 3), dtype=np.uint8)
    framed[t:t + 6, le:le + 7] = inner
    assert detect_borders(framed) == (t, b, le, ri)


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_pixel_entropy_bounds(seed):
    from pholcus_spark.imaging import pixel_entropy

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    h = pixel_entropy(arr)
    assert 0.0 <= h <= 8.0
    assert pixel_entropy(np.full((5, 5, 3), seed % 256, np.uint8)) == 0.0


def _merge_fold(symbols: list[str], a: str, b: str) -> list[str]:
    """Reference left-to-right BPE merge (the semantics the doubled-
    space replace trick must reproduce exactly)."""
    out: list[str] = []
    for x in symbols:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


@settings(max_examples=200, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1,
                  max_size=10),
    pair=st.sampled_from([("a", "b"), ("a", "a"), ("b", "c"),
                          ("ab", "c")]),
)
def test_bpe_replace_trick_equals_fold(syms, pair):
    a, b = pair
    s = " " + " ".join(syms) + " "
    doubled = s.replace(" ", "  ")
    merged = doubled.replace(f" {a}  {b} ", f" {a + b} ")
    collapsed = merged.replace("  ", " ")
    assert collapsed.strip().split(" ") == _merge_fold(syms, a, b)
