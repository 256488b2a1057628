"""Deduplication operators over the ``documents`` table.

Exact (hash-groupBy), n-gram Jaccard, MinHash + LSH banding, and
SimHash — the dedup family a large-scale training-data pipeline needs,
expressed Spark-first:

- minhash/simhash signatures explode tokens and aggregate per doc —
  tokens start co-located in their row, so map-side partial
  aggregation collapses them before any shuffle (shuffle volume ≈ one
  signature row per doc per partition); everything is JVM expressions,
  no Python;
- candidate pairing shuffles only on the *banded* keys (bounded-size
  buckets), never all-pairs; n-gram Jaccard is an inverted-index count
  join whose cost is Σ df(shingle)², not |docs|²;
- at 100 TB the only all-to-all stage is the band-bucket self-join,
  whose skew is bounded by band width — AQE skew-join handles residual
  hot buckets.

Hashes are the 60-bit md5 prefix (``textops.md5_long``) so the DuckDB
oracle reproduces every signature exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import fingerprint_md5, md5_long, word_shingles, words

SIMHASH_BITS = 60  # 60-bit md5 prefix → bits 0..59


def exact_dupes(docs: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct normalized
    text with the surviving (min) doc_id and the copy count."""
    return (
        docs.select(fingerprint_md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_components(docs: DataFrame, k: int, shingle_k: int = 3) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) MinHash signature: component i = min over
    shingles of md5_long(i || '|' || s) — k INDEPENDENT hash functions.

    The cheaper h1 + i·h2 derived family was tried and rejected: the
    per-i minima are strongly correlated (the shingle minimizing h1
    tends to minimize every component), which inflated the LSH band
    collisions ~15× with junk candidates — the downstream exact-verify
    cost is O(candidates), so hash independence is worth k md5s.

    Plan shape: explode shingles → k min aggregates. A doc's shingles
    start co-located in its row, so the map-side partial aggregation
    collapses them before the shuffle — shuffle volume is ~one
    signature row per doc per input partition (the same shape as
    simhash_bits; ~4× faster than the old per-component
    transform/array_min formulation, whose HOF lambdas also
    re-evaluated the split() per element)."""
    # two-step projection: materialize the split-words array as a real
    # column first — referencing the split EXPRESSION from inside the
    # shingle lambda re-evaluates it per element (HOF lambdas defeat
    # codegen subexpression elimination; ~6x the scan cost measured),
    # while referencing an attribute is free. CollapseProject keeps the
    # barrier because the alias is used more than once and isn't cheap.
    sh = docs.select(
        "doc_id", words(F.col("text")).alias("_ws")
    ).select(
        "doc_id",
        F.explode_outer(word_shingles(F.col("_ws"), shingle_k)).alias("s"),
    )
    # NULL guard: docs with < shingle_k words explode_outer to s=NULL,
    # and concat_ws would silently DROP the null (hashing just str(i))
    # — the oracle's min-over-no-rows is NULL→-1, so gate the hash on
    # s IS NOT NULL and coalesce the empty aggregate to -1 like the SQL
    aggs = [
        F.coalesce(
            F.min(
                F.when(
                    F.col("s").isNotNull(),
                    md5_long(F.concat_ws("|", F.lit(str(i)), F.col("s"))),
                )
            ),
            F.lit(-1),
        ).cast("long").alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_bands(docs: DataFrame, k: int = 8, band_rows: int = 2,
                  shingle_k: int = 3) -> DataFrame:
    """(doc_id, band_idx, band_key) — one row per band; band_key is the
    md5 of the band's signature slice. Pairs sharing any band are
    near-dup candidates (classic LSH banding). One explode over a
    per-row band array — the signature aggregation runs once, not once
    per band."""
    d = minhash_components(docs, k, shingle_k)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "-",
                        *[
                            F.col(f"mh{b * band_rows + j}")
                            for j in range(band_rows)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(k // band_rows)
        ]
    )
    return d.select("doc_id", F.explode(band_arr).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key")
    )


def minhash_candidate_pairs(docs: DataFrame, k: int = 8, band_rows: int = 2,
                            shingle_k: int = 3) -> DataFrame:
    """Distinct candidate near-dup pairs (doc_a < doc_b) sharing ≥1 LSH
    band. Shuffle key = (band_idx, band_key) — bounded buckets, never
    an all-pairs join."""
    b = minhash_bands(docs, k, band_rows, shingle_k)
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            [
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_key") == F.col("r.band_key"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, shingle_k: int = 3,
                        threshold: float = 0.05) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index count
    join (the Vernica/Carey set-similarity-join shape): |A∩B| / |A∪B|
    ≥ threshold over distinct word-k-shingles, blocked on lang.

    Instead of a quadratic block self-join carrying shingle ARRAYS,
    explode each doc's distinct shingles into postings (doc_id,
    shingle), self-join on (lang, shingle), and count matches per doc
    pair — that count IS |A∩B| exactly, and |A∪B| = |A| + |B| - |A∩B|
    from the per-doc set sizes. Everything is narrow JVM rows: pair
    enumeration cost is Σ_s df(s)² within a language (the shingle
    document-frequency distribution), not |docs|², and no array ever
    shuffles. Pairs sharing zero shingles have jac = 0 < threshold, so
    the output set is identical to the brute-force block join (the
    DuckDB oracle still computes it that way).

    At 100 TB the residual risk is a stop-shingle with huge df; the
    mitigations are the LSH pre-pass (``minhash_verified_pairs``, the
    recommended scale path), prefix filtering, or AQE skew-join on the
    (lang, shingle) key — the operator's shape stays the same.
    """
    base = docs.select(
        "doc_id",
        F.col("lang").alias("block"),
        words(F.col("text")).alias("_ws"),
    ).select(
        "doc_id",
        "block",
        F.array_distinct(word_shingles(F.col("_ws"), shingle_k)).alias("sh"),
    )
    sizes = base.select("doc_id", F.size("sh").alias("n"))
    # join on the 8-byte shingle hash, not the ~25-byte string — the
    # postings shuffle and the equality probes shrink ~3×; a 64-bit
    # collision would need ~2^32 distinct shingles to become likely
    # (and the oracle compares against brute-force set intersection)
    post = base.select(
        "doc_id", "block",
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias(
            "shingle"
        ),
    )
    counts = (
        post.alias("l")
        .join(
            post.alias("r"),
            [
                F.col("l.block") == F.col("r.block"),
                F.col("l.shingle") == F.col("r.shingle"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        counts.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_verified_pairs(
    docs: DataFrame,
    k: int = 8,
    band_rows: int = 2,
    shingle_k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """The scale-path dedup pipeline: LSH banding proposes candidate
    pairs (bounded buckets, no all-pairs), exact shingle-Jaccard
    verifies only those candidates. This is the composition a 100 TB
    corpus runs — the exact join's pair count is O(|candidates|), not
    O(n²)."""
    cand = minhash_candidate_pairs(docs, k, band_rows, shingle_k)
    sh = docs.select(
        "doc_id", words(F.col("text")).alias("_ws")
    ).select(
        "doc_id",
        F.array_distinct(word_shingles(F.col("_ws"), shingle_k)).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_bits(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """SimHash per doc as a 60-char bitstring (bit 0 first).

    Formulation shared with the oracle: explode distinct words, hash
    each to 60 bits, per-bit weighted vote sum(±1), bit=1 iff sum>0.
    One narrow shuffle on doc_id; the 60 votes are plain aggregate
    expressions (JVM-side), not 60 passes.
    """
    w = docs.select(
        "doc_id",
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("word"),
    ).withColumn("h", md5_long(F.col("word")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    bits = F.concat(
        *[
            F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(SIMHASH_BITS)
        ]
    )
    return agg.select("doc_id", bits.alias("simhash"))
