"""Deduplication operators over the ``documents`` table.

Exact (hash-groupBy), n-gram Jaccard, MinHash + LSH banding, and
SimHash — the dedup family a large-scale training-data pipeline needs,
expressed Spark-first:

- exact/minhash/simhash signatures are pure column expressions
  (``transform``/``aggregate`` over the token array — no explode, no
  Python), so signature computation is embarrassingly parallel and
  shuffle-free;
- candidate pairing shuffles only on the *banded* keys (bounded-size
  buckets), never all-pairs; the n-gram Jaccard variant blocks on
  (lang, length-bucket) for the same reason;
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


def minhash_signature(text: Column, k: int, shingle_k: int = 3) -> list[Column]:
    """k MinHash components: min over shingles of hash(i || '|' || s).
    Column-expression only — evaluated JVM-side per row."""
    sh = word_shingles(words(text), shingle_k)

    def _hasher(i: int):
        # closure factory — a default-arg lambda would change the
        # visible arity and make F.transform pass the element index
        return lambda s: md5_long(F.concat_ws("|", F.lit(str(i)), s))

    sig = []
    for i in range(k):
        h = F.transform(sh, _hasher(i))
        sig.append(F.coalesce(F.array_min(h), F.lit(-1)).cast("long"))
    return sig


def minhash_bands(docs: DataFrame, k: int = 8, band_rows: int = 2,
                  shingle_k: int = 3) -> DataFrame:
    """(doc_id, band_idx, band_key) — one row per band; band_key is the
    md5 of the band's signature slice. Pairs sharing any band are
    near-dup candidates (classic LSH banding)."""
    sig = minhash_signature(F.col("text"), k, shingle_k)
    d = docs.select("doc_id", *[c.alias(f"mh{i}") for i, c in enumerate(sig)])
    bands = []
    for b in range(k // band_rows):
        cols = [F.col(f"mh{b * band_rows + j}") for j in range(band_rows)]
        bands.append(
            d.select(
                "doc_id",
                F.lit(b).cast("int").alias("band_idx"),
                F.md5(F.concat_ws("-", *cols)).alias("band_key"),
            )
        )
    out = bands[0]
    for x in bands[1:]:
        out = out.unionByName(x)
    return out


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
    """n-gram Jaccard near-dup pairs with blocking on lang: pairs with
    |A∩B| / |A∪B| ≥ threshold over distinct word-k-shingles.

    Blocking bounds the pair count; at scale the block key would also
    include a length bucket + an LSH pre-pass (minhash_candidate_pairs)
    so the exact Jaccard join only sees candidates.
    """
    sh = docs.select(
        "doc_id",
        F.col("lang").alias("block"),
        F.array_distinct(word_shingles(words(F.col("text")), shingle_k)).alias(
            "sh"
        ),
    )
    l, r = sh.alias("l"), sh.alias("r")
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    jac = inter / union
    return (
        l.join(
            r,
            [
                F.col("l.block") == F.col("r.block"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
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
        "doc_id",
        F.array_distinct(word_shingles(words(F.col("text")), shingle_k)).alias(
            "sh"
        ),
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
