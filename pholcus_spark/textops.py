"""Text-analysis operators for the training-data pipeline surface.

Language-ID (stopword-hit heuristic), quality scoring (length /
stopword / uniqueness ratios), token counting (whitespace + regex
word tokens), and document fingerprinting (md5 + min-shingle-hash,
i.e. MinHash with k=1 — the winnowing-lite variant).

Everything here is a **pure column-expression builder** — JVM-side
built-ins only (split / transform / aggregate / regexp), no Python in
the hot path, so the whole stage stays inside whole-stage codegen and
scales linearly with input partitions. The reference crawler's scalar
helper surface (``common/common.go:19-260`` CleanHtml etc.) maps to the
same style of column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, fixed English stopword list shared with the DuckDB oracle SQL
# (queries.py keeps the literal in sync).
STOPWORDS = ("a", "the", "and", "of", "to")

# 60-bit portable hash: both Spark and DuckDB can compute
# int(md5_hex[:15], 16) exactly, so MinHash/SimHash signatures match the
# oracle bit-for-bit. (F.xxhash64 is faster but has no DuckDB twin.)


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words(text: Column) -> Column:
    """Whitespace tokens (single-space corpus; empties preserved to
    match the oracle's string_split)."""
    return F.split(text, " ")


def word_shingles(ws: Column, k: int = 3) -> Column:
    """k-word shingles as strings; empty array when the doc has < k
    words. transform(sequence(...)) keeps it JVM-side (no explode)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - k, F.lit(-1)))
    return F.when(F.size(ws) < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def hashed_word_shingles(ws: Column, k: int = 3) -> Column:
    """k-word shingles as 64-bit keys, skipping the shingle STRINGS
    entirely: each key is a multi-argument ``xxhash64`` over the k
    words, a streaming hash with no intermediate concat allocation —
    ~3x cheaper than ``word_shingles`` + a later hash of the string.
    Set semantics (distinct, intersections, Jaccard) are identical to
    the string form modulo 2⁻⁶⁴ collisions, so consumers that never
    output the shingle text (similarity joins) should prefer this."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - k, F.lit(-1)))
    return F.when(F.size(ws) < k, F.array().cast("array<long>")).otherwise(
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def n_tokens_ws(text: Column) -> Column:
    return F.size(words(text))


def n_tokens_re(text: Column, pattern: str = "[a-z]+") -> Column:
    """Regex word tokens — the BPE-ish splitter stand-in."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def stopword_hits(ws: Column) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))


def uniq_words(ws: Column) -> Column:
    return F.size(F.array_distinct(ws))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set; all ratios rounded to 4 so engine
    and oracle hash identically."""
    ws = words(text)
    n = F.size(ws)
    return {
        "n_chars_m": F.length(text),
        "n_words": n,
        "n_uniq": uniq_words(ws),
        "n_stop": stopword_hits(ws),
        "stop_ratio": F.round(stopword_hits(ws) / n, 4),
        "uniq_ratio": F.round(uniq_words(ws) / n, 4),
        "avg_word_len": F.round((F.length(text) - (n - 1)) / n, 4),
    }


def lang_pred(text: Column, threshold: float = 0.02) -> Column:
    """n-gram-heuristic language ID: classify as 'en' when the
    stopword-hit ratio clears the threshold, else 'unk'."""
    ws = words(text)
    ratio = stopword_hits(ws) / F.size(ws)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the lowercased, squeezed text."""
    return F.md5(F.regexp_replace(F.lower(text), " +", " "))


def fingerprint_minshingle(text: Column, k: int = 3) -> Column:
    """Winnowing-lite content fingerprint: min 60-bit hash over k-word
    shingles (MinHash, one permutation). -1 for docs shorter than k."""
    sh = word_shingles(words(text), k)
    return F.coalesce(F.array_min(F.transform(sh, md5_long)), F.lit(-1)).cast(
        "long"
    )
