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

from pyspark.sql import Column, DataFrame
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


def line_shape_stats(text: Column) -> dict[str, Column]:
    """Gopher's document-shape rules (Rae et al. 2021 §A1.1) that the
    word-level gates above don't cover — the listy/teaser-page
    signals: fraction of lines starting with a bullet (drop > 90%),
    fraction ending in an ellipsis (drop > 30%), symbol-to-word ratio
    for # and … (drop > 0.1), and fraction of words with ≥ 1
    alphabetic character (drop < 80%).

    All per-row JVM expressions — line stats are higher-order filters
    over the split array, symbol counts are length-difference
    arithmetic — zero Exchanges at any corpus size (same shape as
    ``repetition_stats``). Ratios round to 4 for cross-engine
    hashing."""
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda ln: F.ltrim(ln).rlike(r"^[-*•]"))
    )
    ellipsis = F.size(
        F.filter(
            lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$")
        )
    )
    hash_n = F.length(text) - F.length(F.replace(text, F.lit("#")))
    uell_n = F.length(text) - F.length(F.replace(text, F.lit("…")))
    dots_n = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / 3
    ws = words(text)
    n_words = F.size(ws)
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-zA-Z]")))
    return {
        "n_lines": n_lines.cast("long"),
        "frac_bullet_lines": F.round(bullet / n_lines, 4),
        "frac_ellipsis_lines": F.round(ellipsis / n_lines, 4),
        "symbol_word_ratio": F.round(
            (hash_n + uell_n + dots_n) / n_words, 4
        ),
        "frac_alpha_words": F.round(alpha / n_words, 4),
    }


def line_shape_keep(
    text: Column,
    max_bullet: float = 0.9,
    max_ellipsis: float = 0.3,
    max_symbol: float = 0.1,
    min_alpha: float = 0.8,
) -> Column:
    """Boolean Gopher shape gate over ``line_shape_stats`` (thresholds
    are the paper's); compare on the 4-rounded values so the gate is
    bit-identical to any engine recomputing the stats."""
    s = line_shape_stats(text)
    return (
        (s["frac_bullet_lines"] <= max_bullet)
        & (s["frac_ellipsis_lines"] <= max_ellipsis)
        & (s["symbol_word_ratio"] <= max_symbol)
        & (s["frac_alpha_words"] >= min_alpha)
    )


def lang_pred(text: Column, threshold: float = 0.02) -> Column:
    """n-gram-heuristic language ID: classify as 'en' when the
    stopword-hit ratio clears the threshold, else 'unk'."""
    ws = words(text)
    ratio = stopword_hits(ws) / F.size(ws)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def _run_stats(grams: Column) -> Column:
    """``struct(max_run, dup)`` over an array of grams: the count of the
    most frequent gram and the number of grams belonging to any gram
    that occurs >= 2 times. One ``array_sort`` + one ``aggregate`` pass
    per ROW — frequency counting without exploding the corpus, so
    per-doc repetition stats never shuffle (the naive shape is two
    corpus-wide groupBys; this is JVM-side expression evaluation with
    zero Exchanges — higher-order fns opt out of whole-stage codegen
    but stay off the Python path)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("max_run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["max_run"])
            .otherwise(F.greatest(acc["max_run"], acc["run"]))
            .alias("max_run"),
            F.when(~same & (acc["run"] >= 2), acc["dup"] + acc["run"])
            .otherwise(acc["dup"])
            .alias("dup"),
        )

    def fin(acc: Column) -> Column:
        return F.struct(
            F.greatest(acc["max_run"], acc["run"]).alias("max_run"),
            F.when(acc["run"] >= 2, acc["dup"] + acc["run"])
            .otherwise(acc["dup"])
            .alias("dup"),
        )

    return F.aggregate(F.array_sort(grams), zero, step, fin)


def repetition_stats(text: Column) -> dict[str, Column]:
    """Gopher-style repetition quality gates (Rae et al. 2021 §A1.1,
    adapted to the single-space corpus: word/bigram grams instead of
    lines): fraction of tokens taken by the most frequent gram and by
    all duplicated grams, for unigrams and bigrams. High values flag
    the boilerplate / degenerate-repetition docs a training pipeline
    drops. All ratios rounded to 4 (oracle-hash parity); bigram stats
    are NULL for one-word docs."""
    ws = words(text)
    n = F.size(ws).cast("long")
    uni = _run_stats(ws)
    bi_arr = word_shingles(ws, 2)
    nb = F.size(bi_arr).cast("long")
    bi = _run_stats(bi_arr)
    return {
        "n_words": n,
        "top_word_frac": F.round(uni["max_run"] / n, 4),
        "dup_word_frac": F.round(uni["dup"] / n, 4),
        "top_bigram_frac": F.when(nb > 0, F.round(bi["max_run"] / nb, 4)),
        "dup_bigram_frac": F.when(nb > 0, F.round(bi["dup"] / nb, 4)),
    }


def word_entropy(text: Column) -> Column:
    """Shannon entropy (nats) of the per-doc unigram distribution — the
    lexical-diversity gate of a curation pipeline (degenerate docs
    score near 0, naturally varied text near ln(n_words)). Computed as
    ``ln(n) - (Σ c·ln c)/n`` over word-run lengths of the SORTED word
    array: one aggregate() expression per row, zero shuffle — same
    shape as ``_run_stats``, which cannot be reused because entropy
    needs every run length, not just the max. Rounded to 4."""
    ws = words(text)
    n = F.size(ws).cast("double")
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("clnc"),
    )

    def _contrib(run: Column) -> Column:
        # runs of length 0 (initial) and 1 contribute 0 — guarding also
        # avoids 0*ln(0) = NaN
        return F.when(
            run >= 2, run.cast("double") * F.log(run.cast("double"))
        ).otherwise(F.lit(0.0))

    def step(acc: Column, x: Column) -> Column:
        same = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["clnc"])
            .otherwise(acc["clnc"] + _contrib(acc["run"]))
            .alias("clnc"),
        )

    def fin(acc: Column) -> Column:
        return acc["clnc"] + _contrib(acc["run"])

    clnc = F.aggregate(F.array_sort(ws), zero, step, fin)
    return F.round(F.log(n) - clnc / n, 4)


# PII patterns shared with the DuckDB oracle. Kept inside the common
# Java-regex ∩ RE2 subset (no backrefs, no lookaround) so both engines
# compile them identically.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_columns(text: Column) -> dict[str, Column]:
    """PII scrub pass (the pre-release hygiene stage of a training-data
    pipeline): count and redact emails, NANP phone numbers, and IPv4
    addresses. Pure regexp column expressions — JVM-side, zero shuffle,
    linear in input. Replacement order is fixed (email → phone → ip) so
    overlapping matches resolve identically in engine and oracle; the
    email pattern cannot leave a bare IP behind because its domain tail
    requires an alphabetic TLD."""
    emails = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    after_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    phones = F.regexp_count(after_email, F.lit(PII_PHONE_RE))
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "<PHONE>")
    ips = F.regexp_count(after_phone, F.lit(PII_IPV4_RE))
    redacted = F.regexp_replace(after_phone, PII_IPV4_RE, "<IP>")
    return {
        "n_emails": emails.cast("long"),
        "n_phones": phones.cast("long"),
        "n_ips": ips.cast("long"),
        "redacted": redacted,
    }


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


CLASSIFIER_BUCKETS = 4096


def hashed_linear_score(
    text: Column,
    n_buckets: int = CLASSIFIER_BUCKETS,
    salt: str = "dom0",
    round_to: int = 6,
) -> Column:
    """fastText-style hashed bag-of-words linear classifier score — the
    plumbing of the standard domain/quality filter (CCNet, DCLM, and
    the reference pipelines score every crawled doc with a linear model
    over hashed token features before keeping it).

    score(doc) = mean over tokens t of w[bucket(t)], with
    bucket(t) = md5_60(salt|t) mod n_buckets. The weight table here is
    a DETERMINISTIC stand-in — w[b] = ((b·2654435761) mod 2001)/1000 − 1
    ∈ [−1, 1] — so the score is reproducible in any engine without
    shipping a model file; a trained model's weights drop in as a
    broadcast map (or a literal array, IVF-codebook style) without
    changing the plan shape.

    Pure column expressions: a transform + aggregate fold per ROW. Zero
    shuffles, zero Python — at 10^10 docs this is a map-only stage at
    scan speed, exactly like the other per-row gates.

    The per-token weight is an integer multiple of 1/1000, so the fold
    accumulates EXACT integer milliweights; the reported score is the
    mean TRUNCATED toward zero at 10^-round_to — integer arithmetic end
    to end, so any engine computing the same formula lands on the
    bit-identical double. (A float fold + round() differed from DuckDB
    in the last decimal on fixture docs twice: once from sum order,
    once because s/(1000·n) produces EXACT decimal midpoints that
    HALF_UP and float-round resolve differently. Truncation of an
    integer quotient has no midpoint rule to disagree on.)

    Returns ``(score, total_milli)``: gate on the exact integer sum's
    sign (``total_milli >= 0``), report the truncated ``score``."""
    ws = words(text)

    def w_milli(t: Column) -> Column:
        b = md5_long(F.concat(F.lit(salt + "|"), t)) % n_buckets
        return (b * 2654435761) % 2001 - 1000

    total = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, t: acc + w_milli(t)
    )
    # micro-units: s·10^round_to / (1000·n) = s·10^(round_to-3) / n,
    # floor-of-abs (= trunc toward zero; floor on non-negatives is
    # unambiguous in every engine, unlike CAST or negative div)
    num = total * (10 ** (round_to - 3))
    n = F.size(ws)
    units = F.when(
        num < 0, -F.floor((-num).cast("double") / n)
    ).otherwise(F.floor(num.cast("double") / n))
    score = units.cast("double") / float(10 ** round_to)
    return score, total


# -- caption quality (the image-pair text gate) ------------------------------

_CAPTION_BOILERPLATE = (
    "click to enlarge", "stock photo", "getty images", "no caption",
    "royalty free", "image may contain", "click here", "thumbnail",
)


def caption_flags(caption: Column, min_chars: int = 5,
                  max_chars: int = 512) -> dict[str, Column]:
    """LAION-style caption junk flags for harvested image+caption
    pairs — each a pure boolean expression over the caption string:

    - ``bad_length``: trimmed length outside [min_chars, max_chars]
    - ``is_filename``: camera/file-name captions (``IMG_1234.JPG``,
      ``DSC0001``, ``screenshot-3.png`` …) — the single most common
      alt-text junk class
    - ``is_url``: the caption is a bare URL
    - ``low_alpha``: letters make up less than half of the
      non-space characters (digit dumps, punctuation runs, emoji
      soup)
    - ``boilerplate``: CMS filler ("click to enlarge",
      "stock photo", "getty images", …)

    ``caption_keep`` ANDs them. All codegen; at harvest scale this
    rides the extraction scan with zero extra passes."""
    c = F.trim(caption)
    n = F.length(c)
    letters = F.length(F.regexp_replace(c, r"[^\p{L}]", ""))
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    low = F.lower(c)
    flags = {
        "bad_length": (n < min_chars) | (n > max_chars),
        "is_filename": c.rlike(
            r"(?i)^(img|dsc|dcim|image|photo|pic|screenshot|untitled)"
            r"[-_ ]?\d*(\.(jpe?g|png|gif|webp|bmp|tiff?))?$"
        ),
        "is_url": c.rlike(r"(?i)^https?://\S+$"),
        "low_alpha": (nonspace > 0) & (letters * 2 < nonspace),
        "boilerplate": F.lower(
            F.concat(F.lit(" "), low, F.lit(" "))
        ).rlike("|".join(_CAPTION_BOILERPLATE)),
    }
    return flags


def caption_keep(caption: Column, **kw) -> Column:
    """True iff no junk flag fires — the pair survives into the
    training corpus."""
    flags = caption_flags(caption, **kw)
    out = F.lit(True)
    for f in flags.values():
        out = out & ~f
    return out


def topk_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    top_k: int = 20,
    cms_depth: int = 4,
    cms_width: int = 1024,
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the boilerplate-mining
    readout (cookie banners, footer sentences, template fragments
    surface instantly as top shingles) — alongside a count-min-sketch
    estimate of the same frequencies.

    Two counting paths with very different 10^10 behavior, reported
    side by side:

    - EXACT: one hash aggregation keyed by the gram string. Map-side
      partials help, but the shuffle carries every distinct gram —
      at web scale that's the corpus vocabulary, and this agg is the
      expensive thing the sketch exists to replace.
    - SKETCH: ``cms_depth`` × ``cms_width`` counters, each gram
      hashed (portable 60-bit md5, salted per row) into one bucket
      per depth. The aggregation key space is ≤ depth·width (4096
      here), so map-side combine collapses every task's stream to at
      most that many rows and the shuffle is CONSTANT-sized no matter
      how many distinct grams exist. Estimates only over-count
      (collisions add), never under — ``overcount`` is the per-gram
      audit of that guarantee, and sizing width against it is how you
      pick the sketch for a 10^10-gram corpus.

    The top-k itself is ``orderBy(...).limit(k)`` —
    TakeOrderedAndProject, per-partition heaps, no global sort — with
    the (count desc, gram asc) total order making ties deterministic.
    The probe join broadcasts the ≤4096-row sketch."""
    g = F.explode(
        word_shingles(words(F.col(text_col)), shingle_k)
    ).alias("gram")
    grams = docs.select(g)

    def _bucket(j: int) -> Column:
        return F.struct(
            F.lit(j).alias("j"),
            F.pmod(
                md5_long(F.concat(F.lit(f"cms{j}|"), F.col("gram"))),
                F.lit(cms_width),
            ).cast("long").alias("bucket"),
        )

    buckets = F.array(*[_bucket(j) for j in range(cms_depth)])
    counts = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    top = counts.orderBy(
        F.desc("n_occurrences"), F.asc("gram")
    ).limit(top_k)
    sketch = (
        grams.select(F.explode(buckets).alias("rb"))
        .groupBy(F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("counter"))
    )
    probes = top.select(
        "gram",
        "n_occurrences",
        F.explode(buckets).alias("rb"),
    ).select(
        "gram",
        "n_occurrences",
        F.col("rb.j").alias("j"),
        F.col("rb.bucket").alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("gram", "n_occurrences")
        .agg(F.min("counter").alias("cms_est"))
    )
    return est.withColumn(
        "overcount",
        (F.col("cms_est") - F.col("n_occurrences")).cast("long"),
    )


def fit_linear_head(
    feats: DataFrame,
    x1_col: str = "x1",
    x2_col: str = "x2",
    y_col: str = "y",
) -> DataFrame:
    """Distributed ONE-PASS ordinary-least-squares fit of a 2-feature
    linear head (plus intercept) — how the quality-classifier weights
    that ``hashed_linear_score`` consumes get trained on the cluster
    instead of arriving from a notebook. OLS over sufficient
    statistics: a single aggregation computes the ten normal-equation
    sums (n, Σx, Σxx, Σxy, Σyy — all EXACT int64 since the features
    are integer counts), then Cramer's rule solves the 3×3 system in
    closed form as column expressions over the one aggregated row.

    Plan: one partial-aggregating reduce to a single row, then scalar
    projection — at 10^10 rows this is the cheapest possible shape
    (no shuffle of anything but partial sums, no iteration, no Python,
    no driver-side collect of data). The determinant arithmetic stays
    in int64 the whole way (exact; overflow bounds ~Σx² · Σy² —
    center features first at corpus scale); floats appear only in the
    final three divisions and the MSE identity
    ``(Σyy − w·[Σy,Σx1y,Σx2y])/n``, with fixed operand order so
    independent engines reproduce the bits.

    Returns one row: n, w0 (intercept), w1, w2, mse — rounded to 1e-6
    for cross-engine hashing."""
    x1 = F.col(x1_col).cast("long")
    x2 = F.col(x2_col).cast("long")
    y = F.col(y_col).cast("long")
    a = feats.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y, syy = (
        F.col("sy"), F.col("s1y"), F.col("s2y"), F.col("syy"),
    )
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    w0 = det0.cast("double") / det.cast("double")
    w1 = det1.cast("double") / det.cast("double")
    w2 = det2.cast("double") / det.cast("double")
    mse = (
        syy.cast("double")
        - (w0 * sy.cast("double") + w1 * s1y.cast("double")
           + w2 * s2y.cast("double"))
    ) / n.cast("double")
    return a.select(
        "n",
        F.round(w0, 6).alias("w0"),
        F.round(w1, 6).alias("w1"),
        F.round(w2, 6).alias("w2"),
        F.round(mse, 6).alias("mse"),
    )


# Function-word profiles for the multi-language classifier — the
# fastText-lite approach: tiny, high-frequency, mutually disjoint
# marker sets per language (zh markers are the space-tokenized
# particles the corpus planting emits).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "dans"),
    "es": ("el", "los", "y", "por", "con"),
    "zh": ("的", "是", "在", "了", "和"),
}


def lang_id_multi(text: Column) -> Column:
    """Multi-language ID by function-word profile argmax — the
    upgrade over the binary en/unk heuristic (`lang_pred`): count
    hits against each language's marker set, predict the max, break
    exact ties toward the alphabetically-greatest language (struct
    comparison order — deterministic, documented), and return 'unk'
    when NO profile hits (the honest answer for markerless text).

    One pass over the token array per profile (higher-order filters,
    JVM-side, zero shuffle); the struct array_max is the same
    associative argmax trick the caption election uses."""
    ws = words(text)
    entries = [
        F.struct(
            F.size(F.filter(ws, lambda w: w.isin(*m)))
            .cast("long")
            .alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, m in LANG_PROFILES.items()
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unk"))


def bpe_fit(
    docs: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016) —
    learn the first ``n_merges`` merge rules from the corpus, the
    cluster-side computation behind every tokenizer's merges.txt.

    The 10^10 shape: the CORPUS aggregates exactly once (word → freq,
    one hash agg); every merge iteration then runs on the VOCAB table
    (≤ a few million rows at web scale, thousands here) — explode
    adjacent symbol pairs weighted by word frequency, one tiny
    count agg, TakeOrdered(1) for the best pair (count desc, pair
    asc — the deterministic tie), apply the merge, repeat. Only the
    single winning pair row ever reaches the driver per round.

    Symbols live as a single-space-joined string (`' c a t '`), and
    the merge applies via the doubled-space replace trick (double
    every separator, replace ``' a  b '`` with ``' ab '``, collapse) —
    one non-overlapping left-to-right pass whose semantics the DuckDB
    oracle reproduces with its own replace(), so both engines merge
    adjacent-overlapping runs identically. No end-of-word marker (a
    production run appends '</w>' per word first; the plan is
    unchanged).

    Returns (rank, left, right, merged, pair_count) — the ordered
    merge table."""
    w = F.explode(words(F.col(text_col))).alias("w")
    vocab = (
        docs.select(w)
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    syms = vocab.select(
        "freq",
        F.concat(
            F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 ")
        ).alias("s"),
    )
    # vocab-sized and re-read every round
    syms = syms.persist()
    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        ws = F.split(F.trim(F.col("s")), " ")
        n = F.size(ws)
        pairs = F.when(
            n < 2, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat(
                    F.element_at(ws, (i + 1).cast("int")),
                    F.lit("|"),
                    F.element_at(ws, (i + 2).cast("int")),
                ),
            )
        )
        best = (
            syms.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["pair"].split("|", 1)
        out.append((rank, a, b, a + b, int(best[0]["cnt"])))
        doubled = F.replace(F.col("s"), F.lit(" "), F.lit("  "))
        merged = F.replace(
            doubled, F.lit(f" {a}  {b} "), F.lit(f" {a + b} ")
        )
        nxt = syms.select(
            "freq", F.replace(merged, F.lit("  "), F.lit(" ")).alias("s")
        ).persist()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        out,
        "rank int, left string, right string, merged string,"
        " pair_count long",
    )


def bpe_apply_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned BPE merge table and count the result —
    the apply half of ``bpe_fit`` and the real-tokenizer upgrade of
    ``n_tokens_re``'s BPE-ish stand-in (token BUDGETS — packing,
    patch/token selection, epoch planning — should be denominated in
    the tokenizer that will actually train).

    Whole documents are symbolized with an unmergeable word-boundary
    sentinel ('§' — never in any learned pair, because fit explodes
    pairs per word), then each merge applies in rank order via the
    same doubled-separator replace chain as fit. The entire chain is
    a per-row codegen projection — zero shuffle, linear in merges —
    and the sentinel tokens are excluded from the count."""
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.replace(F.col(text_col), F.lit(" "), F.lit("§")),
            "(.)",
            "$1 ",
        ),
    )
    for a, b in merges:
        s = F.replace(
            F.replace(
                F.replace(s, F.lit(" "), F.lit("  ")),
                F.lit(f" {a}  {b} "),
                F.lit(f" {a + b} "),
            ),
            F.lit("  "),
            F.lit(" "),
        )
    ws = F.split(F.trim(s), " ")
    n_bpe = F.size(F.filter(ws, lambda w: w != "§")).cast("long")
    return docs.select(
        id_col,
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_bpe.alias("n_tokens_bpe"),
    )
