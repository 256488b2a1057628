"""Training-data selection: the composed filter a corpus pipeline runs.

Single-pass document gating (language ID, quality thresholds) followed
by exact-dup canonicalization and near-dup cluster canonicalization —
the end-to-end composition of `textops` and `dedup` that turns a
crawled corpus into a training set. Every stage is a DataFrame
transform over the same building blocks the standalone operators use,
so the whole selection is one plan:

- gates are whole-stage-codegen column expressions (no shuffle);
- exact dedup is a map-side-combinable groupBy(min) + left-semi join
  on the fingerprint (one shuffle);
- near-dup canonicalization anti-joins the components labeling
  (`dedup.neardup_components`), dropping every doc that is not its
  cluster's minimum-doc_id representative.

Policy note: cluster canonicalization is applied corpus-wide (a doc
that is a near-dup of ANY doc is kept only if it is the cluster
canonical), independent of whether the canonical itself survives the
quality gates — the deterministic "keep-first" policy large pipelines
use so the kept set is stable under re-sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup, textops


def select_training_docs(
    docs: DataFrame,
    min_words: int = 25,
    min_uniq_ratio: float = 0.35,
    lang: str = "en",
) -> DataFrame:
    """The kept set: (doc_id, n_words, uniq_ratio), quality-gated,
    exact-dup- and near-dup-canonicalized."""
    q = textops.quality_columns(F.col("text"))
    gated = docs.select(
        "doc_id",
        q["n_words"].alias("n_words"),
        q["uniq_ratio"].alias("uniq_ratio"),
        textops.lang_pred(F.col("text")).alias("lang_pred"),
        textops.fingerprint_md5(F.col("text")).alias("fp"),
    ).filter(
        (F.col("lang_pred") == lang)
        & (F.col("n_words") >= min_words)
        & (F.col("uniq_ratio") >= min_uniq_ratio)
    )
    exact_canon = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(exact_canon, ["fp", "doc_id"], "left_semi")
    non_canonical = (
        dedup.neardup_components(docs)
        .filter(F.col("doc_id") != F.col("component_id"))
        .select("doc_id")
    )
    return (
        kept.join(non_canonical, "doc_id", "left_anti")
        .select("doc_id", F.col("n_words").cast("long").alias("n_words"),
                "uniq_ratio")
    )


def pack_shards(
    docs: DataFrame, token_budget: int = 4096, n_groups: int = 16
) -> DataFrame:
    """Sequence packing: assign each doc to a fixed-token-budget
    training shard. Deterministic greedy fill — docs are split into
    ``n_groups`` independent pack groups (``doc_id % n_groups``; a
    production corpus would hash a stable doc key the same way), and
    within a group docs fill shards in doc_id order, a doc landing in
    the shard where its first token falls::

        shard = (running_tokens_before_doc) div token_budget

    One shuffle (the window's group partitioning), per-group sort only
    — groups are corpus_size/n_groups and independent, so at 100 TB
    n_groups is set to the writer-task count and packing is
    embarrassingly parallel; no global sort, no driver state.
    Returns (doc_id, pack_group, n_tokens, shard).
    """
    toks = textops.n_tokens_ws(F.col("text")).cast("long")
    d = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_groups)).cast("int").alias("pack_group"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        d.withColumn("_before", before)
        .withColumn("shard", F.expr(f"_before div {int(token_budget)}").cast("long"))
        .drop("_before")
    )


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, k: int = 5
) -> DataFrame:
    """Benchmark decontamination: drop every doc that shares at least
    one k-word shingle with the eval set (the training-data hygiene
    pass run before any benchmark-adjacent corpus ships).

    Shape for 100 TB: the eval side is benchmark-sized (thousands of
    docs), so its distinct shingle relation is broadcast — the corpus
    explode feeds a map-side broadcast LEFT SEMI join and never
    shuffles; contaminated doc_ids are a small relation the final
    anti-join consumes (AQE broadcasts it when it fits). No stage
    moves corpus-sized data across the cluster.

    Returns the clean subset of ``docs`` (all columns).
    """
    eval_sh = (
        eval_docs.select(
            F.explode(
                textops.word_shingles(textops.words(F.col("text")), k)
            ).alias("sh")
        )
        .distinct()
    )
    doc_sh = docs.select(
        "doc_id",
        F.explode(
            textops.word_shingles(textops.words(F.col("text")), k)
        ).alias("sh"),
    )
    contaminated = (
        doc_sh.join(F.broadcast(eval_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(contaminated, "doc_id", "left_anti")


def sample_mix(
    docs: DataFrame,
    rates: dict[str, int],
    key: str = "lang",
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling — the training-mix weighting
    pass: keep ``rates[key]`` percent of each stratum (language,
    source, ...), ``default_pct`` for unlisted strata. The keep
    decision is a pure arithmetic hash of doc_id, so the sample is
    reproducible across runs/cluster sizes and re-shards stably (no
    rand(), no seed plumbing):

        keep iff ((doc_id % 1000003) * 1103515245 + 12345)
                 % 2147483648 % 100 < pct

    Whole-stage-codegen filter over the scan — zero shuffles; at
    100 TB this is a pushdown-friendly map-only pass.
    """
    pct = F.coalesce(
        *[F.when(F.col(key) == k, F.lit(int(v))) for k, v in rates.items()],
        F.lit(int(default_pct)),
    )
    h = (
        (F.col("doc_id") % 1000003) * 1103515245 + 12345
    ) % 2147483648 % 100
    return docs.filter(h < pct)


def select_image_corpus(
    meta: DataFrame,
    phash_pairs: DataFrame,
    min_w: int = 32,
    min_h: int = 32,
    fmts: tuple[str, ...] = ("png", "jpeg"),
    min_caption_chars: int = 1,
) -> DataFrame:
    """The image-axis twin of ``select_training_docs``: turn a crawled
    image+caption corpus into a training set.

    - metadata gates (decoded ok, min dimensions, format allowlist,
      non-trivial caption) are whole-stage-codegen expressions — no
      shuffle, scan-bandwidth-bound at 100 TB;
    - exact caption dedup keeps the lexicographic-min image_id per
      caption (groupBy(min) + semi join — one shuffle on caption,
      map-side combinable);
    - perceptual near-dup canonicalization drops every image that is
      not its phash-component's minimum id (``dedup.star_components``
      over the banded pair graph — O(log n) rounds, corpus-wide policy
      like the text pipeline: stable under re-sharding).

    ``meta`` needs (image_id, w, h, fmt, decode_ok, caption);
    ``phash_pairs`` needs (image_a, image_b). Returns the kept subset
    of ``meta`` rows.
    """
    gated = meta.filter(
        F.col("decode_ok")
        & (F.col("w") >= min_w)
        & (F.col("h") >= min_h)
        & F.col("fmt").isin(list(fmts))
        & (F.length("caption") >= min_caption_chars)
    )
    canon = gated.groupBy("caption").agg(
        F.min("image_id").alias("image_id")
    )
    exact_kept = gated.join(canon, ["caption", "image_id"], "left_semi")
    labels, _rounds = dedup.star_components(
        phash_pairs.select(
            F.col("image_a").alias("doc_a"), F.col("image_b").alias("doc_b")
        )
    )
    not_canonical = labels.filter(
        F.col("doc_id") != F.col("component_id")
    ).select(F.col("doc_id").alias("image_id"))
    return exact_kept.join(not_canonical, "image_id", "left_anti")


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Corpus composition report — docs / tokens / chars by
    lang × source with ROLLUP subtotals (per-lang and grand-total rows
    carry NULL group keys), the mix-sheet a training run is planned
    against.

    One hash aggregate with map-side partial rows (rollup expands to
    3 grouping sets but stays a single Exchange keyed by the grouping
    set + keys); output is dimension-sized. At 100 TB this is a
    scan + one small shuffle.
    """
    return docs.rollup("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(textops.n_tokens_ws(F.col("text"))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )


def unigram_nll(docs: DataFrame) -> DataFrame:
    """Unigram-LM fit score — the cheap stand-in for the perplexity
    filter large pipelines run (train an LM on the corpus, drop docs
    the model finds surprising): per-doc average negative log
    probability per token under the corpus unigram distribution with
    Laplace smoothing, ``p(w) = (C(w)+1) / (T+V)``. Low = stereotyped,
    high = out-of-distribution; both tails are curation targets.

    Scale shape: shuffled data is (doc, word, count) DISTINCT triplets,
    never raw tokens — the per-doc term counts collapse in the map-side
    partial agg of the first groupBy; vocabulary counts are a second
    hash agg on the same relation; the term→p(w) join shuffles on the
    word key (AQE broadcasts a small vocab); the final per-doc agg is
    doc-count-sized. Returns ``(doc_id, n_tokens, nll)`` with nll in
    nats rounded to 4.
    """
    terms = (
        docs.select(
            "doc_id", F.explode(textops.words(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    vocab = terms.groupBy("w").agg(F.sum("c").alias("cw"))
    totals = vocab.agg(
        F.sum("cw").alias("t"), F.count("*").alias("v")
    )
    p = vocab.join(F.broadcast(totals)).select(
        "w",
        F.log((F.col("cw") + 1.0) / (F.col("t") + F.col("v"))).alias("lp"),
    )
    return (
        terms.join(p, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(-F.sum(F.col("c") * F.col("lp")) / F.sum("c"), 4).alias(
                "nll"
            ),
        )
    )


def bigram_nll(docs: DataFrame) -> DataFrame:
    """Conditional bigram-LM fit — one modeling step closer to CCNet's
    KenLM perplexity filter than ``unigram_nll``: per-doc average
    negative log probability of each token GIVEN its predecessor,
    ``p(w2|w1) = (C(w1,w2)+1) / (C(w1·)+V)`` (per-history Laplace,
    V = corpus unigram vocabulary). Stereotyped boilerplate scores
    low, out-of-distribution noise high; word-ORDER anomalies that
    the unigram model is blind to (shuffled text, keyword stuffing)
    now surface.

    Scale shape mirrors ``unigram_nll``: shuffled data is
    (doc, w1, w2, count) DISTINCT triplets (map-side collapsed); the
    bigram model is a second hash agg over the same relation; history
    totals are vocab-sized (AQE broadcasts them); V is a 1-row
    broadcast. Docs with < 2 words return n_bigrams=0 with NULL nll.

    Returns ``(doc_id, n_bigrams, nll)`` with nll in nats rounded
    to 4."""
    ws = textops.words(F.col("text"))
    base = docs.select("doc_id", ws.alias("_ws"))
    pair_arr = F.when(
        F.size("_ws") < 2,
        F.expr("array()").cast("array<struct<w1:string,w2:string>>"),
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(_ws) - 1),"
            " i -> struct(_ws[i-1] AS w1, _ws[i] AS w2))"
        )
    )
    trips = (
        base.select("doc_id", F.explode(pair_arr).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    model = trips.groupBy("w1", "w2").agg(F.sum("c").alias("cb"))
    hist = model.groupBy("w1").agg(F.sum("cb").alias("ch"))
    vocab = (
        base.select(F.explode("_ws").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    lp = model.join(hist, "w1").join(F.broadcast(vocab)).select(
        "w1", "w2",
        F.log((F.col("cb") + 1.0) / (F.col("ch") + F.col("v"))).alias(
            "lp"
        ),
    )
    scored = (
        trips.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("c") * F.col("lp")) / F.sum("c"), 4
            ).alias("nll"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            "nll",
        )
    )


def curate_corpus(
    docs: DataFrame,
    shingle_k: int = 5,
    min_words: int = 20,
    min_entropy: float = 2.6,
    max_top_word_frac: float = 0.15,
) -> DataFrame:
    """End-to-end text curation — the cleaning chain run BEFORE the
    near-dup/selection stages of ``select_training_docs``:

    1. cut duplicated substrings (``dedup.strip_duplicate_spans``);
    2. gate the CLEANED text on length, unigram entropy, and top-word
       fraction — all per-row column expressions, no shuffle (gating
       after the cut matters: a doc that was mostly boilerplate fails
       here even though its raw form passed);
    3. exact-dup canonicalization of the cleaned text (stripping can
       collapse formerly-distinct docs onto identical text):
       groupBy(min) + semi join, keep-min policy.

    Gates compare on values rounded to 4 so engine and oracle make
    identical boundary decisions. Returns ``(doc_id, clean_text,
    n_tokens)`` for kept docs.
    """
    stripped = dedup.strip_duplicate_spans(docs, shingle_k=shingle_k)
    ct = F.col("clean_text")
    n = textops.n_tokens_ws(ct).cast("long")
    rep = textops.repetition_stats(ct)
    gated = stripped.select(
        "doc_id", "clean_text", n.alias("n_tokens"),
        textops.word_entropy(ct).alias("_h"),
        rep["top_word_frac"].alias("_topw"),
    ).filter(
        (F.col("n_tokens") >= min_words)
        & (F.col("_h") >= min_entropy)
        & (F.col("_topw") <= max_top_word_frac)
    ).drop("_h", "_topw")
    keep = (
        gated.select(
            textops.fingerprint_md5(ct).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return gated.join(keep, "doc_id", "left_semi")


def tfidf_topk_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-doc top-k distinctive terms by tf-idf — the corpus-audit /
    keyword-extraction pass (``score = (c/dl) · ln(N/df)``, ties broken
    by term so the top-k set is deterministic).

    Same scale skeleton as ``unigram_nll``: everything past the first
    map-side-combined aggregate moves (doc, word, count) distinct
    triplets; document frequencies are a second hash agg over the same
    relation; N is a 1-row broadcast; the final top-k is a rank window
    partitioned by doc_id — per-partition work bounded by per-doc vocab.
    Returns ``(doc_id, term, score)``, k rows per doc.
    """
    from pyspark.sql.window import Window

    terms = (
        docs.select(
            "doc_id", F.explode(textops.words(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    dl = terms.groupBy("doc_id").agg(F.sum("c").alias("dl"))
    df_ = terms.groupBy("w").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        terms.join(dl, "doc_id")
        .join(df_, "w")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            (
                F.col("c").cast("double")
                / F.col("dl")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("raw"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("raw"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", F.round(F.col("raw"), 4).alias("score"))
    )


def cap_per_source(docs: DataFrame, k: int = 10) -> DataFrame:
    """Diversity cap: keep at most ``k`` docs per source, preferring
    longer docs (n_chars desc, doc_id asc tie-break) — the per-domain
    cap a corpus mix applies so one source cannot dominate. One
    shuffle on source; rank is a per-group window (salting applies if
    a source is pathologically hot — same recipe as the frontier's
    host windows). Returns (doc_id, source, source_rank).
    """
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("source_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("source_rank") <= k)
        .select("doc_id", "source", "source_rank")
    )


def calibrate_gates(
    docs: DataFrame,
    ps: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    exact: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Data-derived gate thresholds: percentiles of the integer quality
    metrics (chars, words, unique words, stopword hits) over the
    corpus, the step that replaces hand-picked filter constants with
    calibrated ones (Gopher and its descendants pick gate values off
    corpus distributions exactly like this).

    One aggregate pass: every percentile array is computed in a single
    1-row aggregation over one scan, then unpacked into
    (metric, p, threshold) rows driver-lightly (the explode runs over a
    1-row frame — no data moves). ``exact=True`` uses Spark's exact
    ``percentile`` (sort-based buffer — right for oracle parity and
    anything up to ~1e8 rows per group); at 10^10 rows flip
    ``exact=False`` for ``approx_percentile`` (t-digest sketch, fixed
    memory, same single-aggregate plan shape, rank error ≤ 1/accuracy).

    Metrics are INTEGERS and ``ps`` have two decimals, so the
    interpolated percentile is a short exact decimal and round(·,
    round_to) snaps both engines' float noise to the same value (the
    domain-filter lesson: never round a long rational)."""
    q = textops.quality_columns(F.col("text"))
    metrics = {
        "n_chars": q["n_chars_m"].cast("long"),
        "n_words": q["n_words"].cast("long"),
        "n_uniq": q["n_uniq"].cast("long"),
        "n_stop": q["n_stop"].cast("long"),
    }
    base = docs.select(*[c.alias(n) for n, c in metrics.items()])
    parr = "array(" + ",".join(f"{p!r}D" for p in ps) + ")"
    fn = "percentile" if exact else "approx_percentile"
    aggs = [
        F.expr(f"{fn}({n}, {parr})").alias(f"{n}_q") for n in metrics
    ]
    one = base.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(n).alias("metric"),
                F.lit(p).alias("p"),
                F.round(F.col(f"{n}_q")[i], round_to).alias("threshold"),
            )
            for n in metrics
            for i, p in enumerate(ps)
        ]
    )
    return one.select(F.explode(entries).alias("e")).select(
        "e.metric", "e.p", "e.threshold"
    )


def _pow2() -> F.Column:
    """shiftleft() takes only a literal bit count, so dynamic bit masks
    come from a 64-entry power-of-two literal (bit 63 is the sign bit).
    Built lazily — F.expr needs an active session."""
    return F.expr(
        "array("
        + ",".join(
            (str(1 << b) if b < 63 else str(-(1 << 63))) + "L"
            for b in range(64)
        )
        + ")"
    )


def decontaminate_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    n_bits: int = 1 << 20,
    n_hashes: int = 2,
) -> DataFrame:
    """Decontamination for eval sets too big to broadcast-join cheaply:
    a bloom prefilter over eval k-gram hashes, exact-verified.

    The plain ``decontaminate`` explodes EVERY corpus doc into its
    ~n_words shingles to feed the semi-join — at 10^10 docs that is a
    corpus×k-gram blow-up even though almost every doc is clean. Here:

    1. Eval shingles hash into a SPARSE bloom bitmap — (word, or-mask)
       rows folded into one ``map<long,long>`` row (one bounded
       aggregate; the map is eval-sized at worst, ~n_bits/64 entries),
       broadcast as a 1-row frame.
    2. The corpus probe is ``F.exists`` over each doc's shingle array
       testing all ``n_hashes`` bits — a pure projection over the
       scan against the broadcast row: clean docs are dismissed
       WITHOUT exploding, shuffling, or joining anything.
    3. Bloom positives (true hits + false positives) — a tiny slice —
       explode and exact-verify against the eval shingle relation; no
       false negatives exist, so the result is BIT-IDENTICAL to the
       exact operator, independent of bloom sizing (modulo 2^-64
       shingle-key collisions — the ``hashed_word_shingles`` argument
       every similarity join here already makes).

    Shingles ride as 64-bit xxhash keys end to end: the probe is then
    two xxhash64(int, long) calls per element instead of building the
    k-word shingle STRING and hashing it — measured 21 s → ~4 s at
    sf0.1 for the identical result set.

    Returns the clean subset of ``docs`` (all columns)."""
    shingles = textops.hashed_word_shingles(textops.words(F.col("text")), k)
    eval_sh = eval_docs.select(F.explode(shingles).alias("sh")).distinct()

    def _positions(sh):
        return [
            F.pmod(F.xxhash64(F.lit(i), sh), F.lit(n_bits))
            for i in range(n_hashes)
        ]

    # Bitmap materialization. The probe needs O(1) word lookups:
    # - a broadcast MAP is a linear scan per element_at (measured 5-7x
    #   the exact path at sf0.1);
    # - a broadcast 1-row DENSE-ARRAY frame attaches the whole 128 KB
    #   array to every corpus row through the join (row-size blow-up);
    # - so for model-sized blooms (n_bits <= 2^24, i.e. <= 2 MB dense)
    #   the sparse (word, or-mask) rows — eval-bounded, ONE bounded
    #   aggregate — are collected and CONSTANT-FOLDED into the probe as
    #   one generated-SQL array literal (the IVF-codebook pattern): the
    #   plan carries the bloom as a single constant, rows carry nothing.
    # Past 2^24 bits fall back to the broadcast-joined dense array: the
    # per-row attach cost is bounded by batch row count, and a bloom
    # that size implies an eval relation too big to collect anyway.
    n_words = n_bits // 64
    sparse = (
        eval_sh.select(
            F.explode(F.array(*_positions(F.col("sh")))).alias("pos")
        )
        .select(
            F.expr("pos div 64").alias("w"),
            F.element_at(
                _pow2(), (F.col("pos") % 64).cast("int") + 1
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("m"))
    )
    literal_bloom = n_bits <= (1 << 24)
    if literal_bloom:
        dense = [0] * n_words
        for r in sparse.collect():
            dense[int(r["w"])] = int(r["m"])
        bloom_arr = F.expr(
            "array(" + ",".join(f"{v}L" for v in dense) + ")"
        )
    else:
        bitmap = (
            sparse.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("w", "m"))
                ).alias("_m")
            )
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_words - 1)),
                    lambda i: F.coalesce(
                        F.element_at(F.col("_m"), i.cast("long")),
                        F.lit(0).cast("long"),
                    ),
                ).alias("_bloom")
            )
        )
        bloom_arr = F.col("_bloom")

    def _hit(sh):
        cond = F.lit(True)
        for pos in _positions(sh):
            word = ((pos - pos % 64) / 64).cast("int")
            mask = F.element_at(_pow2(), (pos % 64).cast("int") + 1)
            loaded = F.element_at(bloom_arr, word + 1)
            cond = cond & (loaded.bitwiseAND(mask) == mask)
        return cond

    probed = (
        docs if literal_bloom else docs.crossJoin(F.broadcast(bitmap))
    ).withColumn("_hit", F.exists(shingles, _hit))
    positives = probed.filter(F.col("_hit"))
    contaminated = (
        positives.select("doc_id", F.explode(shingles).alias("sh"))
        .join(eval_sh, "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(contaminated, "doc_id", "left_anti")


def dsir_score(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1 << 10,
) -> DataFrame:
    """DSIR-style data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every doc by the log importance weight of its hashed-bigram
    features under Laplace-smoothed target vs raw unigram bucket
    models; positive score = looks more like the target distribution
    than the raw corpus.

    Plan shape at 10^10 docs:
    - model building: raw ∪ target bigram occurrences explode into md5
      buckets feeding ONE map-side-combined conditional-count aggregate
      — output bounded by ``n_buckets`` (use ~2^20 at full scale; the
      broadcast weight map is then ~16 MB);
    - the per-bucket weight ln(ct+1) − ln(cr+1) AND the corpus-total
      normalizer fold into a single map<long,double>-plus-scalar row in
      one terminal aggregate, broadcast to every task (the
      ``decontaminate_bloom`` shape);
    - scoring is a ZERO-SHUFFLE projection: ``F.aggregate`` over each
      doc's bigram-bucket array against the broadcast map, plus the
      n·(ln(R+B) − ln(T+B)) normalizer — the corpus is scanned once
      and never shuffled.

    Scores are rounded to 4 decimals for cross-engine float parity
    (the bm25/jaccard precedent). Docs with < 2 words have no bigrams
    and score 0.0 (never kept). ``target`` must be a subset relation
    of ``docs``-like rows with a ``text`` column.

    Returns ``docs`` plus (dsir_score, kept)."""
    B = int(n_buckets)

    def _buckets(col: F.Column) -> F.Column:
        ws = textops.words(col)
        return F.transform(
            textops.word_shingles(ws, 2),
            lambda g: F.pmod(textops.md5_long(g), F.lit(B)),
        )

    # one B-bounded count aggregate over raw ∪ target occurrences, then
    # ONE terminal single-partition aggregate producing the weight map
    # AND the normalizer in the same 1-row frame — no separate totals
    # subplan, no corpus re-scan (every doc bucket appears in the raw
    # counts since docs ⊇ the scored rows; absent target buckets smooth
    # to ln(1)=0)
    occ = docs.select(
        F.explode(_buckets(F.col("text"))).alias("bkt"),
        F.lit(0).alias("t"),
    ).unionByName(
        target.select(
            F.explode(_buckets(F.col("text"))).alias("bkt"),
            F.lit(1).alias("t"),
        )
    )
    cnt = occ.groupBy("bkt").agg(
        F.count(F.when(F.col("t") == 0, 1)).alias("cr"),
        F.count(F.when(F.col("t") == 1, 1)).alias("ct"),
    )
    model = F.broadcast(
        cnt.select(
            "bkt",
            "cr",
            "ct",
            (
                F.log(F.col("ct") + F.lit(1.0))
                - F.log(F.col("cr") + F.lit(1.0))
            ).alias("d"),
        ).agg(
            F.map_from_entries(
                F.collect_list(F.struct("bkt", "d"))
            ).alias("_w"),
            (
                F.log(F.coalesce(F.sum("cr"), F.lit(0)) + F.lit(float(B)))
                - F.log(F.coalesce(F.sum("ct"), F.lit(0)) + F.lit(float(B)))
            ).alias("_norm"),
        )
    )
    bk = _buckets(F.col("text"))
    score = F.round(
        F.aggregate(
            bk,
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(F.col("_w"), b),
        )
        + F.size(bk) * F.col("_norm"),
        4,
    )
    return docs.crossJoin(model).withColumn(
        "dsir_score", F.coalesce(score, F.lit(0.0))
    ).withColumn("kept", F.col("dsir_score") > 0).drop("_w", "_norm")


def budget_select(docs: DataFrame, budgets: dict[str, int]) -> DataFrame:
    """Token-budget stratified selection: fill each language's token
    budget best-docs-first — the data-mixing step that turns "we want
    30% code, 50B tokens of en web, ..." into a concrete kept set.
    Order within a stratum is (token count DESC, doc_id ASC); a doc is
    kept while the running token total stays within the budget
    (inclusive prefix rule, so the first over-budget doc is dropped).

    The naive plan is a cumulative-sum window PARTITION BY lang — one
    partition per stratum, i.e. a single task streaming 10^10 rows per
    language. Here the prefix sum is two-level instead (the
    ``assign_seq`` idea applied to windows):

    1. per (lang, score) group: ONE map-side-combined aggregate of
       token sums — output bounded by distinct (stratum, score) pairs;
    2. the EXCLUSIVE prefix over score groups runs on that
       dimension-sized relation (cheap window over group rows);
    3. group prefixes broadcast-join back; the residual inclusive
       cumsum runs PARTITION BY (lang, score) — fine-grained partitions
       bounded by tie-group size, never a whole stratum in one task.

    Returns kept rows: (doc_id, lang, n_tokens)."""
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    d = docs.select(
        "doc_id",
        "lang",
        F.size(textops.words(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("lang").isin(*budgets.keys()))
    groups = d.groupBy("lang", "n_tokens").agg(
        F.sum("n_tokens").alias("grp_tokens")
    )
    w_grp = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = groups.select(
        "lang",
        "n_tokens",
        F.coalesce(F.sum("grp_tokens").over(w_grp), F.lit(0)).alias(
            "prefix_tokens"
        ),
    )
    w_in = (
        Window.partitionBy("lang", "n_tokens")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(prefixes), ["lang", "n_tokens"])
        .withColumn(
            "_cum", F.col("prefix_tokens") + F.sum("n_tokens").over(w_in)
        )
        .filter(F.col("_cum") <= F.element_at(budget, F.col("lang")))
        .select("doc_id", "lang", "n_tokens")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    order_groups: int = 1024,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the step that turns a
    curated document set into fixed-length training rows: documents
    are laid end-to-end in a deterministic pseudo-random order (60-bit
    md5 of doc_id — a reproducible global shuffle, not ingest order)
    and the token stream is cut every ``seq_len`` tokens, documents
    spanning cut points (GPT-style packing, no padding).

    Output is one span row per (sequence, document) intersection:
    (seq_id, doc_id, doc_begin, seq_begin, n_toks) — exactly what a
    loader needs to materialize sequence tensors, and every sequence
    except the last is full by construction.

    The global token offset is the scale problem: a naive cumulative
    window over the corpus is ONE task streaming 10^10 rows. Here it
    is a two-level prefix sum (same shape as ``budget_select``): the
    order key's top bits carve ``order_groups`` contiguous ranges;
    per-range token totals are one map-side-combined aggregate
    (bounded output), the exclusive prefix over ranges is a window on
    that dimension-sized relation, prefixes broadcast back, and the
    residual cumsum runs PARTITION BY range — no task ever sees more
    than ~corpus/order_groups rows. Size order_groups ~ corpus_rows /
    10^7 at the big end.

    A document longer than ``seq_len`` fans out to ⌈n/seq_len⌉+1 span
    rows via sequence()+explode — bounded, no skew beyond document
    length itself."""
    d = docs.select(
        "doc_id",
        textops.md5_long(F.col("doc_id").cast("string")).alias("ord_key"),
        F.size(textops.words(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    # ord_key is uniform in [0, 2^60) → top bits give contiguous,
    # deterministic, balanced ranges of the global order
    grp = F.floor(F.col("ord_key") / F.lit((1 << 60) // order_groups))
    d = d.withColumn("grp", grp.cast("long"))
    totals = d.groupBy("grp").agg(F.sum("n_tokens").alias("grp_tokens"))
    w_g = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        "grp",
        F.coalesce(F.sum("grp_tokens").over(w_g), F.lit(0)).alias(
            "grp_prefix"
        ),
    )
    w_in = (
        Window.partitionBy("grp")
        .orderBy("ord_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_off = d.join(F.broadcast(prefixes), "grp").withColumn(
        "offset",
        F.col("grp_prefix")
        + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
    )
    L = F.lit(seq_len)
    first_seq = F.floor(F.col("offset") / L)
    last_seq = F.floor((F.col("offset") + F.col("n_tokens") - 1) / L)
    spans = with_off.select(
        "doc_id",
        "offset",
        "n_tokens",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * L
    doc_begin = F.greatest(F.lit(0), seq_start - F.col("offset"))
    end_in_doc = F.least(
        F.col("n_tokens"), seq_start + L - F.col("offset")
    )
    return spans.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        doc_begin.cast("long").alias("doc_begin"),
        F.greatest(F.lit(0), F.col("offset") - seq_start)
        .cast("long")
        .alias("seq_begin"),
        (end_in_doc - doc_begin).cast("long").alias("n_toks"),
    )


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (
        ("train", 98), ("val", 1), ("test", 1)),
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: hash the sample KEY,
    never randomness — the same key lands in the same split on every
    machine, every rerun, and every incremental re-crawl (a sample
    that once entered val can never leak into train when the corpus
    grows; per-run RNG splits cannot promise that).

    ``splits`` are integer weights; the bucket is the 60-bit md5 of
    ``salt|key`` mod their sum, carved into cumulative ranges. Pure
    projection — zero shuffle; the salt versions the split so a
    deliberate re-deal is a config change, not a code edit."""
    from .textops import md5_long

    total = sum(w for _, w in splits)
    bucket = F.pmod(
        md5_long(F.concat(F.lit(salt + "|"),
                          F.col(key_col).cast("string"))),
        F.lit(total),
    )
    expr = None
    cum = 0
    for name, w in splits:
        cond = bucket < F.lit(cum + w)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
        cum += w
    return df.withColumn("split", expr)


def epoch_mix(
    docs: DataFrame,
    target_shares_milli: dict[str, int],
    token_budget: int,
    key: str = "lang",
    tokens_col: str = "n_tokens",
    max_epochs_milli: int = 4_000,
) -> DataFrame:
    """Per-source epoch planning for a training mix (the LLaMA/Dolma
    data-mix table): given each source's TARGET share of the token
    budget (in exact permille) and the tokens actually AVAILABLE per
    source, compute how many epochs (repeats, milli-precision) of
    each source the loader should schedule: planned = budget·share,
    epochs = planned/available capped at ``max_epochs_milli`` (over-
    repeating a small source degrades models faster than under-
    filling the mix — the cap records the shortfall instead).

    Arithmetic: planned tokens = budget·share/1000 (floor),
    epochs_milli = planned·1000/available (floor, capped), scheduled =
    available·epochs_milli/1000 (floor), shortfall = planned −
    scheduled. Sums are exact int64; the floors pass through double
    division, exact while the products stay inside double's 2^53
    integer window — budgets/source-token counts up to ~9·10^12.
    Beyond that (frontier-scale token budgets), swap the floors for
    SQL ``DIV`` integer division; the plan is unchanged. One hash aggregation keyed by source (map-
    side combined), then scalar arithmetic on the dimension-sized
    rollup; the corpus never shuffles."""
    g = (
        docs.select(
            F.col(key).alias("source"),
            F.col(tokens_col).cast("long").alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").alias("available_tokens"))
        .withColumn(
            "share_milli",
            F.coalesce(
                *[
                    F.when(F.col("source") == k, F.lit(int(v)))
                    for k, v in target_shares_milli.items()
                ],
                F.lit(0),
            ).cast("long"),
        )
    )
    planned = F.floor(
        F.lit(int(token_budget)) * F.col("share_milli") / 1000
    ).cast("long")
    g = g.withColumn("planned_tokens", planned)
    epochs = F.least(
        F.floor(
            F.col("planned_tokens") * 1000 / F.col("available_tokens")
        ).cast("long"),
        F.lit(int(max_epochs_milli)),
    )
    g = g.withColumn("epochs_milli", epochs)
    scheduled = F.floor(
        F.col("available_tokens") * F.col("epochs_milli") / 1000
    ).cast("long")
    g = g.withColumn("scheduled_tokens", scheduled)
    return g.withColumn(
        "shortfall_tokens",
        (F.col("planned_tokens") - F.col("scheduled_tokens")).cast(
            "long"
        ),
    )


def ingest_images(images: DataFrame, min_entropy_bits: float = 3.0) -> DataFrame:
    """The composed image-INGEST chain a crawl runs between fetch and
    the corpus stages, one decision row per payload:

      sniff (magic bytes, JVM) → decode with the SNIFFED codec →
      entropy junk gate → dihedral-orbit exact dedup (keep min id)

    Statuses: ``drop_sniff`` (non-image payload), ``drop_decode``
    (sniffed codec still can't parse it), ``drop_entropy`` (flat
    junk), ``drop_dup`` (a rotated/mirrored copy of a kept image),
    ``kept``. Decoding with the sniffed format — not the declared
    label — is the point of sniffing first: a PNG served as .jpg
    decodes fine, and an error page never reaches Python at all.

    Plan: one codegen sniff projection; ONE Arrow decode pass
    computing entropy and the orbit hash together (the payload is
    decoded once for both gates); a hash agg on the 8-byte orbit
    hash + a broadcast-size join back for the dup election. The
    binary column never shuffles."""
    from . import multimodal

    sniffed = multimodal.sniff_mismatch(images)

    def _decode(pdf_iter):
        import pandas as pd

        from .imaging import decode_image, dihedral_phash64, pixel_entropy

        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.action == "drop":
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "sniffed_fmt": r.sniffed_fmt,
                            "stage": "drop_sniff",
                            "entropy_bits": None,
                            "rphash": None,
                        }
                    )
                    continue
                try:
                    arr = decode_image(bytes(r.bytes), r.sniffed_fmt)
                except (ValueError, NotImplementedError):
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "sniffed_fmt": r.sniffed_fmt,
                            "stage": "drop_decode",
                            "entropy_bits": None,
                            "rphash": None,
                        }
                    )
                    continue
                e = pixel_entropy(arr)
                if e < min_entropy_bits:
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "sniffed_fmt": r.sniffed_fmt,
                            "stage": "drop_entropy",
                            "entropy_bits": e,
                            "rphash": None,
                        }
                    )
                    continue
                rows.append(
                    {
                        "image_id": r.image_id,
                        "sniffed_fmt": r.sniffed_fmt,
                        "stage": "pass",
                        "entropy_bits": e,
                        "rphash": dihedral_phash64(arr),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "sniffed_fmt", "stage", "entropy_bits",
                    "rphash",
                ],
            )

    staged = sniffed.select(
        "image_id", "bytes", "sniffed_fmt", "action"
    ).mapInPandas(
        _decode,
        "image_id string, sniffed_fmt string, stage string,"
        " entropy_bits double, rphash long",
    )
    keep = (
        staged.filter(F.col("stage") == "pass")
        .groupBy("rphash")
        .agg(F.min("image_id").alias("keep_id"))
    )
    out = staged.join(keep, "rphash", "left")
    status = (
        F.when(F.col("stage") != "pass", F.col("stage"))
        .when(F.col("image_id") == F.col("keep_id"), F.lit("kept"))
        .otherwise(F.lit("drop_dup"))
    )
    return out.select(
        "image_id",
        "sniffed_fmt",
        status.alias("status"),
        F.round("entropy_bits", 4).alias("entropy_bits"),
        F.when(status == "drop_dup", F.col("keep_id")).alias("dup_of"),
    )
