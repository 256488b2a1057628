"""Packing/selection invariants beyond oracle value-parity: the
greedy-fill properties the shard assignment must keep at any scale."""

import pytest
from pyspark.sql import functions as F

from pholcus_spark import pipeline

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_pack_shards_invariants(spark, docs):
    budget = 500
    packed = pipeline.pack_shards(docs, token_budget=budget, n_groups=4)
    rows = packed.collect()
    # every doc assigned exactly once
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["pack_group"], []).append(r)
    for grp, rs in by_group.items():
        rs.sort(key=lambda r: r["doc_id"])
        # shards are contiguous from 0 and non-decreasing in fill order
        shards = [r["shard"] for r in rs]
        assert shards[0] == 0
        assert all(b - a >= 0 for a, b in zip(shards, shards[1:]))
        # greedy-fill property: a doc lands in the shard holding its
        # first token — the tokens BEFORE it are < (shard+1)*budget
        before = 0
        for r in rs:
            assert r["shard"] == before // budget
            before += r["n_tokens"]


def test_pack_shards_group_count_bounds_parallelism(spark, docs):
    packed = pipeline.pack_shards(docs, token_budget=10**9, n_groups=8)
    groups = packed.select("pack_group").distinct().collect()
    assert {g["pack_group"] for g in groups} <= set(range(8))
    # giant budget -> exactly one shard per group
    assert packed.filter(F.col("shard") != 0).count() == 0


def test_cap_per_source_keeps_top_k_longest(spark, docs):
    k = 3
    capped = pipeline.cap_per_source(docs, k=k).collect()
    per_src: dict[str, list] = {}
    for r in capped:
        per_src.setdefault(r["source"], []).append(r)
    full = docs.select("doc_id", "source", "n_chars").collect()
    by_src: dict[str, list] = {}
    for r in full:
        by_src.setdefault(r["source"], []).append(r)
    for src, kept in per_src.items():
        assert len(kept) <= k
        want = sorted(by_src[src], key=lambda r: (-r["n_chars"], r["doc_id"]))
        assert sorted(r["doc_id"] for r in kept) == sorted(
            r["doc_id"] for r in want[:k]
        )


def test_decontaminate_drops_eval_and_dups(spark, docs):
    """Eval docs remove themselves and any doc sharing a k-gram (in
    particular their exact duplicates); disjoint docs survive."""
    from pyspark.sql import functions as F

    eval_docs = docs.filter(F.col("doc_id") % 83 == 0)
    clean = pipeline.decontaminate(docs, eval_docs, k=5)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    eval_rows = eval_docs.select("doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"] for r in
             docs.select("doc_id", "text").collect()}
    for r in eval_rows:
        if len(r["text"].split(" ")) >= 5:
            assert r["doc_id"] not in kept
            # exact duplicates of an eval doc are contaminated too
            for did, t in texts.items():
                if t == r["text"]:
                    assert did not in kept
    # nothing else vanished: every kept doc shares no 5-gram with eval
    def grams(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i+5]) for i in range(max(len(ws)-4, 0))}
    ev_grams = set()
    for r in eval_rows:
        ev_grams |= grams(r["text"])
    for did in kept:
        assert not (grams(texts[did]) & ev_grams)


def test_sample_mix_rates_and_determinism(spark, docs):
    from pyspark.sql import functions as F

    rates = {"en": 100, "zh": 0, "de": 50}
    s1 = pipeline.sample_mix(docs, rates, key="lang", default_pct=25)
    s2 = pipeline.sample_mix(docs, rates, key="lang", default_pct=25)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # deterministic, no rand()
    by_lang = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    tot = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en", 0) == tot["en"]  # 100% stratum kept whole
    assert "zh" not in by_lang                # 0% stratum empty
    assert 0 < by_lang.get("de", 0) < tot["de"]  # partial stratum


def test_corpus_stats_rollup_structure(spark, docs):
    from pyspark.sql import functions as F

    stats = pipeline.corpus_stats(docs).collect()
    total = docs.count()
    grand = [r for r in stats if r["lang"] is None and r["source"] is None]
    assert len(grand) == 1 and grand[0]["n_docs"] == total
    # per-lang subtotals (source NULL) sum back to the grand total
    per_lang = [r for r in stats if r["lang"] is not None and r["source"] is None]
    assert sum(r["n_docs"] for r in per_lang) == total
    # leaf rows sum to their lang subtotal
    leaves = [r for r in stats if r["source"] is not None]
    for sub in per_lang:
        leaf_sum = sum(
            r["n_docs"] for r in leaves if r["lang"] == sub["lang"]
        )
        assert leaf_sum == sub["n_docs"]
    # token total is the same whole-corpus sum the flat agg computes
    flat = docs.agg(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0]["t"]
    assert grand[0]["n_tokens"] == flat


def test_select_image_corpus_stages(spark):
    from pholcus_spark import multimodal, pipeline

    meta = spark.createDataFrame(
        [
            # a/b: one bit apart (band-sharing candidates, hamming 1)
            ("a", 64, 64, "png", True, "x", 0),
            ("b", 64, 64, "png", True, "y", 1 << 32),
            # c: far phash, duplicate caption of a
            ("c", 64, 64, "png", True, "x", 0x5555555555555555),
            # d: fails the min-width gate
            ("d", 8, 64, "png", True, "z", 0x00FF00FF00FF00FF),
            # e: independent survivor
            ("e", 64, 64, "jpeg", True, "w", -0x5555555555555556),
        ],
        "image_id string, w int, h int, fmt string, decode_ok boolean,"
        " caption string, phash long",
    )
    pairs = multimodal.phash_verified_pairs(meta, max_hamming=2)
    got_pairs = {(r["image_a"], r["image_b"]) for r in pairs.collect()}
    assert got_pairs == {("a", "b")}  # banding candidates, verify kills none

    kept = {
        r["image_id"]
        for r in pipeline.select_image_corpus(
            meta, pairs, min_w=32, min_h=32
        ).collect()
    }
    # d gated out; c loses the caption tie to a; b loses the phash
    # component to canonical a
    assert kept == {"a", "e"}


def test_unigram_nll_matches_hand_computation(spark):
    """unigram_nll: Laplace-smoothed corpus unigram fit. Corpus
    'a a b' + 'a c': C(a)=3, C(b)=1, C(c)=1, T=5, V=3 -> p(a)=4/8,
    p(b)=p(c)=2/8; doc nll = -(sum c*ln p)/n."""
    import math

    from pholcus_spark import pipeline

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pipeline.unigram_nll(docs).collect()}
    pa, pb = 4 / 8, 2 / 8
    want1 = -(2 * math.log(pa) + 1 * math.log(pb)) / 3
    want2 = -(math.log(pa) + math.log(pb)) / 2
    assert rows[1]["n_tokens"] == 3 and rows[1]["nll"] == round(want1, 4)
    assert rows[2]["n_tokens"] == 2 and rows[2]["nll"] == round(want2, 4)
    # the stereotyped all-'a' doc scores lower nll than a rare-word doc
    assert rows[1]["nll"] < rows[2]["nll"]


def test_tfidf_topk_picks_distinctive_terms(spark):
    """tfidf_topk_terms: a term unique to one doc outranks corpus-wide
    terms; scores match the hand formula; ties break by term asc."""
    import math

    from pholcus_spark import pipeline

    docs = spark.createDataFrame(
        [
            (1, "common rare common unique"),
            (2, "common common common common"),
            (3, "common rare zz aa"),
        ],
        "doc_id long, text string",
    )
    rows = pipeline.tfidf_topk_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["score"]))
    # doc 1: unique (df=1) wins over rare (df=2); common (df=3 = N) scores 0
    assert by_doc[1][0][0] == "unique"
    assert by_doc[1][0][1] == round(0.25 * math.log(3 / 1), 4)
    assert by_doc[1][1] == ("rare", round(0.25 * math.log(3 / 2), 4))
    # doc 2: only 'common' exists; ln(3/3)=0 -> one row, score 0
    assert by_doc[2] == [("common", 0.0)]
    # doc 3: aa and zz tie on (c=1, df=1) -> term asc breaks the tie
    assert [t for t, _ in by_doc[3]] == ["aa", "zz"]


def test_curate_corpus_strip_gate_dedup_chain(spark):
    """curate_corpus end-to-end: duplicated blocks strip out, a doc
    that was ALL duplicated text drops on the length gate, and two docs
    whose cleaned remainders become identical collapse to the min
    doc_id (dedup bites only after the strip)."""
    from pholcus_spark import pipeline

    block_a = " ".join(f"a{i}" for i in range(30))
    block_b = " ".join(f"b{i}" for i in range(30))
    pad90 = " ".join(f"p{i}" for i in range(6))
    pad91 = " ".join(f"q{i}" for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel"),
            (2, block_a + " tail z"),   # cleans to 'tail z'
            (3, block_b + " tail z"),   # cleans to 'tail z' too -> dup of 2
            (4, block_a),               # fully duplicated -> '' -> dropped
            (90, block_a + " " + pad90),
            (91, block_b + " " + pad91),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in pipeline.curate_corpus(
            docs, shingle_k=3, min_words=2,
            min_entropy=0.5, max_top_word_frac=0.6,
        ).collect()
    }
    assert set(rows) == {1, 2, 90, 91}
    assert rows[1]["clean_text"] == "alpha bravo charlie delta echo foxtrot golf hotel"
    assert rows[2]["clean_text"] == "tail z"  # doc 3 deduped away
    assert rows[90]["clean_text"] == pad90
    assert rows[91]["clean_text"] == pad91


def test_calibrate_gates_exact_and_approx(spark):
    """20 (metric, p, threshold) rows; thresholds monotone in p; the
    t-digest scale path lands within rank noise of the exact one."""
    from pholcus_spark import pipeline

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + i % 40)))
         for i in range(400)],
        "doc_id long, text string",
    )
    exact = pipeline.calibrate_gates(docs).collect()
    assert len(exact) == 20
    by_metric = {}
    for r in exact:
        by_metric.setdefault(r["metric"], []).append((r["p"], r["threshold"]))
    assert set(by_metric) == {"n_chars", "n_words", "n_uniq", "n_stop"}
    for rows in by_metric.values():
        rows.sort()
        ts = [t for _, t in rows]
        assert ts == sorted(ts)  # monotone in p
    approx = {(r["metric"], r["p"]): r["threshold"]
              for r in pipeline.calibrate_gates(docs, exact=False).collect()}
    for r in exact:
        a = approx[(r["metric"], r["p"])]
        # t-digest default accuracy: within a few rank positions; the
        # word counts step by 1, so a loose absolute bound suffices
        assert abs(a - r["threshold"]) <= max(3.0, 0.05 * r["threshold"])


def test_decontaminate_bloom_matches_exact(spark):
    """The bloom prefilter is semantics-invisible: result sets equal the
    exact operator even with a deliberately tiny false-positive-heavy
    bitmap; an eval-free corpus passes through untouched."""
    from pholcus_spark import pipeline

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{(i * 7 + j) % 50}" for j in range(12)))
         for i in range(120)],
        "doc_id long, text string",
    )
    ev = docs.filter("doc_id % 13 = 0")
    exact = {r["doc_id"]
             for r in pipeline.decontaminate(docs, ev, k=4).collect()}
    # honest, FP-saturated, and past-the-literal-threshold sizings —
    # the last takes the broadcast-joined dense-array path
    for n_bits in (1 << 16, 128, 1 << 25):
        got = {r["doc_id"] for r in
               pipeline.decontaminate_bloom(docs, ev, k=4,
                                            n_bits=n_bits).collect()}
        assert got == exact
    empty = ev.filter("doc_id < 0")
    assert pipeline.decontaminate_bloom(docs, empty, k=4).count() == 120


def test_dsir_score_discriminates_and_handles_edges(spark):
    """Docs written in the target's vocabulary outscore docs in a
    disjoint vocabulary (and gate positive once counts dominate the
    Laplace smoothing); a doc with < 2 words has no bigram features and
    scores exactly 0.0 / not kept; an empty target still evaluates
    (pure smoothing, no crash)."""
    from pholcus_spark import pipeline

    # long texts so bucket counts are comparable to B and the
    # normalizer isn't washed out by the +B smoothing term
    tgtish = "the quick brown fox jumps over the lazy dog again " * 40
    rawish = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 40
    docs = spark.createDataFrame(
        [(1, tgtish), (2, rawish), (3, tgtish + " extra"),
         (4, "single"), (5, rawish + " more")],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id = 1")
    rows = {r["doc_id"]: r for r in
            pipeline.dsir_score(docs, target, n_buckets=256).collect()}
    # ordering is the core property: target-vocabulary docs above
    # raw-vocabulary docs
    assert rows[1]["dsir_score"] > rows[2]["dsir_score"]
    assert rows[3]["dsir_score"] > rows[5]["dsir_score"]
    # with counts >> smoothing the gate's sign discriminates too
    assert rows[1]["kept"] and rows[3]["kept"]
    assert not rows[2]["kept"] and not rows[5]["kept"]
    assert rows[4]["dsir_score"] == 0.0 and not rows[4]["kept"]

    empty_target = docs.filter("doc_id < 0")
    out = pipeline.dsir_score(docs, empty_target).collect()
    assert len(out) == 5  # smoothing only; every doc still scored


def test_budget_select_two_level_prefix_matches_naive_window(spark):
    """The two-level prefix (group aggregate + broadcast prefix +
    residual tie-group cumsum) must equal the naive single-window
    cumsum, including when a TIE GROUP spans the budget boundary (the
    residual window's doc_id order decides who fits)."""
    from pholcus_spark import pipeline
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pholcus_spark import textops

    rows = []
    # en: sizes 10,10,10,10 (tie group), budget 25 -> first two fit
    for i, n in enumerate([10, 10, 10, 10]):
        rows.append((i, "en", "x " * n))
    # de: descending sizes 8,5,3 budget 13 -> 8+5 fit, 3 over
    for i, n in enumerate([8, 5, 3]):
        rows.append((100 + i, "de", "y " * n))
    # fr present in docs but NOT budgeted -> excluded entirely
    rows.append((200, "fr", "z " * 9))
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, _l, t in rows], "doc_id long, text string"
    ).join(
        spark.createDataFrame(
            [(i, l) for i, l, _t in rows], "doc_id long, lang string"
        ),
        "doc_id",
    )
    budgets = {"en": 25, "de": 13}
    got = {
        r["doc_id"]
        for r in pipeline.budget_select(docs, budgets).collect()
    }
    assert got == {0, 1, 100, 101}

    # naive reference: one window per stratum
    d = docs.filter(F.col("lang").isin(*budgets)).select(
        "doc_id", "lang",
        F.size(textops.words(F.col("text"))).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bmap = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    naive = {
        r["doc_id"]
        for r in d.withColumn("cum", F.sum("n").over(w))
        .filter(F.col("cum") <= F.element_at(bmap, F.col("lang")))
        .collect()
    }
    assert got == naive


def test_pack_sequences_invariants(spark):
    """Packing invariants: every sequence except the last is exactly
    full; each doc's spans tile [0, n_tokens) contiguously; span
    placement inside the sequence is consistent."""
    from pholcus_spark import pipeline

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range((i * 7) % 40 + 1)))
         for i in range(60)],
        "doc_id long, text string",
    )
    L = 16
    spans = pipeline.pack_sequences(docs, seq_len=L, order_groups=8).collect()
    by_seq: dict = {}
    by_doc: dict = {}
    for r in spans:
        by_seq.setdefault(r["seq_id"], []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)
    last = max(by_seq)
    total = sum(r["n_toks"] for r in spans)
    assert sorted(by_seq) == list(range(last + 1))  # no gaps
    for sid, rows in by_seq.items():
        filled = sum(r["n_toks"] for r in rows)
        assert filled == (L if sid < last else total - last * L)
        # spans tile the sequence contiguously from 0
        rows = sorted(rows, key=lambda r: r["seq_begin"])
        pos = 0
        for r in rows:
            assert r["seq_begin"] == pos
            pos += r["n_toks"]
    n_tokens = {i: (i * 7) % 40 + 1 for i in range(60)}
    for did, rows in by_doc.items():
        rows = sorted(rows, key=lambda r: r["doc_begin"])
        pos = 0
        for r in rows:
            assert r["doc_begin"] == pos
            pos += r["n_toks"]
        assert pos == n_tokens[did]


def test_bigram_nll_sees_word_order(spark):
    """The conditional bigram model must distinguish a doc whose words
    follow the corpus's dominant ORDER from one with the same words
    scrambled (identical unigram profile — unigram_nll scores them
    equal); a one-word doc has no bigrams and a NULL score."""
    from pholcus_spark.pipeline import bigram_nll, unigram_nll

    phrase = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy fox the brown jumps"
    docs = spark.createDataFrame(
        [(i, phrase) for i in range(8)] + [(8, scrambled), (9, "word")],
        "doc_id long, text string",
    )
    bi = {r["doc_id"]: r for r in bigram_nll(docs).collect()}
    uni = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
    assert bi[0]["n_bigrams"] == 8
    # same unigram profile -> identical unigram scores...
    assert uni[0]["nll"] == uni[8]["nll"]
    # ...but the scrambled doc is far more surprising to the bigram LM
    assert bi[8]["nll"] > bi[0]["nll"] + 0.5
    assert bi[9]["n_bigrams"] == 0 and bi[9]["nll"] is None


def test_epoch_mix_cap_and_exact_arithmetic(spark):
    from pholcus_spark import pipeline

    docs = spark.createDataFrame(
        [("web", 1000), ("web", 1000), ("code", 100), ("books", 500)],
        "lang string, n_tokens long",
    )
    out = {r["source"]: r for r in pipeline.epoch_mix(
        docs, {"web": 500, "code": 400, "books": 100},
        token_budget=10_000, max_epochs_milli=4000,
    ).collect()}
    web = out["web"]
    assert web["available_tokens"] == 2000
    assert web["planned_tokens"] == 5000        # 10k * 500/1000
    assert web["epochs_milli"] == 2500          # 5000/2000 uncapped
    assert web["scheduled_tokens"] == 5000 and web["shortfall_tokens"] == 0
    code = out["code"]
    assert code["planned_tokens"] == 4000
    assert code["epochs_milli"] == 4000         # 40 epochs wanted -> capped
    assert code["scheduled_tokens"] == 400
    assert code["shortfall_tokens"] == 3600     # the cap records the gap
    books = out["books"]
    assert books["epochs_milli"] == 2000 and books["shortfall_tokens"] == 0


def test_ingest_images_chain_statuses(spark):
    import numpy as np

    from pholcus_spark import pipeline
    from pholcus_spark.imaging import (
        apply_exif_orientation,
        encode_image,
    )
    from pholcus_spark.synthetic import image_for_doc

    arr, _ = image_for_doc(12)
    png = encode_image(arr, "png")
    rot = encode_image(apply_exif_orientation(arr, 6), "png")
    solid = encode_image(np.full_like(arr, 9), "png")
    phlj = encode_image(arr, "jpeg")
    rows = [
        ("a-real", png, "png"),
        ("b-rotcopy", rot, "png"),            # dup of a-real's orbit
        ("c-err", b"<html>404</html>", "png"),
        ("d-trunc", png[:20], "png"),
        ("e-flat", solid, "png"),
        ("f-mislabeled", phlj, "png"),        # PHLJ served as png
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b), f) for i, b, f in rows],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in pipeline.ingest_images(df).collect()}
    assert got["a-real"]["status"] == "kept"
    assert got["b-rotcopy"]["status"] == "drop_dup"
    assert got["b-rotcopy"]["dup_of"] == "a-real"
    assert got["c-err"]["status"] == "drop_sniff"
    assert got["d-trunc"]["status"] == "drop_decode"
    assert got["e-flat"]["status"] == "drop_entropy"
    # sniff relabels the PHLJ payload so decode succeeds -> kept
    assert got["f-mislabeled"]["sniffed_fmt"] == "jpeg"
    assert got["f-mislabeled"]["status"] in ("kept", "drop_dup")
