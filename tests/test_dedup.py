"""Dedup-operator unit tests (the oracle gate covers end-to-end parity;
these pin the edge cases the sf-scale corpus may not contain)."""

from __future__ import annotations

from pholcus_spark import dedup


def test_minhash_short_doc_components_are_minus_one(spark):
    """Docs with < shingle_k words have NO shingles: every signature
    component must be the oracle's empty-aggregate value -1, not
    md5(str(i)) from concat_ws silently dropping the NULL shingle
    (ADVICE r2)."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "one two three four")],
        "doc_id long, text string",
    )
    comp = {
        r["doc_id"]: r
        for r in dedup.minhash_components(docs, k=4, shingle_k=3).collect()
    }
    assert all(comp[1][f"mh{i}"] == -1 for i in range(4))
    # a doc with real shingles keeps real (non-sentinel) components
    assert all(comp[2][f"mh{i}"] != -1 for i in range(4))


def test_ngram_prefix_filter_lossless_under_stop_shingle(spark):
    """The prefix-filtered exact Jaccard join must return EXACTLY the
    brute-force pair set even when one stop-shingle is shared by a
    large fraction of docs (VERDICT-r2 #3). Brute force here = block
    self-join + array_intersect over the same shingle sets."""
    import random

    from pyspark.sql import functions as F

    from pholcus_spark.textops import word_shingles, words

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for d in range(80):
        n = rng.randint(8, 30)
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        if d % 5 == 0:  # df = 20% stop-shingle
            toks += ["hot", "stop", "shingle"]
        if d % 17 == 0 and d > 0:  # a few true near-dups
            toks = toks[:3] + ["w1", "w2", "w3", "w4", "w5", "w6"] * 3
        rows.append((d, " ".join(toks), "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.05).collect()
    }

    sh = docs.select(
        "doc_id", F.col("lang").alias("block"),
        F.array_distinct(word_shingles(words(F.col("text")), 3)).alias("sh"),
    )
    l, r = sh.alias("l"), sh.alias("r")
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    brute = (
        l.join(r, [F.col("l.block") == F.col("r.block"),
                   F.col("l.doc_id") < F.col("r.doc_id")])
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.05)
    )
    want = {(x["doc_a"], x["doc_b"], x["jaccard"]) for x in brute.collect()}
    assert got == want and want, (len(got), len(want))


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict:
    """Union-find ground truth: node -> component min."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for a, b in edges:
        for x in (a, b):
            out[x] = find(x)
    return out


def test_star_components_chain_converges_logarithmically(spark):
    """A 10k-node path graph is the adversarial case for min-label
    propagation (diameter rounds = 10k); large-star/small-star must
    converge in ~log2(n) rounds and still label every node with the
    component minimum."""
    import math

    n = 10_000
    pairs = spark.range(n - 1).selectExpr(
        "id AS doc_a", "id + 1 AS doc_b"
    )
    labels, rounds = dedup.star_components(pairs)
    assert rounds <= math.ceil(math.log2(n)) + 4, rounds
    rows = labels.collect()
    assert len(rows) == n
    assert all(r["component_id"] == 0 for r in rows)


def test_star_components_matches_union_find(spark):
    """Random multi-component graphs (plus stars, cliques, and isolated
    pairs) agree with a union-find ground truth."""
    import random

    rng = random.Random(42)
    n = 400
    edges = set()
    # random sparse edges -> several nontrivial components
    for _ in range(300):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((a, b))
    # a clique and a star, far away from the random block
    for i in range(450, 460):
        for j in range(i + 1, 460):
            edges.add((i, j))
    for leaf in range(501, 520):
        edges.add((500, leaf))
    edges = sorted(edges)
    truth = _uf_components(600, edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels, _ = dedup.star_components(pairs)
    got = {r["doc_id"]: r["component_id"] for r in labels.collect()}
    assert got == truth


def test_duplicate_spans_merges_runs_and_counts_within_doc(spark):
    """duplicate_spans semantics: a k-gram repeated WITHIN one doc is a
    duplicate (corpus-wide count >= 2 includes same-doc repeats),
    adjacent duplicated positions merge into one maximal span, and
    docs shorter than k or with unique text emit nothing."""
    k = 3
    shared = "alpha beta gamma delta"  # 4 tokens -> positions 0,1 dup'd
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 xx"),
            (2, shared + " unique2 tail2 yy"),
            (3, "self rep self rep self rep self rep"),  # within-doc repeat
            (4, "too short"),  # < k tokens: no shingles at all
            (5, "all tokens here are strictly once only"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["span_start"]): r
        for r in dedup.duplicate_spans(docs, shingle_k=k).collect()
    }
    # docs 1 and 2 share k-grams at positions 0 and 1 -> one merged span
    # covering tokens 0..(1+k-1)=3, i.e. exactly the shared prefix
    for d in (1, 2):
        r = rows[(d, 0)]
        assert (r["span_end"], r["n_grams"], r["n_tokens"]) == (3, 2, 4)
    # doc 3: "self rep self" == tokens 0-2, 2-4, 4-6 — every 'self rep
    # self'/'rep self rep' 3-gram repeats within the doc, one full span
    r3 = rows[(3, 0)]
    assert r3["span_end"] == 7 and r3["n_tokens"] == 8
    # nothing from the short doc or the all-unique doc
    assert not any(d in (4, 5) for d, _ in rows)


def test_repetition_stats_degenerate_and_unique_docs(spark):
    """repetition_stats edge cases: a degenerate all-one-word doc has
    every fraction 1.0; an all-unique doc has dup fractions 0 with
    top fractions 1/n; a one-word doc has NULL bigram stats."""
    from pyspark.sql import functions as F

    from pholcus_spark import textops

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here differ"),
            (3, "single"),
            (4, "ab ab cd ab cd ef"),
        ],
        "doc_id long, text string",
    )
    r = textops.repetition_stats(F.col("text"))
    rows = {
        x["doc_id"]: x
        for x in docs.select(
            "doc_id", *[v.alias(k) for k, v in r.items()]
        ).collect()
    }
    assert rows[1]["top_word_frac"] == 1.0 and rows[1]["dup_word_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0  # 'spam spam' x3
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_word_frac"] == 0.25  # 1 of 4
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[3]["top_word_frac"] == 1.0  # the single word is the top
    assert rows[3]["dup_word_frac"] == 0.0
    assert rows[3]["top_bigram_frac"] is None
    assert rows[3]["dup_bigram_frac"] is None
    # doc 4: words = [ab,ab,cd,ab,cd,ef] -> top ab 3/6, dup (ab:3+cd:2)/6
    assert rows[4]["top_word_frac"] == 0.5
    assert rows[4]["dup_word_frac"] == round(5 / 6, 4)
    # bigrams: [ab ab, ab cd, cd ab, ab cd, cd ef] -> top 'ab cd' 2/5
    assert rows[4]["top_bigram_frac"] == 0.4
    assert rows[4]["dup_bigram_frac"] == 0.4


def test_pii_columns_redacts_and_counts(spark):
    """pii_columns: multiple matches per kind all redact, clean text
    passes through byte-identical, and an IP glued to a word (no
    boundary) is NOT redacted."""
    from pyspark.sql import functions as F

    from pholcus_spark import textops

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e-f.org then call +1-555-0199 ok"),
            (2, "clean text with no contact info at all"),
            (3, "hosts 10.0.0.1 and 192.168.1.255 but notanip1.2.3.4x"),
            (4, "+1-555-0000 +1-555-1111 twice"),
        ],
        "doc_id long, text string",
    )
    p = textops.pii_columns(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in p.items()]
        ).collect()
    }
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> and <EMAIL> then call <PHONE> ok"
    assert rows[2]["redacted"] == "clean text with no contact info at all"
    assert (rows[2]["n_emails"], rows[2]["n_phones"], rows[2]["n_ips"]) == (0, 0, 0)
    # \b guards: the two real IPs redact, the glued one survives intact
    assert rows[3]["n_ips"] == 2
    assert "notanip1.2.3.4x" in rows[3]["redacted"]
    assert rows[4]["redacted"] == "<PHONE> <PHONE> twice"


def test_word_entropy_degenerate_uniform_and_known_value(spark):
    """word_entropy: all-same-word doc -> 0; all-distinct doc ->
    ln(n); a 3:1 mix matches the hand-computed H."""
    import math

    from pyspark.sql import functions as F

    from pholcus_spark import textops

    docs = spark.createDataFrame(
        [
            (1, "x x x x x x"),
            (2, "a b c d"),
            (3, "a a a b"),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", textops.word_entropy(F.col("text")).alias("h")
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] == round(math.log(4), 4)
    want3 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got[3] == round(want3, 4)
    assert got[4] == 0.0


def test_strip_duplicate_spans_cuts_and_passes_through(spark):
    """strip_duplicate_spans: duplicated spans are cut from BOTH docs
    sharing them, a fully-duplicated doc strips to '', and docs with no
    spans pass through byte-identical with 0 removed."""
    k = 3
    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail one here"),  # shares 'tail' too
            (2, shared + " tail two there"),
            (3, shared),  # wholly duplicated -> empty after strip
            (4, "totally unique words everywhere now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.strip_duplicate_spans(docs, shingle_k=k).collect()
    }
    assert len(rows) == 4  # every doc comes back
    # docs 1 and 2 share "...delta tail" too, so the duplicated run
    # covers 'tail' as well: 5 tokens cut from each
    assert rows[1]["clean_text"] == "one here"
    assert rows[1]["n_removed_tokens"] == 5
    assert rows[2]["clean_text"] == "two there"
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed_tokens"] == 4
    assert rows[4]["clean_text"] == "totally unique words everywhere now"
    assert rows[4]["n_removed_tokens"] == 0


def test_incremental_dedup_admits_against_corpus_and_self(spark):
    """A batch doc duplicating a corpus doc is dropped; a batch doc
    duplicating a LOWER-id batch doc is dropped (keep-min pairwise);
    unique batch docs survive; the corpus is never filtered. A
    precomputed band index (the production path) gives the same
    answer, and a survivor admitted to the index blocks its own
    near-dup in the NEXT increment."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "totally different words about another topic entirely"
    corpus = spark.createDataFrame(
        [(1, base), (2, "iota kappa lambda mu nu xi omicron pi")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base),            # exact dup of corpus doc 1 -> drop
            (11, uniq),            # unique -> keep
            (12, uniq),            # dup of batch doc 11 -> drop
            (13, "rho sigma tau upsilon phi chi psi omega"),  # keep
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in dedup.incremental_dedup(corpus, batch).collect()
    }
    assert kept == {11, 13}

    # production path: corpus bands precomputed once, reused
    bands = dedup.minhash_bands(corpus, 8, 2, 3)
    kept2 = {
        r["doc_id"]
        for r in dedup.incremental_dedup(
            corpus, batch, corpus_bands=bands
        ).collect()
    }
    assert kept2 == kept

    # next increment: 11 survived, so its near-dup arriving later is
    # blocked once the survivor's bands join the index
    corpus2 = corpus.unionByName(batch.filter("doc_id in (11, 13)"))
    batch2 = spark.createDataFrame(
        [(20, uniq), (21, "fresh content never seen before anywhere")],
        "doc_id long, text string",
    )
    kept3 = {
        r["doc_id"]
        for r in dedup.incremental_dedup(corpus2, batch2).collect()
    }
    assert kept3 == {21}


def test_incremental_dedup_with_persisted_band_index(spark, tmp_path):
    """The production loop: corpus bands persisted once (bucketed by
    band key on disk), each increment read back from the index — the
    corpus text is never re-scanned. Admits must equal the on-the-fly
    computation, and appending a survivor's bands must block its
    near-dup in the next increment."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, base), (2, "iota kappa lambda mu nu xi omicron pi")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "band_index")
    dedup.minhash_bands(corpus, 8, 2, 3).write.mode("overwrite").parquet(idx)

    batch = spark.createDataFrame(
        [(10, base), (11, "totally different words entirely here yes")],
        "doc_id long, text string",
    )
    from_index = dedup.incremental_dedup(
        corpus, batch, corpus_bands=spark.read.parquet(idx)
    )
    kept = {r["doc_id"] for r in from_index.collect()}
    on_the_fly = {
        r["doc_id"] for r in dedup.incremental_dedup(corpus, batch).collect()
    }
    assert kept == on_the_fly == {11}

    # append the survivor's bands; its clone is blocked next increment
    survivors = batch.filter("doc_id = 11")
    dedup.minhash_bands(survivors, 8, 2, 3).write.mode("append").parquet(idx)
    batch2 = spark.createDataFrame(
        [(20, "totally different words entirely here yes")],
        "doc_id long, text string",
    )
    kept2 = dedup.incremental_dedup(
        corpus.unionByName(survivors), batch2,
        corpus_bands=spark.read.parquet(idx),
    )
    assert kept2.count() == 0


def test_mirror_hosts_cap_drops_ubiquitous_key(spark):
    """A key shared by every host (the identical-404 trap) must not
    pair unrelated hosts; true mirrors still pair on below-cap keys."""
    from pholcus_spark import dedup

    rows = []
    # 6 hosts all serve the same error page
    for h in range(6):
        rows.append((f"h{h}", "/err", 1))
    # h0/h1 are true mirrors on 3 more keys; h2..h5 unique content
    for i in range(3):
        rows.append(("h0", f"/p{i}", 100 + i))
        rows.append(("h1", f"/p{i}", 100 + i))
    for h in range(2, 6):
        for i in range(3):
            rows.append((f"h{h}", f"/p{i}", 1000 * h + i))
    pages = spark.createDataFrame(
        rows, "host string, path string, content_fp long"
    )
    got = dedup.mirror_hosts(
        pages, min_shared=2, min_jaccard_milli=500, max_hosts_per_key=4
    ).collect()
    assert [(r["host_a"], r["host_b"], r["n_shared"], r["jaccard_milli"])
            for r in got] == [("h0", "h1", 3, 1000)]
    # without the cap the error page pairs everyone (and distorts
    # totals): 15 host pairs share at least the /err key
    uncapped = dedup.mirror_hosts(
        pages, min_shared=1, min_jaccard_milli=0, max_hosts_per_key=0
    ).collect()
    assert len(uncapped) == 15


def test_line_dedup_first_occurrence_and_exemptions(spark):
    """Cross-doc dup keeps only the global first occurrence; a dup
    WITHIN one doc drops its second copy; short lines are exempt;
    normalization (trim+case) detects dups but output preserves the
    original line text."""
    from pholcus_spark.dedup import line_dedup

    long_a = "this is a long boilerplate line for dedup"
    docs = spark.createDataFrame(
        [
            (1, f"{long_a}\nok\nunique line in doc one here"),
            # same line twice in one doc: idx 0 dropped (doc 1 idx 0 wins),
            # idx 2 dropped too
            (2, f"{long_a}\nok\n{long_a}"),
            # case/whitespace variant: still a dup, drops
            (3, f"  {long_a.upper()}  \nunique line in doc three"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, min_chars=10).collect()}
    assert got[1]["text_clean"] == (
        f"{long_a}\nok\nunique line in doc one here"
    )
    assert got[1]["n_dropped"] == 0
    assert got[2]["text_clean"] == "ok"
    assert got[2]["n_dropped"] == 2
    # original (uppercase, padded) text removed, unique line survives
    assert got[3]["text_clean"] == "unique line in doc three"
    assert got[3]["n_dropped"] == 1
    assert got[1]["n_lines"] == 3
    assert got[2]["n_lines"] == 3
    assert got[3]["n_lines"] == 2


def test_minhash_recall_eval_catches_exact_dup_misses_disjoint(spark):
    """An exact duplicate (jaccard 1.0) must be in truth AND caught
    (identical signatures collide in every band). A near-miss pair
    below the threshold never appears in truth."""
    from pholcus_spark.dedup import minhash_recall_eval

    body = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, "en", body), (2, "en", body), (3, "en", other)],
        "doc_id long, lang string, text string",
    )
    rows = minhash_recall_eval(docs, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["jaccard"] == 1.0
    assert r["caught"] is True


def test_containment_catches_excerpts_jaccard_misses(spark):
    host_words = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, "en", host_words), (2, "en", excerpt),
         (3, "en", " ".join(f"z{i}" for i in range(40)))],
        "doc_id long, lang string, text string",
    )
    got = dedup.containment_pairs(df, threshold=0.8).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in got}
    # excerpt ⊆ host at 1.0; host NOT contained in excerpt
    assert pairs == {(2, 1): 1.0}
    # the symmetric operator is blind to the same pair at any useful
    # threshold: jaccard = 8/58
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert jac == []


def test_containment_both_directions_for_near_equal(spark):
    a = " ".join(f"w{i}" for i in range(20))
    b = " ".join(f"w{i}" for i in range(19))  # one word shorter
    df = spark.createDataFrame(
        [(1, "en", a), (2, "en", b)], "doc_id long, lang string, text string"
    )
    got = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in dedup.containment_pairs(df, threshold=0.9).collect()}
    assert got[(2, 1)] == 1.0          # B fully inside A
    assert 0.9 <= got[(1, 2)] < 1.0    # A almost inside B (17/18)
