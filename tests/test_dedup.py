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
