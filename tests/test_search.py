"""BM25 lexical retrieval unit tests (the oracle gate covers sf-scale
parity; these pin the scoring math and the plan shape)."""

from __future__ import annotations

import math

from pholcus_spark import search


def _bm25_ref(corpus, terms, k1=search.BM25_K1, b=search.BM25_B):
    """Straight-from-the-formula reference implementation."""
    docs = {d: t.split(" ") for d, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    out = {}
    for d, wsl in docs.items():
        s = 0.0
        for t in terms:
            tf = wsl.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(wsl) / avgdl))
        out[d] = round(s, 4)
    return out


def test_bm25_matches_reference_and_orders_correctly(spark):
    corpus = [
        (1, "spark shuffle join spark spark"),
        (2, "table scan filter sort"),
        (3, "spark table spark"),
        (4, "unrelated words entirely here"),
        (5, "table table table table table table"),
    ]
    terms = ["spark", "table"]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in search.bm25_topk(df, terms, k=5).collect()}
    want = _bm25_ref(corpus, terms)
    assert got == want
    # doc with zero matching terms scores 0; term saturation means doc 5's
    # six 'table's don't beat doc 1's three 'spark's plus idf weighting
    assert want[4] == 0.0
    ranked = sorted(got, key=lambda d: (-got[d], d))
    assert ranked[0] in (1, 3)  # spark-heavy docs win (spark is rarer)


def test_bm25_duplicate_terms_counted_once_and_k_limits(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta " + ("alpha " * (i % 3)).strip()) for i in range(1, 9)],
        "doc_id long, text string",
    )
    dup = search.bm25_topk(df, ["alpha", "alpha"], k=3).collect()
    single = search.bm25_topk(df, ["alpha"], k=3).collect()
    assert [(r["doc_id"], r["score"]) for r in dup] == [
        (r["doc_id"], r["score"]) for r in single
    ]
    assert len(dup) == 3


def test_bm25_plan_is_two_scans_and_a_topk(spark):
    """The only wide operators allowed are the 1-row broadcast join and
    the final TakeOrderedAndProject — no corpus explode, no corpus
    shuffle, no window sort."""
    df = spark.createDataFrame(
        [(i, f"word{i % 7} filler text") for i in range(64)],
        "doc_id long, text string",
    )
    plan = (
        search.bm25_topk(df, ["word1", "word3"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "Generate" not in plan  # no explode
    assert "Window" not in plan
    # Exchanges: the stats broadcast plus the SinglePartition reduce of
    # the partial aggregates (1 row per partition — metadata-sized);
    # nothing moves corpus-sized data
    wide = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert wide == plan.count("Exchange SinglePartition") == 1
