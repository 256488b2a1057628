"""Hashed-linear classifier gate: exact integer arithmetic semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pholcus_spark import textops


def _w_milli(token: str, salt: str = "dom0", buckets: int = 4096) -> int:
    h = int(hashlib.md5(f"{salt}|{token}".encode()).hexdigest()[:15], 16)
    return (h % buckets) * 2654435761 % 2001 - 1000


def test_score_matches_python_reference(spark):
    texts = [
        "the quick brown fox",
        "lorem ipsum dolor sit amet",
        "a a a a a a a a",
        "one",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    score, milli = textops.hashed_linear_score(F.col("text"))
    got = {r["doc_id"]: (r["s"], r["m"]) for r in
           df.select("doc_id", score.alias("s"), milli.alias("m")).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        total = sum(_w_milli(x) for x in toks)
        assert got[i][1] == total
        micro = total * 1000
        n = len(toks)
        expect = (-(-micro // n) if micro < 0 else micro // n) / 1e6
        assert got[i][0] == expect


def test_gate_uses_exact_sum_sign(spark):
    # a single token whose weight is negative must be dropped even when
    # the truncated score rounds up to -0.0 == 0.0
    tok = None
    for cand in ("alpha", "beta", "gamma", "delta", "zzz", "qqq", "neg"):
        if -3 <= _w_milli(cand) < 0:
            tok = cand
            break
    # fall back: any negative-weight token still exercises the sign gate
    if tok is None:
        tok = next(c for c in ("alpha", "beta", "gamma", "delta", "zzz",
                               "qqq", "neg", "x", "y")
                   if _w_milli(c) < 0)
    df = spark.createDataFrame([(0, tok)], "doc_id long, text string")
    score, milli = textops.hashed_linear_score(F.col("text"))
    row = df.select(score.alias("s"), (milli >= 0).alias("kept")).head()
    assert row["kept"] is False
    assert row["s"] <= 0.0
