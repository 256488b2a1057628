"""Lexical retrieval over the ``documents`` table.

BM25 top-k — the keyword-search twin of the embedding ANN family in
``ann.py``: a training-data pipeline uses it for targeted corpus
audits ("show me the docs about X"), quality probes, and as the sparse
half of hybrid retrieval.

Scale shape (the point of the implementation): the query is a handful
of literal terms, so per-doc term frequencies are plain JVM
``filter``/``size`` expressions over the already-split word array — no
explode, no per-term shuffle. Corpus statistics (N, avgdl, per-term
document frequencies) are ONE hash-less global aggregate producing a
single row that broadcast-joins back. The only data movement in the
whole query is that 1-row broadcast and the final top-k
(TakeOrderedAndProject), so cost is two sequential scans of the corpus
regardless of cluster size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import words

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query ``terms``.

    idf uses the Robertson/Sparck-Jones form with the +1 shift
    (``ln(1 + (N - df + 0.5) / (df + 0.5))``) so scores stay positive
    even for terms present in most docs. Ties break on ascending
    doc_id; scores are rounded to 4 for oracle-hash parity.

    Returns ``(doc_id, score)``.
    """
    terms = list(dict.fromkeys(terms))  # dedupe, keep order
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")

    def _tf(term: str):
        # single-arg lambda: a 2-arg lambda would make F.filter pass
        # (element, index) and clobber the captured term
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    ws = words(F.col("text"))
    tf_cols = [_tf(t).cast("long").alias(f"tf{i}") for i, t in enumerate(terms)]
    per_doc = docs.select(
        "doc_id", F.size(ws).cast("long").alias("dl"), *tf_cols
    )

    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )

    scored = per_doc.join(F.broadcast(stats))
    idf = [
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        for i in range(len(terms))
    ]
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        part = idf[i] * tf * (k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
