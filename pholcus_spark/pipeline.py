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

from pyspark.sql import DataFrame
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
