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
