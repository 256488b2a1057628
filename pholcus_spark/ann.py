"""Similarity search over the ``embeddings`` table (array<float>).

Brute-force cosine top-k as the correctness baseline, a
random-hyperplane LSH-bucketed variant as the scale path, and
embedding-cosine near-dup pairs.

Spark-first shape:
- the query side is tiny → ``broadcast`` cross join, so the scan side
  never shuffles;
- dot products are ``F.zip_with`` + ``F.aggregate`` fold — JVM-side,
  position-ordered (deterministic float sum, matching the oracle's
  list_transform/list_sum order);
- the LSH variant shuffles once on the bucket id (hamming-style
  signature of hyperplane signs), turning the O(N·Q) scan into
  O(N/2^b · Q) per bucket — the IVF-style pruning a 100 TB corpus
  needs. Hyperplane components are ±1 derived from md5 parity so the
  oracle reproduces buckets exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def plane_sign(plane: int, pos: Column) -> Column:
    """Deterministic ±1 hyperplane component from md5 parity of
    (plane, position) — portable to the oracle."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(",", F.lit(str(plane)), pos)), 1, 15),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def bucket_id(vec: Column, n_planes: int = N_PLANES) -> Column:
    """LSH bucket: bit b = [dot(vec, hyperplane_b) > 0]."""
    def _weigh(b: int):
        # closure factory: a default-arg lambda would change the UDF's
        # visible arity and break F.transform's 2-arg dispatch
        return lambda v, i: v.cast("double") * plane_sign(b, i.cast("string"))

    acc = F.lit(0)
    for b in range(n_planes):
        # dot with ±1 plane = signed sum of components
        proj = F.aggregate(
            F.transform(vec, _weigh(b)), F.lit(0.0), lambda a, v: a + v
        )
        acc = acc + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return acc.cast("int")


def brute_force_topk(embeds: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries (broadcast) ×
    full corpus; rank per query by (cosine desc, vec_id)."""
    q = embeds.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pairs = embeds.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qvec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def lsh_bucketed_topk(
    embeds: DataFrame, n_queries: int = 10, k: int = 3, n_planes: int = N_PLANES
) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket, then exact
    cosine rank within the bucket. One shuffle on bucket id."""
    with_bucket = embeds.withColumn(
        "bucket", bucket_id(F.col("embedding"), n_planes)
    )
    q = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = with_bucket.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("bucket") == F.col("qbucket")),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qvec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_neardup_pairs(
    embeds: DataFrame, threshold: float = 0.95, n_planes: int = N_PLANES
) -> DataFrame:
    """Embedding-cosine near-dup: pairs above threshold, blocked by LSH
    bucket (near-identical vectors land in the same bucket with high
    probability; all-pairs is avoided)."""
    with_bucket = embeds.withColumn(
        "bucket", bucket_id(F.col("embedding"), n_planes)
    )
    l, r = with_bucket.alias("l"), with_bucket.alias("r")
    sim = F.round(cosine(F.col("l.embedding"), F.col("r.embedding")), 4)
    return (
        l.join(
            r,
            [
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.vec_id") < F.col("r.vec_id"),
            ],
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
