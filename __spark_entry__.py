"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship image-corpus pipeline (synthesize payloads
from the sf0.001 documents table → Arrow-batched decode → perceptual
hash → near-dup banding → per-format rollup). ``queries`` /
``oracle_sql`` re-export the registry in ``pholcus_spark.queries`` —
one entry per operator family from SURVEY.md §2 plus the
training-data-pipeline ops (dedup / similarity / text / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pholcus_spark import multimodal
from pholcus_spark.queries import QUERIES, _synthetic_images, oracle_sql_map

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: image decode + phash near-dup over sf0.001.

    Exercises the engine's payload path end-to-end: deterministic
    payload synthesis (the sandbox fetch boundary), vectorized decode
    (mapInPandas / Arrow), perceptual hashing, hamming-LSH banding, and
    a JVM-side rollup — the same stages a crawl round runs per batch.
    """
    imgs = _synthetic_images(spark, SF0001)
    meta = multimodal.decode_image_meta(imgs).cache()
    pairs = multimodal.phash_neardup(meta.filter(F.col("decode_ok")))
    dup_ids = (
        pairs.select(F.col("image_a").alias("image_id"))
        .unionByName(pairs.select(F.col("image_b").alias("image_id")))
        .distinct()
        .withColumn("is_neardup", F.lit(True))
    )
    return (
        meta.join(dup_ids, "image_id", "left")
        .withColumn("is_neardup", F.coalesce("is_neardup", F.lit(False)))
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_decoded"),
            F.sum(F.col("is_neardup").cast("long")).alias("n_neardup"),
            F.sum(F.col("n_bytes").cast("long")).alias("total_bytes"),
            F.round(F.avg("mean_lum"), 2).alias("avg_lum"),
            F.min("psnr_db").alias("min_psnr_db"),
        )
        .orderBy("fmt")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every registry query — including the
    multimodal stubs, whose codec-bound columns are recomputed
    driver-side through the same generator+codec path (partial
    oracles in the images_decode_meta mold)."""
    return oracle_sql_map()
