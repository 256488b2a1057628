"""Multimodal-column operators: image / audio / video payloads as
opaque ``binary`` columns with typed metadata.

Spark-side plumbing (schemas, Arrow batching, partitioning) is real and
tested; pixel work uses the self-contained numpy codecs in
``imaging.py``. Steps that need external decoders in production
(real JPEG/video/audio libs, absent in this container) are stubbed
behind a deterministic fake or ``NotImplementedError`` — clearly marked
— with the same UDF signature a real implementation would have.

All operators are ``mapInPandas`` (Arrow-batched, no per-row Python
UDFs). The binary column never shuffles through these stages: decode /
resize / feature-extract are narrow maps, and downstream grouping keys
(phash buckets) are tiny longs.

Reference analog: FileCell binary outputs
(``app/pipeline/collector/data/data.go:48-54``) and the decode surface
(``app/spider/context.go:678-736``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imaging import decode_image, dhash64, encode_image, phash64, psnr

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("mean_lum", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("psnr_db", T.DoubleType(), True),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("bytes", T.BinaryType(), True),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def decode_image_meta(images: DataFrame) -> DataFrame:
    """Decode binary payloads → typed metadata + recomputed phash.

    ``psnr_db`` is the lossy-roundtrip PSNR vs a re-encode (the
    ≥40 dB invariant from BASELINE.json); inf for lossless is reported
    as NULL to keep the column finite-valued.
    """

    def _decode(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt)
                    # PSNR of one further lossy generation; NULL when the
                    # payload is already quantization-stable (jpeg input)
                    rt = decode_image(encode_image(arr, "jpeg"), "jpeg")
                    p = float(psnr(arr, rt))
                    p = None if np.isinf(p) else round(p, 2)
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "w": int(arr.shape[1]),
                            "h": int(arr.shape[0]),
                            "fmt": r.fmt,
                            "n_bytes": len(r.bytes),
                            "phash": phash64(arr),
                            "mean_lum": round(float(arr.mean()), 4),
                            "decode_ok": True,
                            "psnr_db": p,
                        }
                    )
                except (ValueError, NotImplementedError):
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "w": None,
                            "h": None,
                            "fmt": r.fmt,
                            "n_bytes": len(r.bytes) if r.bytes is not None else None,
                            "phash": None,
                            "mean_lum": None,
                            "decode_ok": False,
                            "psnr_db": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _decode, IMAGE_META_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize → re-encode (PNG). Real pixel math; a
    production build would swap in PIL/opencv inside the same UDF."""

    def _resize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_image(bytes(r.bytes), r.fmt)
                yi = (np.arange(out_h) * arr.shape[0] // out_h).clip(
                    0, arr.shape[0] - 1
                )
                xi = (np.arange(out_w) * arr.shape[1] // out_w).clip(
                    0, arr.shape[1] - 1
                )
                small = arr[np.ix_(yi, xi)]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode_image(small, "png"),
                        "w": out_w,
                        "h": out_h,
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


def exact_image_dupes(images: DataFrame) -> DataFrame:
    """Byte-exact image dedup — the cheapest first gate of an image
    corpus pipeline, run before any decode: md5 over the raw payload,
    hash-groupBy keeping the min image_id and the copy count.

    Scale shape: the binary column is hashed in the scan projection and
    immediately dropped, so only (32-byte fp, image_id) ever shuffles —
    at 100 TB of payload the shuffle is a few GB. Map-side partial agg
    collapses same-partition copies first. Returns
    ``(fp, keep_id, n_copies)``.
    """
    return (
        images.select(F.md5(F.col("bytes")).alias("fp"), "image_id")
        .groupBy("fp")
        .agg(
            F.min("image_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def phash_neardup(meta: DataFrame, band_bits: int = 16) -> DataFrame:
    """Near-dup clustering on perceptual hash: band the 64-bit phash
    into 64/band_bits chunks; images sharing any band are candidates
    (hamming-LSH). Group key is a small long — cheap shuffle."""
    n_bands = 64 // band_bits
    bands = []
    for b in range(n_bands):
        key = F.shiftright(F.col("phash"), b * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )
        bands.append(
            meta.select(
                "image_id",
                F.lit(b).cast("int").alias("band_idx"),
                key.cast("long").alias("band_key"),
            )
        )
    all_bands = bands[0]
    for x in bands[1:]:
        all_bands = all_bands.unionByName(x)
    l, r = all_bands.alias("l"), all_bands.alias("r")
    return (
        l.join(
            r,
            [
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_key") == F.col("r.band_key"),
                F.col("l.image_id") < F.col("r.image_id"),
            ],
        )
        .select(
            F.col("l.image_id").alias("image_a"),
            F.col("r.image_id").alias("image_b"),
        )
        .distinct()
    )


def phash_recall_eval(
    hashes: DataFrame, max_hamming: int = 6, band_bits: int = 16
) -> DataFrame:
    """Recall measurement for the hamming-band LSH (the image twin of
    ``ann.recall_at_k``): ground truth is EVERY pair within
    ``max_hamming`` bits by exact all-pairs check — quadratic, so this
    runs on an eval-sized sample, never the corpus — and each true
    pair is flagged ``caught`` when the banding would have surfaced it
    (pigeonhole: guaranteed at hamming < 64/band_bits bits SPREAD
    ACROSS BANDS; this measures the actual distribution, which is the
    number you size band_bits with). Returns
    (image_a, image_b, hamming, caught)."""
    h = hashes.select("image_id", "phash")
    a = h.select(
        F.col("image_id").alias("image_a"), F.col("phash").alias("pa")
    )
    b = h.select(
        F.col("image_id").alias("image_b"), F.col("phash").alias("pb")
    )
    hamming = F.bit_count(
        F.col("pa").bitwiseXOR(F.col("pb"))
    ).cast("int")
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    shares_band = None
    for i in range(n_bands):
        eq = (
            F.shiftright(F.col("pa"), i * band_bits).bitwiseAND(F.lit(mask))
            == F.shiftright(F.col("pb"), i * band_bits).bitwiseAND(
                F.lit(mask)
            )
        )
        shares_band = eq if shares_band is None else (shares_band | eq)
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("image_a") < F.col("image_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            "image_a", "image_b", "hamming", shares_band.alias("caught")
        )
    )


HASHES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("phash", T.LongType(), True),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def perceptual_hashes(images: DataFrame) -> DataFrame:
    """Both hash families per image in one decode pass: DCT phash
    (global spectrum) + difference hash (local gradients). Narrow
    Arrow-batched map — the binary column never shuffles; downstream
    joins see only (id, two longs)."""

    def _hash(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt)
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "phash": phash64(arr),
                            "dhash": dhash64(arr),
                            "decode_ok": True,
                        }
                    )
                except (ValueError, NotImplementedError):
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "phash": None,
                            "dhash": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in HASHES_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _hash, HASHES_SCHEMA
    )


def dual_hash_verified_pairs(
    hashes: DataFrame,
    max_hamming_p: int = 10,
    max_hamming_d: int = 10,
    band_bits: int = 16,
) -> DataFrame:
    """phash-banded candidates verified by BOTH families: hamming(phash)
    AND hamming(dhash) within threshold. Independent failure modes make
    the conjunction far more precise than either hash alone (a flat
    gradient fools dhash, a busy texture fools phash — rarely both).
    Same scale shape as ``phash_verified_pairs``: recall comes from the
    phash bands (one band-key shuffle), the dhash rides along as a
    second long, and both verifies are codegen predicates of the band
    join itself — never all-pairs."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = []
    for b in range(n_bands):
        key = F.shiftright(F.col("phash"), b * band_bits).bitwiseAND(
            F.lit(mask)
        )
        bands.append(
            hashes.select(
                "image_id",
                "phash",
                "dhash",
                F.lit(b).cast("int").alias("band_idx"),
                key.cast("long").alias("band_key"),
            )
        )
    all_bands = bands[0]
    for x in bands[1:]:
        all_bands = all_bands.unionByName(x)
    l, r = all_bands.alias("l"), all_bands.alias("r")
    return (
        l.join(
            r,
            [
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_key") == F.col("r.band_key"),
                F.col("l.image_id") < F.col("r.image_id"),
                F.bit_count(
                    F.col("l.phash").bitwiseXOR(F.col("r.phash"))
                ) <= max_hamming_p,
                F.bit_count(
                    F.col("l.dhash").bitwiseXOR(F.col("r.dhash"))
                ) <= max_hamming_d,
            ],
        )
        .select(
            F.col("l.image_id").alias("image_a"),
            F.col("r.image_id").alias("image_b"),
        )
        .distinct()
    )


def hash_blocklist_filter(
    hashes: DataFrame,
    blocklist: DataFrame,
    max_hamming: int = 6,
    band_bits: int = 16,
) -> DataFrame:
    """Perceptual-hash blocklist gate — the PhotoDNA/MD5-list-shaped
    safety stage every crawled-image corpus runs before training
    (LAION-style curation): drop (flag) any image whose phash is
    within ``max_hamming`` bits of some hash on a curated blocklist.

    Scale shape (the corpus NEVER shuffles):

    - the blocklist is dimension-sized (millions of 64-bit hashes at
      most) — it expands to ``64/band_bits`` band rows per hash and
      BROADCASTS;
    - the corpus side generates its band keys as a map-side
      ``explode`` projection and probes the broadcast (no Exchange);
    - hamming verification is a codegen predicate of the broadcast
      join (``bit_count(xor)``), so false band candidates die in the
      same stage;
    - only VERIFIED matches — a tiny, blocklist-bounded set — pay a
      ``groupBy(image_id)``, and the per-image flags broadcast back
      onto the corpus.

    Recall: the pigeonhole bound guarantees a shared band whenever
    fewer than ``64/band_bits`` bits differ; for the default
    (max_hamming=6, 4×16-bit bands) the measured distribution from
    ``phash_recall_eval`` is the sizing evidence (1.0 on the planted
    corpus). A guaranteed-exact gate at hamming ≤ 7 uses
    ``band_bits=8`` and pays 8× band rows plus denser buckets.

    Returns (image_id, phash, blocked, matched_hash, n_matched);
    ``matched_hash`` is the smallest matching blocklist hash for
    audit, NULL when clean."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1

    def _bands(col: str):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("band_idx"),
                        F.shiftright(F.col(col), i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .cast("long")
                        .alias("band_key"),
                    )
                    for i in range(n_bands)
                ]
            )
        )

    bl = (
        blocklist.select(F.col("phash").alias("bl_phash"))
        .where(F.col("bl_phash").isNotNull())
        .distinct()
    )
    bl_bands = bl.select("bl_phash", _bands("bl_phash").alias("b")).select(
        "bl_phash", "b.band_idx", "b.band_key"
    )
    src = hashes.select("image_id", "phash")
    cand = src.where(F.col("phash").isNotNull()).select(
        "image_id", "phash", _bands("phash").alias("b")
    ).select("image_id", "phash", "b.band_idx", "b.band_key")
    hits = (
        cand.join(F.broadcast(bl_bands), ["band_idx", "band_key"])
        .where(
            F.bit_count(F.col("phash").bitwiseXOR(F.col("bl_phash")))
            <= F.lit(max_hamming)
        )
        .groupBy("image_id")
        .agg(
            F.min("bl_phash").alias("matched_hash"),
            F.countDistinct("bl_phash").alias("n_matched"),
        )
    )
    return src.join(F.broadcast(hits), "image_id", "left").select(
        "image_id",
        "phash",
        F.col("matched_hash").isNotNull().alias("blocked"),
        "matched_hash",
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
    )


def image_stats(meta: DataFrame) -> DataFrame:
    """Image-corpus composition report: fmt × resolution-bucket ROLLUP
    of image counts and total pixels — the image twin of
    ``pipeline.corpus_stats``. One hash aggregate with map-side
    partials over decoded metadata; output is dimension-sized."""
    px = F.col("w") * F.col("h")
    bucket = (
        F.when(px < 1024, F.lit("small"))
        .when(px < 2048, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return (
        meta.filter(F.col("decode_ok"))
        .select("fmt", bucket.alias("px_bucket"), px.cast("long").alias("px"))
        .rollup("fmt", "px_bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("px").alias("sum_px"),
        )
    )


def image_quality_gate(
    meta: DataFrame,
    min_side: int = 32,
    min_px: int = 1200,
    max_aspect_milli: int = 1500,
    min_bytes_per_kpx: int | None = None,
) -> DataFrame:
    """LAION-style image quality gate over decoded metadata: flag and
    drop images that are useless for training — too small on either
    side, too few total pixels, or extreme aspect ratio (a banner/
    sliver that survives no crop). ``max_aspect_milli`` is the aspect
    limit ×1000 held as INTEGER arithmetic (``w·1000 > h·limit``) so
    the gate is bit-exact across engines — no float ratio, no
    rounding rule to dispute.

    ``min_bytes_per_kpx`` (bytes per 1000 pixels) optionally flags
    suspiciously over-compressed payloads (blank or decode-bomb
    candidates); it needs the real byte length, which is codec-
    dependent, so the oracle covers the dimension gates and a unit
    test covers this flag's plumbing.

    All flags are boolean codegen expressions riding the decode scan —
    zero shuffle, zero Python; at 10^10 images this is a map-only
    stage at scan speed, and Catalyst prunes the payload column unless
    the bytes gate is on."""
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    too_small = (w < min_side) | (h < min_side) | (w * h < min_px)
    bad_aspect = (w * 1000 > h * max_aspect_milli) | (
        h * 1000 > w * max_aspect_milli
    )
    out = meta.withColumn("too_small", too_small).withColumn(
        "bad_aspect", bad_aspect
    )
    keep = ~F.col("too_small") & ~F.col("bad_aspect")
    if min_bytes_per_kpx is not None:
        thin = (
            F.octet_length("bytes").cast("long") * 1000
            < w * h * min_bytes_per_kpx
        )
        out = out.withColumn("thin_payload", thin)
        keep = keep & ~F.col("thin_payload")
    return out.withColumn("keep", keep)


def patch_tokens(w: Column, h: Column, patch: int = 14) -> Column:
    """Vision-transformer token cost of an image: ⌈w/patch⌉·⌈h/patch⌉
    (ViT-style patching, 14 px = the CLIP/SigLIP default). Integer
    ceiling division — ``(x + p − 1) div p`` — so the count is exact
    in any engine."""
    pw = F.floor((w.cast("long") + patch - 1) / patch).cast("long")
    ph = F.floor((h.cast("long") + patch - 1) / patch).cast("long")
    return pw * ph


def patch_budget_select(
    meta: DataFrame,
    budget_tokens: int,
    patch: int = 14,
) -> DataFrame:
    """Token-budget selection for an IMAGE corpus: keep the
    highest-resolution images while the running vision-token total
    (``patch_tokens``) stays within budget — the image twin of
    ``pipeline.budget_select``, for sizing a VLM training mix in
    tokens rather than image counts. Order is (tokens DESC, image_id)
    with the inclusive prefix rule (first over-budget image drops).

    Same two-level prefix sum as the text selector: per-token-value
    group totals (bounded by distinct (w,h) geometries — small, since
    dims are bounded), exclusive prefix over that dimension-sized
    relation, broadcast back, residual cumsum per tie group. No task
    ever streams the whole corpus.

    Returns kept rows (image_id, w, h, n_tokens)."""
    d = meta.select(
        "image_id",
        "w",
        "h",
        patch_tokens(F.col("w"), F.col("h"), patch).alias("n_tokens"),
    )
    # the selection reads its input twice (group totals + the residual
    # join); meta usually sits behind the Arrow decode boundary, so
    # materialize the NARROW projection once instead of decoding twice
    # — four small columns, never the payload
    d = d.localCheckpoint(eager=True)
    groups = d.groupBy("n_tokens").agg(
        F.sum("n_tokens").alias("grp_tokens")
    )
    w_grp = (
        Window.orderBy(F.desc("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = groups.select(
        "n_tokens",
        F.coalesce(F.sum("grp_tokens").over(w_grp), F.lit(0)).alias(
            "prefix_tokens"
        ),
    )
    w_in = (
        Window.partitionBy("n_tokens")
        .orderBy("image_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(prefixes), "n_tokens")
        .withColumn(
            "_cum", F.col("prefix_tokens") + F.sum("n_tokens").over(w_in)
        )
        .filter(F.col("_cum") <= budget_tokens)
        .select("image_id", "w", "h", "n_tokens")
    )


ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1), (4, 3), (3, 4), (3, 2), (2, 3), (16, 9), (9, 16),
    (2, 1), (1, 2),
)


def aspect_buckets(
    meta: DataFrame,
    buckets: tuple[tuple[int, int], ...] = ASPECT_BUCKETS,
) -> DataFrame:
    """Aspect-ratio bucketing for image training (the SDXL-style
    bucketed-batching step: group images whose aspect ratios are close
    so a batch can share one crop geometry instead of square-cropping
    everything). Each image goes to the bucket minimizing
    ``|ln(w·hb) − ln(h·wb)|`` (= |log aspect difference|), distance
    rounded to 6 decimals for cross-engine parity, ties broken by the
    lower bucket index.

    A ZERO-SHUFFLE projection: the bucket list is a literal
    struct-array per row and ``array_min`` picks the lexicographic
    (distance, index) minimum inside codegen — at 10^10 images this is
    a map-only pass at scan speed. Downstream batch formation groups by
    ``bucket_idx`` (one dimension-bounded shuffle, not done here).

    Requires (image_id, w, h); returns (image_id, w, h, bucket_idx,
    bucket_w, bucket_h)."""
    cand = F.array(
        *[
            F.struct(
                F.round(
                    F.abs(
                        F.log(F.col("w").cast("double") * F.lit(float(bh)))
                        - F.log(F.col("h").cast("double") * F.lit(float(bw)))
                    ),
                    6,
                ).alias("d"),
                F.lit(i).cast("int").alias("i"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    best = F.array_min(cand)
    bw_arr = F.array(*[F.lit(bw) for bw, _bh in buckets])
    bh_arr = F.array(*[F.lit(bh) for _bw, bh in buckets])
    return meta.select(
        "image_id",
        "w",
        "h",
        best["i"].alias("bucket_idx"),
        F.element_at(bw_arr, best["i"] + 1).alias("bucket_w"),
        F.element_at(bh_arr, best["i"] + 1).alias("bucket_h"),
    )


def bucket_target_dims(
    buckets: tuple[tuple[int, int], ...] = ASPECT_BUCKETS,
    pixel_budget: int = 4096,
    multiple: int = 8,
) -> list[tuple[int, int]]:
    """Per-bucket target box: the bucket's aspect scaled to
    ~``pixel_budget`` pixels, each side rounded to a ``multiple`` (the
    model's patch/latent granularity), floored at one multiple.
    Driver-side integer constants — computed once, baked into the plan
    as literals."""
    out = []
    for bw, bh in buckets:
        tw = ((pixel_budget * bw / bh) ** 0.5 / multiple + 0.5).__floor__()
        th = ((pixel_budget * bh / bw) ** 0.5 / multiple + 0.5).__floor__()
        out.append((max(int(tw), 1) * multiple, max(int(th), 1) * multiple))
    return out


def bucket_geometry(
    assigned: DataFrame,
    buckets: tuple[tuple[int, int], ...] = ASPECT_BUCKETS,
    pixel_budget: int = 4096,
    multiple: int = 8,
) -> DataFrame:
    """Crop geometry for bucketed batching — the second half of the
    SDXL-style pipeline after ``aspect_buckets``: every image in a
    bucket resizes (aspect-preserving, COVER the target box) and
    center-crops to the bucket's target dims, so one batch shares one
    tensor shape. All integer arithmetic (ceil-division scale, floor
    centering), so the oracle reproduces it exactly:

        if target_w·h ≥ target_h·w:   scaled = (target_w, ⌈h·tw/w⌉)
        else:                          scaled = (⌈w·th/h⌉, target_h)
        crop = ((scaled_w − target_w) div 2, (scaled_h − target_h) div 2)

    Zero-shuffle projection over the ``aspect_buckets`` output (needs
    image_id, w, h, bucket_idx). Returns (image_id, bucket_idx,
    target_w, target_h, scaled_w, scaled_h, crop_x, crop_y)."""
    dims = bucket_target_dims(buckets, pixel_budget, multiple)
    tw = F.element_at(
        F.array(*[F.lit(a) for a, _b in dims]), F.col("bucket_idx") + 1
    )
    th = F.element_at(
        F.array(*[F.lit(b) for _a, b in dims]), F.col("bucket_idx") + 1
    )
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    wide = tw * h >= th * w  # width-constrained: scale so width == tw
    sw = F.when(wide, tw).otherwise(
        F.floor((w * th + h - 1) / h).cast("int")
    )
    sh = F.when(wide, F.floor((h * tw + w - 1) / w).cast("int")).otherwise(
        th
    )
    return assigned.select(
        "image_id",
        "bucket_idx",
        tw.cast("int").alias("target_w"),
        th.cast("int").alias("target_h"),
        sw.cast("int").alias("scaled_w"),
        sh.cast("int").alias("scaled_h"),
        F.floor((sw - tw) / 2).cast("int").alias("crop_x"),
        F.floor((sh - th) / 2).cast("int").alias("crop_y"),
    )


def bucket_batches(
    geo: DataFrame,
    batch_size: int = 8,
) -> DataFrame:
    """Batch assembly for bucketed training: images sharing an aspect
    bucket (and therefore one tensor shape, ``bucket_geometry``) are
    grouped into fixed-size batches in deterministic image_id order —
    the last step before a training dataloader reads the corpus.

    One shuffle (window PARTITION BY bucket_idx); at 10^10 images use
    the ``pack_shards`` trick of sub-salting each bucket into
    independent pack groups if a single bucket outgrows one task's
    sort. A batch never mixes buckets, slots are dense from 0, and the
    final partial batch per bucket is kept (the loader drops or pads
    it — a policy choice, not data).

    Input: ``bucket_geometry`` output. Returns (image_id, bucket_idx,
    target_w, target_h, batch_idx, slot)."""
    w = Window.partitionBy("bucket_idx").orderBy("image_id")
    rn = F.row_number().over(w) - 1
    return geo.select(
        "image_id",
        "bucket_idx",
        "target_w",
        "target_h",
        F.floor(rn / batch_size).cast("long").alias("batch_idx"),
        F.pmod(rn, F.lit(batch_size)).cast("int").alias("slot"),
    )


def phash_verified_pairs(
    meta: DataFrame, max_hamming: int = 10, band_bits: int = 16
) -> DataFrame:
    """Two-stage perceptual near-dup — the image analog of
    ``dedup.minhash_verified_pairs``: banded LSH candidates
    (``phash_neardup``) verified by EXACT hamming distance. Banding
    alone over-connects (any shared 16-bit band pairs two images, and
    structured corpora share low-frequency DCT bands heavily); the
    verify stage is O(candidates) — two broadcast-or-shuffle joins on
    image_id plus a codegen ``bit_count(xor)`` — never all-pairs, so
    the shape holds at 10^10 images."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = []
    for b in range(n_bands):
        key = F.shiftright(F.col("phash"), b * band_bits).bitwiseAND(
            F.lit(mask)
        )
        bands.append(
            meta.select(
                "image_id",
                "phash",
                F.lit(b).cast("int").alias("band_idx"),
                key.cast("long").alias("band_key"),
            )
        )
    all_bands = bands[0]
    for x in bands[1:]:
        all_bands = all_bands.unionByName(x)
    # the phash rides along in the band rows, so the hamming verify is
    # a predicate of the band join itself — no join-back, one shuffle
    # pair (band key) + the dedup exchange
    l, r = all_bands.alias("l"), all_bands.alias("r")
    return (
        l.join(
            r,
            [
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_key") == F.col("r.band_key"),
                F.col("l.image_id") < F.col("r.image_id"),
                F.bit_count(
                    F.col("l.phash").bitwiseXOR(F.col("r.phash"))
                ) <= max_hamming,
            ],
        )
        .select(
            F.col("l.image_id").alias("image_a"),
            F.col("r.image_id").alias("image_b"),
        )
        .distinct()
    )


def sample_video_frames(videos: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling over video payloads.

    STUB: real frame extraction needs ffmpeg/pyav (not in this
    container). The deterministic fake emits one synthetic PNG frame
    per ``every_ms`` keyed by (video_id, frame_idx), with the exact
    schema, batching, and timestamp math a real extractor would
    produce. The seed is crc32-based (process-salt-free, unlike
    ``hash()``) and payload-independent so an oracle can recompute
    each frame from the ids alone.
    """
    import zlib

    def _sample(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                dur = int(r.duration_ms)
                seed = zlib.crc32(str(r.video_id).encode("utf-8")) & 0xFFFF
                for i, ts in enumerate(range(0, dur, every_ms)):
                    rng = np.random.Generator(np.random.PCG64(seed + i))
                    frame = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": i,
                            "ts_ms": ts,
                            "bytes": encode_image(frame, "png"),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return videos.select("video_id", "bytes", "duration_ms").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def audio_features(audio: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Audio feature extraction (duration, RMS, zero-crossings) over
    raw 16-bit PCM payloads. PCM math is real numpy; compressed-codec
    decode (mp3/ogg) would be an import-try of soundfile/librosa and
    raises NotImplementedError here when the payload isn't PCM."""

    def _feat(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.bytes or b"")
                if len(data) % 2:
                    data = data[:-1]
                pcm = np.frombuffer(data, dtype="<i2").astype(np.float64)
                if len(pcm) == 0:
                    rows.append(
                        {
                            "audio_id": r.audio_id,
                            "duration_ms": 0,
                            "rms": 0.0,
                            "zero_crossings": 0,
                        }
                    )
                    continue
                rows.append(
                    {
                        "audio_id": r.audio_id,
                        "duration_ms": int(len(pcm) * 1000 // sample_rate),
                        "rms": round(float(np.sqrt(np.mean(pcm**2))), 4),
                        "zero_crossings": int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA])

    return audio.select("audio_id", "bytes").mapInPandas(_feat, AUDIO_FEATURE_SCHEMA)


_PNG_CRITICAL = {b"IHDR", b"PLTE", b"IDAT", b"IEND"}


def _strip_png_bytes(data: bytes) -> tuple[bytes, int, int]:
    """Drop every ancillary PNG chunk (tEXt/zTXt/iTXt/eXIf/tIME/...),
    keeping the critical four. Returns (clean, n_stripped, removed)."""
    out = bytearray(data[:8])
    pos, n, removed = 8, 0, 0
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos:pos + 4], "big")
        tag = bytes(data[pos + 4:pos + 8])
        end = pos + 12 + length
        if tag in _PNG_CRITICAL:
            out += data[pos:end]
        else:
            n += 1
            removed += end - pos
        pos = end
        if tag == b"IEND":
            break
    out += data[pos:]
    return bytes(out), n, removed


def _strip_jpeg_bytes(data: bytes) -> tuple[bytes, int, int]:
    """Drop APPn/COM segments from a real JPEG (EXIF, XMP, comments —
    where GPS coordinates and device serials live). Entropy-coded data
    from SOS onward is copied verbatim."""
    out = bytearray(data[:2])
    pos, n, removed = 2, 0, 0
    while pos + 4 <= len(data) and data[pos] == 0xFF:
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: header + entropy data to the end
            out += data[pos:]
            pos = len(data)
            break
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        end = pos + 2 + seg_len
        if 0xE0 <= marker <= 0xEF or marker == 0xFE:
            n += 1
            removed += end - pos
        else:
            out += data[pos:end]
        pos = end
    out += data[pos:]
    return bytes(out), n, removed


def strip_image_metadata(images: DataFrame) -> DataFrame:
    """Privacy scrub for image payloads — the binary twin of the text
    PII redactor: remove the metadata segments where EXIF GPS
    coordinates, device serials, and authoring comments live, without
    touching a single pixel (PNG ancillary chunks; JPEG APPn/COM
    segments; anything else passes through untouched). Training
    corpora republish crawled images — shipping EXIF GPS is a leak,
    and decoded pixels are byte-identical before/after by
    construction.

    Arrow-batched mapInPandas over (image_id, bytes, fmt) — scales
    like the fetch/decode boundary. Returns the cleaned payload plus
    the audit columns (bytes_before/after, n_stripped)."""
    out_schema = (
        "image_id string, bytes binary, fmt string,"
        " bytes_before long, bytes_after long, n_stripped int"
    )

    def _scrub(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.bytes)
                if data[:8] == b"\x89PNG\r\n\x1a\n":
                    clean, n, _rm = _strip_png_bytes(data)
                elif data[:2] == b"\xff\xd8":
                    clean, n, _rm = _strip_jpeg_bytes(data)
                else:
                    clean, n = data, 0
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": clean,
                        "fmt": r.fmt,
                        "bytes_before": len(data),
                        "bytes_after": len(clean),
                        "n_stripped": n,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "fmt", "bytes_before",
                         "bytes_after", "n_stripped"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _scrub, out_schema
    )


def channel_sums(images: DataFrame) -> DataFrame:
    """Per-image integer channel statistics — the map stage of the
    dataset normalization-constant pass (the mean/std every training
    recipe bakes into its transforms; ImageNet's magic numbers were
    computed exactly this way). uint8 pixels sum EXACTLY in int64
    (a 2^31-pixel image is still < 2^39 per channel), so the stats
    are bit-reproducible and the oracle can verify them with integer
    equality, not float tolerance.

    Arrow-batched mapInPandas over the decode; returns one narrow row
    per image (9 longs) that the map-side partial agg of
    ``channel_stats`` collapses — at 10^10 images the shuffle carries
    a handful of longs per partition."""
    out_schema = (
        "image_id string, n_px long,"
        " s_r long, s_g long, s_b long,"
        " q_r long, q_g long, q_b long, decode_ok boolean"
    )

    def _sums(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt).astype(
                        np.int64
                    )
                    s = arr.sum(axis=(0, 1))
                    q = (arr * arr).sum(axis=(0, 1))
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "n_px": int(arr.shape[0] * arr.shape[1]),
                            "s_r": int(s[0]), "s_g": int(s[1]),
                            "s_b": int(s[2]),
                            "q_r": int(q[0]), "q_g": int(q[1]),
                            "q_b": int(q[2]),
                            "decode_ok": True,
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "image_id": r.image_id, "n_px": 0,
                            "s_r": 0, "s_g": 0, "s_b": 0,
                            "q_r": 0, "q_g": 0, "q_b": 0,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "n_px", "s_r", "s_g", "s_b",
                         "q_r", "q_g", "q_b", "decode_ok"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _sums, out_schema
    )


def channel_stats(images: DataFrame) -> DataFrame:
    """Dataset channel mean/std in 0-1 units — ONE row for the whole
    corpus (the constants that go into the training transform). Sums
    aggregate exactly in int64 (map-side combined); the only floats
    are the final eight divisions, computed identically by any engine
    from the same integers. Population std; round-6.

    Returns (n_images, n_px, mean_r, mean_g, mean_b, std_r, std_g,
    std_b)."""
    s = channel_sums(images).where(F.col("decode_ok"))

    def _mean(c: str) -> Column:
        return F.col(f"s_{c}") / F.col("n_px") / 255.0

    def _std(c: str) -> Column:
        m = F.col(f"s_{c}") / F.col("n_px")
        return F.sqrt(F.col(f"q_{c}") / F.col("n_px") - m * m) / 255.0

    agg = s.agg(
        F.count("*").cast("long").alias("n_images"),
        F.sum("n_px").cast("long").alias("n_px"),
        *[F.sum(f"s_{c}").cast("long").alias(f"s_{c}") for c in "rgb"],
        *[F.sum(f"q_{c}").cast("long").alias(f"q_{c}") for c in "rgb"],
    )
    return agg.select(
        "n_images",
        "n_px",
        *[F.round(_mean(c), 6).alias(f"mean_{c}") for c in "rgb"],
        *[F.round(_std(c), 6).alias(f"std_{c}") for c in "rgb"],
    )


def augment_plan(
    meta: DataFrame,
    epoch: int,
    crop_w: int,
    crop_h: int,
    flip_prob_milli: int = 500,
) -> DataFrame:
    """Deterministic per-epoch augmentation schedule — random crop box
    + horizontal flip as DATA, derived from hash(image_id | epoch)
    instead of an RNG stream. This is what makes distributed training
    reproducible: every executor, rerun, and mid-epoch resume computes
    the identical plan for (image, epoch) with no seed-state to ship
    or replay, and the plan for any epoch can be materialized/audited
    without touching pixels.

    Crop origin draws uniformly over the valid range from independent
    hash digits (x from the low bits, y from a 2^12-shifted window,
    flip from a 2^24-shifted window — one 60-bit portable md5 feeds
    all three); ``valid`` is false when the image is smaller than the
    crop (callers route those to the resize path). Pure codegen
    projection over (image_id, w, h) metadata — zero shuffle, map-only
    at 10^10 images.

    Returns (image_id, epoch, valid, x0, y0, flip)."""
    from .textops import md5_long

    r = md5_long(F.concat(F.col("image_id"), F.lit(f"|{int(epoch)}")))
    span_x = F.col("w") - crop_w + 1
    span_y = F.col("h") - crop_h + 1
    valid = (F.col("w") >= crop_w) & (F.col("h") >= crop_h)
    return meta.select(
        "image_id",
        F.lit(int(epoch)).alias("epoch"),
        valid.alias("valid"),
        F.when(valid, F.pmod(r, span_x).cast("int")).alias("x0"),
        # 2^12 / 2^24 windows via shiftright — exact integer ops (a
        # double division would lose low bits above 2^53)
        F.when(valid, F.pmod(F.shiftright(r, 12), span_y).cast("int"))
        .alias("y0"),
        F.when(
            valid,
            F.pmod(F.shiftright(r, 24), 1000) < flip_prob_milli,
        ).alias("flip"),
    )


def read_exif_orientation(images: DataFrame) -> DataFrame:
    """Attach each image's EXIF orientation tag parsed FROM ITS OWN
    BYTES (``imaging.parse_exif_orientation``: PNG eXIf chunks, real
    JPEG APP1 TIFF streams, both byte orders) — the producer of the
    ``orientation`` column ``normalize_orientation`` consumes, so the
    upright fix needs no external metadata. Unknown/absent/malformed
    EXIF → NULL (the fix passes those through). Arrow-batched
    mapInPandas, payload in/payload out, zero shuffle."""
    out_schema = (
        "image_id string, bytes binary, fmt string, orientation int"
    )

    def _read(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imaging import parse_exif_orientation

        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": bytes(r.bytes),
                        "fmt": r.fmt,
                        "orientation": parse_exif_orientation(
                            bytes(r.bytes)
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "fmt", "orientation"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _read, out_schema
    )


def upright_images(images: DataFrame) -> DataFrame:
    """The composed orientation fix: parse the tag out of the payload
    (``read_exif_orientation``) and upright the pixels
    (``normalize_orientation``) — what an ingest pipeline runs on raw
    crawled images before any geometry-sensitive stage (aspect
    bucketing, crops, augments)."""
    return normalize_orientation(read_exif_orientation(images))


def normalize_orientation(
    images: DataFrame, orientation_col: str = "orientation"
) -> DataFrame:
    """EXIF-orientation normalization — the upright-pixels fix every
    image-training pipeline applies before crops/augments (a rotated
    tensor silently poisons augmentation geometry and any
    position-sensitive model). Rotates/mirrors pixels per the
    orientation tag (``imaging.apply_exif_orientation``, the
    ``ImageOps.exif_transpose`` table) and re-encodes in the source
    format; orientations 5-8 swap w and h. Unknown/absent tags pass
    through untouched (fail open — cameras write garbage).

    The orientation column comes from the metadata-decode stage (real
    EXIF parse on a production corpus; planted deterministically in
    the registry fixture). Arrow-batched ``mapInPandas`` over
    (image_id, bytes, fmt, orientation) — scales like decode/resize;
    no shuffle anywhere.

    Returns (image_id, bytes, fmt, orientation, w, h, transformed)."""
    out_schema = (
        "image_id string, bytes binary, fmt string,"
        " orientation int, w int, h int, transformed boolean"
    )

    def _upright(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imaging import apply_exif_orientation

        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                # Arrow hands NULL ints to pandas as NaN floats;
                # absent tag = identity internally, NULL in the output
                tag = None if pd.isna(r.orientation) else int(
                    r.orientation
                )
                o = tag if tag is not None else 1
                arr = decode_image(bytes(r.bytes), r.fmt)
                changed = 2 <= o <= 8
                if changed:
                    arr = apply_exif_orientation(arr, o)
                    data = encode_image(arr, r.fmt)
                else:
                    data = bytes(r.bytes)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": data,
                        "fmt": r.fmt,
                        "orientation": tag,
                        "w": arr.shape[1],
                        "h": arr.shape[0],
                        "transformed": changed,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "fmt", "orientation",
                         "w", "h", "transformed"],
            )

    return images.select(
        "image_id", "bytes", "fmt",
        F.col(orientation_col).cast("int").alias("orientation"),
    ).mapInPandas(_upright, out_schema)


EMBED_DIM_CELLS = 4  # 4x4 grid x 3 channels = 48-dim


def embed_array(arr: np.ndarray, cells: int = EMBED_DIM_CELLS) -> list:
    """Deterministic stand-in image embedder: cells×cells grid-pooled
    channel means, centered and L2-normalized — the shape and contract
    of a CLIP-image-tower call (a real model drops into the same UDF;
    the plumbing, schema, and downstream ANN composition don't
    change). float64 end-to-end, rounded to 8, so any engine
    recomputes bit-equal values."""
    h, w, _ = arr.shape
    ys = (np.arange(cells + 1) * h) // cells
    xs = (np.arange(cells + 1) * w) // cells
    feats = []
    for i in range(cells):
        for j in range(cells):
            cell = arr[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            feats.extend(cell.reshape(-1, 3).mean(axis=0) / 255.0 - 0.5)
    v = np.asarray(feats, dtype=np.float64)
    n = float(np.sqrt((v * v).sum()))
    if n > 0:
        v = v / n
    return [round(float(x), 8) for x in v]


def embed_images(images: DataFrame) -> DataFrame:
    """images (image_id, bytes, fmt) → (vec_id-compatible) rows
    (image_id, embedding array<double>): the decode+embed boundary
    that feeds the ANN / semantic-dedup / alignment operators — the
    bridge from the crawled image corpus to every embedding-keyed
    stage. Arrow-batched mapInPandas, payload never shuffles."""

    def _embed(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt)
                    emb = embed_array(arr)
                except (ValueError, NotImplementedError):
                    emb = None
                rows.append({"image_id": r.image_id, "embedding": emb})
            yield pd.DataFrame(rows, columns=["image_id", "embedding"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _embed, "image_id string, embedding array<double>"
    )


def sniff_format(data: Column) -> Column:
    """Magic-byte content sniff of a binary payload — entirely
    JVM-side (hex-prefix compares over ``substring``; no Python, no
    decode). A crawl can't trust Content-Type or the URL extension:
    servers hand back error pages with 200 + image/jpeg, CDNs
    transcode without relabeling, and ``.jpg`` URLs serve PNGs. The
    byte signatures are the ground truth browsers use (WHATWG MIME
    sniffing §6), so this is the gate between fetch and decode.

    Recognized: PNG, JPEG/JFIF (plus the sandbox's PHLJ lossy
    stand-in, reported as ``jpeg``), GIF87a/89a, RIFF/WEBP, BMP, and
    markup ('<' after optional whitespace → ``html``, the classic
    error-page-saved-as-image). Anything else is ``unknown``."""
    hx = F.hex(F.substring(data, 1, 12))
    # WHATWG sniffing skips \t \n \x0C \r and space before markup;
    # ltrim would strip spaces only
    head = F.substring(data, 1, 64).cast("string")
    is_markup = head.rlike("^[ \\t\\r\\n\\x0c]*<")
    return (
        F.when(hx.startswith("89504E470D0A1A0A"), F.lit("png"))
        .when(hx.startswith("FFD8FF"), F.lit("jpeg"))
        .when(hx.startswith("50484C4A"), F.lit("jpeg"))  # PHLJ
        .when(hx.startswith("47494638"), F.lit("gif"))
        .when(
            (F.substring(hx, 1, 8) == "52494646")
            & (F.substring(hx, 17, 8) == "57454250"),
            F.lit("webp"),
        )
        .when(hx.startswith("424D"), F.lit("bmp"))
        .when(is_markup, F.lit("html"))
        .otherwise(F.lit("unknown"))
    )


def sniff_mismatch(images: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """Payload-vs-label triage: sniff every payload's real format from
    its bytes and compare with the declared ``fmt`` column. Routing
    follows the trust-the-bytes rule: non-image payloads (``html`` /
    ``unknown``) are ``drop`` rows regardless of label; a real image
    format that contradicts the label is ``relabel`` (the decode stage
    uses the sniffed codec); agreement is ``keep``. A zero-shuffle
    projection over the scan — at 10^10 payloads this adds nothing to
    the fetch stage's cost, and it prunes doomed rows BEFORE the
    Arrow-batched decode spends Python time on them."""
    sniffed = sniff_format(F.col("bytes"))
    out = images.withColumn("sniffed_fmt", sniffed).withColumn(
        "is_mismatch", F.col("sniffed_fmt") != F.col(fmt_col)
    )
    return out.withColumn(
        "action",
        F.when(F.col("sniffed_fmt").isin("html", "unknown"), F.lit("drop"))
        .when(F.col("is_mismatch"), F.lit("relabel"))
        .otherwise(F.lit("keep")),
    )


def dihedral_hashes(images: DataFrame) -> DataFrame:
    """(image_id, rphash): the D4-orbit-canonical perceptual hash per
    payload (imaging.dihedral_phash64) — Arrow-batched decode +
    8-orientation hash, the stage that makes rotated/mirrored image
    re-posts EXACT duplicates under a plain group-by. Costs 8 DCTs
    per image at decode time to save a hamming-LSH join later; rows
    that fail to decode are dropped (the sniff gate runs first)."""

    def _hash(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imaging import decode_image, dihedral_phash64

        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt)
                except (ValueError, NotImplementedError):
                    continue
                rows.append(
                    {
                        "image_id": r.image_id,
                        "rphash": dihedral_phash64(arr),
                    }
                )
            yield pd.DataFrame(rows, columns=["image_id", "rphash"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _hash, "image_id string, rphash long"
    )


def detect_letterbox(images: DataFrame) -> DataFrame:
    """Per-image letterbox bars + crop plan (imaging.detect_borders):
    (image_id, top, bottom, left, right, crop_w, crop_h). Bars that
    consume the whole image (solid frames) report a degenerate 0×0
    crop the quality gate then drops. Arrow-batched decode map, zero
    shuffle — runs beside the other decode-stage columns."""

    def _detect(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imaging import decode_image, detect_borders

        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt)
                except (ValueError, NotImplementedError):
                    continue
                t, b, le, ri = detect_borders(arr)
                h, w = arr.shape[0], arr.shape[1]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "top": t,
                        "bottom": b,
                        "left": le,
                        "right": ri,
                        "crop_w": max(0, w - le - ri),
                        "crop_h": max(0, h - t - b),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "top", "bottom", "left", "right",
                    "crop_w", "crop_h",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _detect,
        "image_id string, top int, bottom int, left int, right int,"
        " crop_w int, crop_h int",
    )


def entropy_gate(images: DataFrame, min_bits: float = 3.0) -> DataFrame:
    """Per-image grayscale-histogram entropy + keep flag
    (imaging.pixel_entropy): the solid/flat-image junk gate that
    dimension checks can't catch (a 1024×1024 solid white JPEG has
    perfect geometry). Arrow-batched decode map, zero shuffle;
    composes with image_quality_gate before dedup."""

    def _ent(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .imaging import decode_image, pixel_entropy

        for pdf in pdf_iter:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = decode_image(bytes(r.bytes), r.fmt)
                except (ValueError, NotImplementedError):
                    continue
                e = pixel_entropy(arr)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "entropy_bits": e,
                        "keep": e >= min_bits,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "entropy_bits", "keep"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _ent, "image_id string, entropy_bits double, keep boolean"
    )
