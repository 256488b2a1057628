"""Codec + phash invariants (BASELINE.json input_hint: decoded-pixel
allclose, PSNR >= 40 dB for lossy formats)."""

import numpy as np
import pytest

from pholcus_spark.imaging import (
    decode_image,
    decode_png,
    encode_image,
    encode_lossy,
    encode_png,
    hamming64,
    phash64,
    psnr,
)
from pholcus_spark.synthetic import image_for


def _rand_img(seed, h=40, w=56):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_png_roundtrip_lossless():
    for seed in range(5):
        arr = _rand_img(seed, 24 + seed, 31 + seed)
        assert (decode_png(encode_png(arr)) == arr).all()


def test_lossy_psnr_above_40db():
    for seed in range(5):
        arr = _rand_img(seed)
        back = decode_image(encode_lossy(arr), "jpeg")
        assert psnr(arr, back) >= 40.0
        assert np.allclose(arr, back, atol=4)


def test_phash_stable_under_lossy():
    for seed in range(5):
        arr, _ = image_for(f"http://h000.example.com/p/{seed}")
        back = decode_image(encode_lossy(arr), "jpeg")
        assert hamming64(phash64(arr), phash64(back)) <= 8


def test_phash_differs_across_images():
    a, _ = image_for("http://h000.example.com/p/1")
    b, _ = image_for("http://h001.example.com/q/2")
    assert hamming64(phash64(a), phash64(b)) >= 12


def test_encode_image_dispatch():
    arr = _rand_img(7)
    assert decode_image(encode_image(arr, "png"), "png").shape == arr.shape
    with pytest.raises(ValueError):
        encode_image(arr, "gif")


def test_psnr_identity_inf():
    arr = _rand_img(3)
    assert psnr(arr, arr) == float("inf")


def test_exact_image_dupes_groups_by_bytes(spark):
    """exact_image_dupes: identical payloads group regardless of id or
    fmt metadata; distinct payloads never merge; keep_id is the lexical
    min of the group."""
    from pholcus_spark import multimodal

    rows = [
        ("img-b", bytearray(b"\x89PNGpayload1"), "png"),
        ("img-a", bytearray(b"\x89PNGpayload1"), "png"),
        ("img-c", bytearray(b"\x89PNGpayload1"), "jpeg"),  # fmt ignored
        ("img-d", bytearray(b"\x89PNGpayload2"), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {
        r["keep_id"]: r["n_copies"]
        for r in multimodal.exact_image_dupes(df).collect()
    }
    assert got == {"img-a": 3, "img-d": 1}


def test_dhash_stable_under_lossy():
    from pholcus_spark.imaging import dhash64

    for seed in range(5):
        arr, _ = image_for(f"http://h000.example.com/p/{seed}")
        back = decode_image(encode_lossy(arr), "jpeg")
        assert hamming64(dhash64(arr), dhash64(back)) <= 8


def test_dhash_differs_across_images():
    from pholcus_spark.imaging import dhash64

    a, _ = image_for("http://h000.example.com/p/1")
    b, _ = image_for("http://h001.example.com/q/2")
    assert hamming64(dhash64(a), dhash64(b)) >= 12


def test_neardup_generator_plants_close_pairs():
    from pholcus_spark.imaging import dhash64
    from pholcus_spark.synthetic import neardup_image_for_doc

    for d in (1, 6, 11):
        a, fa = neardup_image_for_doc(d - 1)
        b, fb = neardup_image_for_doc(d)
        assert fa == fb and a.shape == b.shape
        assert not np.array_equal(a, b)  # near-dup, not exact dup
        assert hamming64(phash64(a), phash64(b)) <= 4
        assert hamming64(dhash64(a), dhash64(b)) <= 4


def test_dual_hash_verified_pairs_conjunction(spark):
    """A pair close in phash but far in dhash must NOT survive."""
    from pholcus_spark import multimodal

    rows = [
        ("a", 0x0F0F0F0F0F0F0F0F, 0x0000000000000000),
        ("b", 0x0F0F0F0F0F0F0F0E, 0xFFFFFFFFFFFFFFF0 - (1 << 63)),  # dhash far
        ("c", 0x0F0F0F0F0F0F0F0D, 0x0000000000000003),  # both close to a
    ]
    hashes = spark.createDataFrame(
        [(i, p, d, True) for i, p, d in rows],
        "image_id string, phash long, dhash long, decode_ok boolean",
    )
    got = {
        (r["image_a"], r["image_b"])
        for r in multimodal.dual_hash_verified_pairs(
            hashes, max_hamming_p=10, max_hamming_d=10
        ).collect()
    }
    assert got == {("a", "c")}


def test_aspect_buckets_argmin_and_tiebreak(spark):
    """Known assignments land in the expected buckets; an exact
    distance tie (duplicate bucket entries) resolves to the LOWER
    bucket index; output carries the bucket's target dims."""
    from pholcus_spark import multimodal

    meta = spark.createDataFrame(
        [("sq", 100, 100), ("wide", 160, 90), ("tall", 90, 160),
         ("landscape", 150, 100)],
        "image_id string, w int, h int",
    )
    rows = {r["image_id"]: r
            for r in multimodal.aspect_buckets(meta).collect()}
    assert (rows["sq"]["bucket_w"], rows["sq"]["bucket_h"]) == (1, 1)
    assert (rows["wide"]["bucket_w"], rows["wide"]["bucket_h"]) == (16, 9)
    assert (rows["tall"]["bucket_w"], rows["tall"]["bucket_h"]) == (9, 16)
    assert (rows["landscape"]["bucket_w"],
            rows["landscape"]["bucket_h"]) == (3, 2)

    dup = ((1, 1), (1, 1), (2, 1))
    tied = multimodal.aspect_buckets(
        meta.filter("image_id = 'sq'"), buckets=dup
    ).collect()[0]
    assert tied["bucket_idx"] == 0


def test_bucket_geometry_cover_and_center(spark):
    """The scaled image always COVERS the target box (scaled ≥ target on
    both sides), the constrained side equals the target exactly, and
    the crop is centered with the leftover split floor/ceil."""
    from pholcus_spark import multimodal

    meta = spark.createDataFrame(
        [("a", 100, 100), ("b", 160, 90), ("c", 37, 61)],
        "image_id string, w int, h int",
    )
    assigned = multimodal.aspect_buckets(meta)
    rows = {r["image_id"]: r
            for r in multimodal.bucket_geometry(assigned).collect()}
    for r in rows.values():
        assert r["scaled_w"] >= r["target_w"]
        assert r["scaled_h"] >= r["target_h"]
        assert (r["scaled_w"] == r["target_w"]
                or r["scaled_h"] == r["target_h"])
        assert r["crop_x"] == (r["scaled_w"] - r["target_w"]) // 2
        assert r["crop_y"] == (r["scaled_h"] - r["target_h"]) // 2
        # target dims honor the multiple-of-8 granularity
        assert r["target_w"] % 8 == 0 and r["target_h"] % 8 == 0
    # square image into the square bucket: no crop at all
    a = rows["a"]
    assert (a["scaled_w"], a["scaled_h"]) == (a["target_w"], a["target_h"])
    assert a["crop_x"] == 0 and a["crop_y"] == 0


def test_bucket_batches_dense_and_unmixed(spark):
    """Slots are dense 0..batch_size-1 in image_id order, batches never
    mix buckets, batch_idx is contiguous from 0 per bucket, and only
    the LAST batch of a bucket may be partial."""
    from pholcus_spark import multimodal

    meta = spark.createDataFrame(
        [(f"img{i:03d}", 100 + (i % 3), 100) for i in range(20)],
        "image_id string, w int, h int",
    )
    geo = multimodal.bucket_geometry(multimodal.aspect_buckets(meta))
    rows = multimodal.bucket_batches(geo, batch_size=4).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket_idx"], []).append(r)
    assert len(rows) == 20
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["image_id"])
        # dense slots/batches in id order
        for i, r in enumerate(rs):
            assert r["batch_idx"] == i // 4 and r["slot"] == i % 4
        # at most one partial batch, and it is the last one
        sizes = {}
        for r in rs:
            sizes[r["batch_idx"]] = sizes.get(r["batch_idx"], 0) + 1
        full = sorted(sizes)
        assert all(sizes[i] == 4 for i in full[:-1])


def test_image_quality_gate_flags(spark):
    """Dimension gates + the codec-dependent bytes-per-kilopixel flag
    (the flag the oracle can't predict — exercised here instead)."""
    from pholcus_spark import multimodal

    rows = [
        # (id, w, h, n_bytes): healthy / tiny side / sliver / thin payload
        ("ok", 64, 48, 64 * 48 * 2),
        ("tiny", 16, 64, 16 * 64 * 2),
        ("sliver", 90, 30, 90 * 30 * 2),
        ("thin", 64, 64, 100),
    ]
    meta = spark.createDataFrame(
        [(i, w, h, b"x" * n, "png", True) for i, w, h, n in rows],
        "image_id string, w int, h int, bytes binary, fmt string, decode_ok boolean",
    )
    out = {
        r["image_id"]: r
        for r in multimodal.image_quality_gate(
            meta, min_bytes_per_kpx=500
        ).collect()
    }
    assert out["ok"]["keep"] and not out["ok"]["thin_payload"]
    assert out["tiny"]["too_small"] and not out["tiny"]["keep"]
    assert out["sliver"]["bad_aspect"] and not out["sliver"]["keep"]
    assert out["thin"]["thin_payload"] and not out["thin"]["keep"]
    # without the bytes gate the thin payload passes on dimensions
    out2 = {
        r["image_id"]: r
        for r in multimodal.image_quality_gate(meta).collect()
    }
    assert out2["thin"]["keep"]


def test_strip_image_metadata_pixels_and_jpeg(spark):
    """Pixels are byte-identical after the scrub (decode equality);
    real-JPEG APPn/COM segments are removed, entropy data kept."""
    import struct
    import zlib

    import numpy as np

    from pholcus_spark import multimodal
    from pholcus_spark.imaging import decode_png, encode_png

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 255, (12, 9, 3), dtype=np.uint8)
    png = encode_png(arr)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr_end = 8 + 12 + 13
    dirty_png = (png[:ihdr_end] + chunk(b"tEXt", b"Author\x00gps")
                 + chunk(b"tIME", b"\x00" * 7) + png[ihdr_end:])
    # minimal real-JPEG skeleton: SOI, APP1(EXIF), COM, DQT, SOS+data
    app1 = b"\xff\xe1" + struct.pack(">H", 11) + b"Exif\x00\x00gps"
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"note"
    dqt = b"\xff\xdb" + struct.pack(">H", 5) + b"qqq"
    sos = b"\xff\xda" + struct.pack(">H", 4) + b"hh" + b"ENTROPY\xff\xd9"
    jpeg = b"\xff\xd8" + app1 + com + dqt + sos
    df = spark.createDataFrame(
        [("p", dirty_png, "png"), ("j", jpeg, "jpeg"),
         ("o", b"notanimage", "bin")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r
           for r in multimodal.strip_image_metadata(df).collect()}
    p = got["p"]
    assert p["n_stripped"] == 2
    assert bytes(p["bytes"]) == png  # ancillary gone, stream identical
    assert (decode_png(bytes(p["bytes"])) == arr).all()
    j = got["j"]
    assert j["n_stripped"] == 2  # APP1 + COM
    assert bytes(j["bytes"]) == b"\xff\xd8" + dqt + sos
    assert got["o"]["n_stripped"] == 0
    assert bytes(got["o"]["bytes"]) == b"notanimage"


def test_hash_blocklist_filter_matrix(spark):
    """Verify predicate, banding recall boundary, multi-match audit,
    and NULL-phash pass-through of multimodal.hash_blocklist_filter."""
    from pholcus_spark import multimodal

    H = 0x0123456789ABCDEF
    rows = [
        # exact hit: hamming 0 to H, 1 to H^1 -> matches BOTH entries
        ("exact", H),
        # 2 bits flipped inside band 0: bands 1-3 still match, verified
        ("near2", H ^ 0b11),
        # 8 bits flipped, all inside band 0: candidate via bands 1-3
        # but hamming 8 (7 vs the H^1 entry) > 6 -> verify must reject
        ("far8", H ^ 0xFF),
        # hamming 5 spread so EVERY band differs (2/1/1/1): inside the
        # hamming budget but invisible to 4x16 banding -> not blocked
        # (the documented LSH recall boundary phash_recall_eval sizes)
        ("spread5", H ^ ((0b11 << 0) | (1 << 16) | (1 << 32) | (1 << 48))),
        # undecodable image: phash NULL rides through unblocked
        ("nohash", None),
    ]
    hashes = spark.createDataFrame(rows, "image_id string, phash long")
    bl = spark.createDataFrame([(H,), (H ^ 1,), (None,)], "phash long")
    got = {
        r["image_id"]: r
        for r in multimodal.hash_blocklist_filter(hashes, bl).collect()
    }
    assert len(got) == 5
    assert got["exact"]["blocked"] and got["exact"]["n_matched"] == 2
    assert got["exact"]["matched_hash"] == min(H, H ^ 1)
    assert got["near2"]["blocked"] and got["near2"]["n_matched"] == 2
    assert not got["far8"]["blocked"]
    assert got["far8"]["matched_hash"] is None
    assert not got["spread5"]["blocked"]
    assert not got["nohash"]["blocked"]
    assert got["nohash"]["n_matched"] == 0


def test_normalize_orientation_uprights_all_eight_tags(spark):
    """For every EXIF tag 1-8: store the camera-rotated pixels (the
    FORWARD rotation, i.e. the inverse of the fix), normalize, and the
    decoded output must equal the upright original byte-for-byte (PNG
    is lossless). 5-8 swap w/h; tag 1 and unknown tags pass the
    payload through untouched."""
    import numpy as np

    from pholcus_spark.imaging import (
        apply_exif_orientation,
        decode_png,
        encode_png,
    )
    from pholcus_spark.multimodal import normalize_orientation

    rng = np.random.default_rng(3)
    upright = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6, 99: 1}
    rows = [
        (f"o{o}", bytearray(
            encode_png(apply_exif_orientation(upright, inverse[o]))
        ), "png", o)
        for o in (1, 2, 3, 4, 5, 6, 7, 8, 99)
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, orientation int"
    )
    got = {r["image_id"]: r for r in normalize_orientation(df).collect()}
    for o in range(1, 9):
        r = got[f"o{o}"]
        assert (r["w"], r["h"]) == (9, 6), o
        assert np.array_equal(decode_png(bytes(r["bytes"])), upright), o
        assert r["transformed"] == (o >= 2)
    # unknown tag: untouched payload, original (stored) dims
    r99 = got["o99"]
    assert not r99["transformed"]
    assert bytes(r99["bytes"]) == bytes(rows[-1][1])


def test_augment_plan_deterministic_bounded_epoch_varying(spark):
    """The augmentation schedule must be (a) bit-identical across
    reruns, (b) inside the valid crop range for every image, (c)
    different across epochs for at least some images, and (d) invalid
    for images smaller than the crop."""
    from pholcus_spark.multimodal import augment_plan

    rows = [(f"img-{i}", 32 + i % 20, 40 + i % 9) for i in range(60)]
    rows.append(("tiny", 16, 64))
    meta = spark.createDataFrame(rows, "image_id string, w int, h int")

    e1 = {r["image_id"]: r for r in
          augment_plan(meta, epoch=1, crop_w=32, crop_h=32).collect()}
    e1_again = {r["image_id"]: r for r in
                augment_plan(meta, epoch=1, crop_w=32, crop_h=32).collect()}
    e2 = {r["image_id"]: r for r in
          augment_plan(meta, epoch=2, crop_w=32, crop_h=32).collect()}
    assert e1 == e1_again
    dims = {r[0]: (r[1], r[2]) for r in rows}
    for k, r in e1.items():
        if k == "tiny":
            assert not r["valid"] and r["x0"] is None and r["flip"] is None
            continue
        w, h = dims[k]
        assert r["valid"]
        assert 0 <= r["x0"] <= w - 32 and 0 <= r["y0"] <= h - 32
        assert r["flip"] in (True, False)
    diff = [k for k in e1 if k != "tiny"
            and (e1[k]["x0"], e1[k]["y0"], e1[k]["flip"])
            != (e2[k]["x0"], e2[k]["y0"], e2[k]["flip"])]
    assert len(diff) > 30  # epochs decorrelate almost everywhere
    flips = sum(1 for k, r in e1.items() if k != "tiny" and r["flip"])
    assert 10 <= flips <= 50  # ~half flip at 500/1000


def test_channel_stats_exact_on_known_pixels(spark):
    """Hand-checkable constants: a pure-red and a pure-blue image of
    equal size give mean_r = mean_b = 0.5, mean_g = 0, and
    std_r = std_b = 0.5 (population, 0-1 units); an undecodable row
    is excluded but doesn't poison the aggregate."""
    import numpy as np

    from pholcus_spark.imaging import encode_png
    from pholcus_spark.multimodal import channel_stats

    red = np.zeros((4, 5, 3), np.uint8); red[:, :, 0] = 255
    blue = np.zeros((4, 5, 3), np.uint8); blue[:, :, 2] = 255
    rows = [
        ("red", bytearray(encode_png(red)), "png"),
        ("blue", bytearray(encode_png(blue)), "png"),
        ("junk", bytearray(b"not an image"), "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string"
    )
    r = channel_stats(df).collect()[0]
    assert (r["n_images"], r["n_px"]) == (2, 40)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (0.5, 0.0, 0.5)
    assert (r["std_r"], r["std_g"], r["std_b"]) == (0.5, 0.0, 0.5)


def test_exif_orientation_parse_png_and_jpeg(spark):
    """parse_exif_orientation reads the tag out of PNG eXIf chunks and
    real-JPEG APP1 segments in both byte orders; upright_images then
    fixes pixels with NO side column. Malformed TIFF, missing tag,
    and PHLJ payloads give NULL and pass through byte-identical."""
    import struct
    import zlib

    import numpy as np

    from pholcus_spark.imaging import (
        apply_exif_orientation,
        decode_png,
        encode_png,
        exif_orientation_blob,
        parse_exif_orientation,
    )
    from pholcus_spark.multimodal import upright_images

    def png_with_exif(arr, blob):
        data = encode_png(arr)
        chunk = (
            struct.pack(">I", len(blob)) + b"eXIf" + blob
            + struct.pack(">I", zlib.crc32(b"eXIf" + blob) & 0xFFFFFFFF)
        )
        return data[:33] + chunk + data[33:]

    up = np.arange(6 * 9 * 3, dtype=np.uint8).reshape(6, 9, 3)
    stored6 = apply_exif_orientation(up, 8)  # inverse of tag 6
    png6 = png_with_exif(stored6, exif_orientation_blob(6, True))
    # real-JPEG framing: SOI + APP1(Exif) + bogus-but-walkable tail
    tiff = exif_orientation_blob(3, False)
    app1 = b"Exif\x00\x00" + tiff
    jpeg3 = (b"\xff\xd8\xff\xe1"
             + struct.pack(">H", len(app1) + 2) + app1
             + b"\xff\xda\x00\x02")
    assert parse_exif_orientation(png6) == 6
    assert parse_exif_orientation(jpeg3) == 3
    assert parse_exif_orientation(b"PHLJ1234") is None
    assert parse_exif_orientation(png_with_exif(up, b"XX")) is None

    df = spark.createDataFrame(
        [("a", bytearray(png6), "png"),
         ("plain", bytearray(encode_png(up)), "png")],
        "image_id string, bytes binary, fmt string",
    )
    got = {r["image_id"]: r for r in upright_images(df).collect()}
    a = got["a"]
    assert a["orientation"] == 6 and a["transformed"]
    assert np.array_equal(decode_png(bytes(a["bytes"])), up)
    p = got["plain"]
    assert p["orientation"] is None and not p["transformed"]
    assert bytes(p["bytes"]) == bytes(encode_png(up))


def test_sniff_format_signature_table(spark):
    from pyspark.sql import functions as F

    from pholcus_spark import multimodal, synthetic
    from pholcus_spark.imaging import encode_image

    arr, _ = synthetic.image_for_doc(7)
    cases = [
        ("png", encode_image(arr, "png")),
        ("phlj", encode_image(arr, "jpeg")),
        ("jfif", b"\xff\xd8\xff\xe0" + b"\x00" * 16),
        ("gif", b"GIF89a" + b"\x00" * 8),
        ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 "),
        ("bmp", b"BM" + b"\x00" * 12),
        ("html", b"  \n <!DOCTYPE html><html></html>"),
        ("junk", b"\x00\x01\x02 nothing recognizable"),
        # RIFF without the WEBP fourcc (a .wav) must NOT sniff as webp
        ("wav", b"RIFF\x10\x00\x00\x00WAVEfmt "),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in cases], "k string, bytes binary"
    )
    got = {
        r["k"]: r["s"]
        for r in df.select(
            "k", multimodal.sniff_format(F.col("bytes")).alias("s")
        ).collect()
    }
    assert got["png"] == "png" and got["phlj"] == "jpeg"
    assert got["jfif"] == "jpeg" and got["gif"] == "gif"
    assert got["webp"] == "webp" and got["bmp"] == "bmp"
    assert got["html"] == "html"
    assert got["junk"] == "unknown" and got["wav"] == "unknown"


def test_dihedral_phash_invariant_under_all_orientations():
    from pholcus_spark.imaging import (
        apply_exif_orientation,
        dihedral_phash64,
        phash64,
    )
    from pholcus_spark.synthetic import image_for_doc

    arr, _ = image_for_doc(42)
    base = dihedral_phash64(arr)
    plain = phash64(arr)
    changed_plain = 0
    for o in range(2, 9):
        rot = apply_exif_orientation(arr, o)
        # the invariant hash is IDENTICAL across the whole D4 orbit
        assert dihedral_phash64(rot) == base
        if phash64(rot) != plain:
            changed_plain += 1
    # ...while the plain phash moves for most orientations (else the
    # invariant would be vacuous on this image)
    assert changed_plain >= 5


def test_detect_borders_bars_tolerance_and_solid():
    from pholcus_spark.imaging import detect_borders

    inner = np.full((10, 12, 3), 200, dtype=np.uint8)
    framed = np.zeros((10 + 3 + 1, 12 + 2 + 4, 3), dtype=np.uint8)
    framed[3:13, 2:14] = inner
    assert detect_borders(framed) == (3, 1, 2, 4)
    # near-black bars within tolerance still count
    noisy = framed.copy()
    noisy[0] = 2
    assert detect_borders(noisy)[0] == 3
    # a bright uniform edge is NOT a letterbox bar
    bright = np.full((8, 8, 3), 255, dtype=np.uint8)
    assert detect_borders(bright) == (0, 0, 0, 0)
    # solid black frame: bars consume everything
    solid = np.zeros((6, 6, 3), dtype=np.uint8)
    t, b, le, ri = detect_borders(solid)
    assert t == 6 and le == 6


def test_pixel_entropy_solid_checker_and_noise():
    from pholcus_spark.imaging import pixel_entropy
    from pholcus_spark.synthetic import image_for_doc

    solid = np.full((32, 32, 3), 77, dtype=np.uint8)
    assert pixel_entropy(solid) == 0.0
    checker = np.full((32, 32, 3), 40, dtype=np.uint8)
    checker[::2, ::2] = 200
    # two gray levels at 1/4 and 3/4 -> H(0.25) ≈ 0.8113 bits
    assert abs(pixel_entropy(checker) - 0.8113) < 0.001
    real, _ = image_for_doc(3)
    assert pixel_entropy(real) > 4.0


def test_orbit_elect_keeps_largest_payload(spark):
    from pholcus_spark.queries import q_images_orbit_elect

    df = q_images_orbit_elect(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    by_orbit = {}
    for r in rows:
        by_orbit.setdefault(r["rphash"], []).append(r)
    multi = [g for g in by_orbit.values() if len(g) > 1]
    assert multi  # the planted rotated twins exist at sf0.001 too
    for g in multi:
        kept = [r for r in g if r["is_kept"]]
        assert len(kept) == 1
        # the kept member has the max (n_bytes, image_id)
        best = max(g, key=lambda r: (r["n_bytes"], r["image_id"]))
        assert kept[0]["image_id"] == best["image_id"]
        assert all(r["keep_id"] == best["image_id"] for r in g)
