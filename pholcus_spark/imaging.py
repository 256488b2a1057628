"""Image payload codecs + perceptual hash — pure numpy/zlib (no PIL in
this container, so the codecs are self-contained and deterministic).

Covers the D3/D4 decode surface for the image workload (reference
analog: charset detect + transcode ``app/spider/context.go:678-736``
and lazy DOM parse ``context.go:612-627`` — for image+caption work
items, "decode" is pixel decode and "parse" is phash + caption).

Formats:
- ``png``  — real, spec-conformant PNG (8-bit RGB, filter 0), readable
  by any external tool; lossless.
- ``jpeg`` — stand-in lossy codec (real JPEG needs libjpeg, absent
  here): uniform quantization step q=6 + zlib. Quantization MSE
  ≈ (q²-1)/12 ≈ 2.9 → PSNR ≈ 43.5 dB, exercising the PSNR≥40dB
  invariant exactly like a quality-90 JPEG would. A real decoder can
  be swapped in behind ``decode_image`` (import-try of PIL).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"PHLJ"  # pholcus-lossy
_LOSSY_Q = 6

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 uint8 array -> PNG bytes (filter 0, lossless)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).reshape(h, w, 3)
    bpp = 3
    flat = out.reshape(h, w * 3)
    for y in range(h):
        f = filters[y]
        if f == 0:
            continue
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros_like(row)
        if f == 1:  # Sub
            for x in range(bpp, w * 3):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif f == 2:  # Up
            flat[y] = (row + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(w * 3):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(w * 3):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return flat.reshape(h, w, 3).astype(np.uint8)


def encode_lossy(arr: np.ndarray, q: int = _LOSSY_Q) -> bytes:
    """Stand-in 'jpeg': uniform-quantized + zlib. Deterministic."""
    h, w, _ = arr.shape
    quant = (np.round(arr.astype(np.float64) / q) * q).clip(0, 255).astype(np.uint8)
    header = _LOSSY_MAGIC + struct.pack(">IIB", w, h, q)
    return header + zlib.compress(quant.tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _LOSSY_MAGIC:
        raise ValueError("not a PHLJ payload")
    w, h, _q = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(zlib.decompress(data[13:]), np.uint8).reshape(h, w, 3)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        return encode_lossy(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode payload bytes -> HxWx3 uint8. Real-JPEG path would go via
    PIL here; absent in this container, ``jpeg`` is the PHLJ stand-in.

    Truncated/corrupt payloads surface as ``ValueError`` — the decode
    boundary's one failure type — not as struct/zlib internals (a
    crawl sees torn downloads constantly; callers catch ValueError)."""
    try:
        return _decode_image_inner(data, fmt)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"corrupt {fmt} payload: {e}") from e


def _decode_image_inner(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:4] == _LOSSY_MAGIC:
            return decode_lossy(data)
        if _HAVE_PIL:  # pragma: no cover
            import io

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        raise NotImplementedError("real JPEG decode requires PIL (not installed)")
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(arr: np.ndarray) -> int:
    """DCT perceptual hash: gray -> 32x32 -> DCT-II -> top-left 8x8
    (minus DC) thresholded at the median -> signed 64-bit int."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(yi, xi)]
    d = _dct_matrix(32)
    freq = d @ small @ d.T
    low = freq[:8, :8].flatten()
    med = np.median(low[1:])
    bits = (low > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    iv = int(val)
    return iv - (1 << 64) if iv >= (1 << 63) else iv


def dhash64(arr: np.ndarray) -> int:
    """Difference hash: gray -> 8x9 grid -> sign of each horizontal
    gradient -> signed 64-bit int. The standard second family next to
    phash — independent failure modes (dhash keys on local gradient
    structure, phash on global spectrum), so ANDing the two verifies
    near-dups at much higher precision than either alone."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    yi = (np.arange(8) * h // 8).clip(0, h - 1)
    xi = (np.arange(9) * w // 9).clip(0, w - 1)
    small = gray[np.ix_(yi, xi)]
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64).flatten()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    iv = int(val)
    return iv - (1 << 64) if iv >= (1 << 63) else iv


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def apply_exif_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Upright a pixel array per TIFF/EXIF orientation 1-8 — the same
    transform table PIL's ``ImageOps.exif_transpose`` applies (i.e. the
    INVERSE of the camera rotation the tag records):

      1 identity            5 transpose (TL-BR diagonal flip)
      2 mirror horizontal   6 rotate 90° CW
      3 rotate 180°         7 transverse (TR-BL diagonal flip)
      4 mirror vertical     8 rotate 270° CW

    Orientations 5-8 swap width and height. Unknown values pass
    through untouched (cameras write garbage tags; fail open like
    every production pipeline). Pure-numpy shared kernel so the
    engine UDF and the oracle's driver-side recompute are the same
    code path."""
    o = int(orientation)
    if o == 2:
        out = arr[:, ::-1]
    elif o == 3:
        out = arr[::-1, ::-1]
    elif o == 4:
        out = arr[::-1, :]
    elif o == 5:
        out = np.transpose(arr, (1, 0, 2))
    elif o == 6:
        out = np.rot90(arr, k=-1)
    elif o == 7:
        out = np.transpose(arr[::-1, ::-1], (1, 0, 2))
    elif o == 8:
        out = np.rot90(arr, k=1)
    else:
        out = arr
    return np.ascontiguousarray(out)


def parse_exif_orientation(data: bytes) -> int | None:
    """Orientation (EXIF tag 0x0112) out of raw image bytes, or None.

    PNG: walk chunks for ``eXIf`` (its payload is a bare TIFF stream);
    JPEG (real SOI framing): walk segments for APP1 with the
    ``Exif\\0\\0`` prefix. The TIFF walk honors both byte orders
    (II/MM), validates the 42 magic, and reads IFD0 only — orientation
    lives there per EXIF 2.3. Anything malformed returns None (fail
    open, like ``normalize_orientation`` treats unknown tags). Pure
    function shared by the engine UDF and oracle recomputes."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        pos = 8
        while pos + 8 <= len(data):
            length = int.from_bytes(data[pos:pos + 4], "big")
            tag = bytes(data[pos + 4:pos + 8])
            if tag == b"eXIf":
                return _tiff_orientation(data[pos + 8:pos + 8 + length])
            if tag == b"IEND":
                return None
            pos += 12 + length
        return None
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(data) and data[pos] == 0xFF:
            marker = data[pos + 1]
            if marker == 0xDA:
                return None
            seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
            if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                return _tiff_orientation(
                    data[pos + 10:pos + 2 + seg_len]
                )
            pos += 2 + seg_len
        return None
    return None


def _tiff_orientation(t: bytes) -> int | None:
    if len(t) < 8:
        return None
    if t[:2] == b"II":
        bo = "little"
    elif t[:2] == b"MM":
        bo = "big"
    else:
        return None
    if int.from_bytes(t[2:4], bo) != 42:
        return None
    off = int.from_bytes(t[4:8], bo)
    if off + 2 > len(t):
        return None
    n = int.from_bytes(t[off:off + 2], bo)
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(t):
            return None
        tag = int.from_bytes(t[e:e + 2], bo)
        typ = int.from_bytes(t[e + 2:e + 4], bo)
        if tag == 0x0112 and typ == 3:  # SHORT
            return int.from_bytes(t[e + 8:e + 10], bo)
    return None


def exif_orientation_blob(orientation: int, big_endian: bool = False) -> bytes:
    """A minimal valid TIFF stream carrying just the orientation tag —
    the fixture/test generator twin of ``parse_exif_orientation``."""
    bo = "big" if big_endian else "little"
    head = (b"MM" if big_endian else b"II") + (42).to_bytes(2, bo)
    head += (8).to_bytes(4, bo)  # IFD0 right after the header
    ifd = (1).to_bytes(2, bo)
    ifd += (0x0112).to_bytes(2, bo) + (3).to_bytes(2, bo)
    ifd += (1).to_bytes(4, bo)
    ifd += int(orientation).to_bytes(2, bo) + b"\x00\x00"
    ifd += (0).to_bytes(4, bo)  # no next IFD
    return head + ifd


def dihedral_phash64(arr: np.ndarray) -> int:
    """Dihedral-invariant perceptual hash: the MINIMUM of ``phash64``
    over all 8 orientations of the image (the D4 orbit — identity,
    both mirrors, 180°, both diagonal flips, both 90° rotations,
    enumerated by the EXIF orientation table). Rotated/mirrored
    re-posts of the same picture land on byte-different payloads AND
    different plain phashes; their D4 orbits are the same SET of
    arrays, so the orbit minimum is a canonical representative and
    rotated duplicates collapse to EXACT hash equality — group-by,
    no hamming join needed for this failure mode."""
    return min(
        phash64(apply_exif_orientation(arr, o)) for o in range(1, 9)
    )


def detect_borders(
    arr: np.ndarray, tol: int = 2, dark: int = 8
) -> tuple[int, int, int, int]:
    """Letterbox/pillarbox bar widths (top, bottom, left, right): the
    count of consecutive near-uniform DARK rows/columns from each
    edge (per-line peak-to-peak ≤ ``tol`` and mean ≤ ``dark``) — the
    video-thumbnail black bars an image-curation pipeline crops
    before aspect bucketing (bars poison aspect ratios and waste
    patch tokens). Pure numpy; shared by the engine UDF and the
    oracle's driver-side recompute."""

    def _run(lines: np.ndarray) -> int:
        n = 0
        for line in lines:
            if int(line.max()) - int(line.min()) <= tol and float(
                line.mean()
            ) <= dark:
                n += 1
            else:
                break
        return n

    top = _run(arr.reshape(arr.shape[0], -1))
    bottom = _run(arr[::-1].reshape(arr.shape[0], -1))
    cols = np.transpose(arr, (1, 0, 2)).reshape(arr.shape[1], -1)
    left = _run(cols)
    right = _run(cols[::-1])
    return top, bottom, left, right


def pixel_entropy(arr: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin grayscale histogram —
    the flat-image detector: solid colors and near-solid gradients
    score ≈ 0–2 bits, photographic content ≥ 5. Curation drops the
    low end (LAION-style junk: tracking pixels scaled up, template
    placeholders, failed renders). Integer luminance + round-4 keep
    the value bit-reproducible on any engine/BLAS."""
    # INTEGER luminance: the float dot product is BLAS-lane-dependent
    # (the same solid color can land in two adjacent bins on one
    # machine), so the histogram key must be exact arithmetic
    a = arr.astype(np.int64)
    gray = (
        (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    ).astype(np.uint8)
    counts = np.bincount(gray.ravel(), minlength=256)
    p = counts[counts > 0] / gray.size
    # + 0.0 normalizes the single-bin case's -0.0
    return round(float(-(p * np.log2(p)).sum()) + 0.0, 4)
