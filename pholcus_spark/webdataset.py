"""WebDataset tar-shard sink for the image+caption corpus.

WebDataset (tar shards where one training sample is the group of
same-stem members ``<key>.jpg`` + ``<key>.txt`` + ``<key>.json``) is
the de-facto input layout for large-scale image training — it is what
the LAION/OpenCLIP tooling reads. The reference has no analog (its S8
file sink lands one loose file per row, output_file.go:20-71); this is
the beyond-reference export a 100 TB image pipeline actually needs:
sequential-read shards instead of 10^10 tiny files.

Spark-first split of the work, mirroring the WARC sink
(``sinks.warc_records``):

- ``tar_entry`` / ``webdataset_records``: the ustar (POSIX.1-1988)
  framing — 512-byte header with octal size + checksum, payload,
  NUL padding to the next 512 boundary — built ENTIRELY as column
  expressions. The header checksum (byte-sum of the header with the
  checksum field spaced out) is an ``aggregate`` over
  ``ascii(substring(...))`` per byte, so the whole record is
  whole-stage codegen; no Python touches payload bytes.
- ``write_webdataset``: hash-sharded ``repartition`` + in-shard sort
  by key, then ``foreachPartition`` lands one ``.tar`` per shard
  executor-side (no driver collect). Shard names are
  content-addressed from the first key, so speculative/retried tasks
  overwrite their own output.
- ``read_webdataset``: ``binaryFile`` scan (one task per shard — the
  Common Crawl parallelism layout) + Arrow-batched ``mapInPandas``
  that parses shards back with stdlib ``tarfile`` — which VERIFIES
  every header checksum, making the round-trip test a real framing
  proof, not an echo.

Names must be ASCII (the checksum sums one byte per header char);
``webdataset_records`` guards this with an ``assert_true`` column
rather than producing a corrupt archive.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tar_entry", "webdataset_records", "write_webdataset",
           "read_webdataset", "webdataset_manifest"]

_NULS = "\0" * 512
# byte-sum of the fixed header fields (mode/uid/gid/mtime, spaced
# checksum, typeflag '0', magic "ustar\0", version "00"); name and
# size are the only variable contributions
_FIXED_CHKSUM = 2509


def _field(text: str) -> str:
    return text + "\0"


def _tar_header_prefix(name: Column, size: Column) -> Column:
    """The 512-byte ustar header STRING with the checksum field still
    spaced out. ``size`` in bytes; mtime pinned to epoch 0 so
    re-exports are byte-identical (same idempotence rule as the WARC
    record ids)."""
    size_oct = F.lpad(F.conv(size.cast("string"), 10, 8), 11, "0")
    return F.concat(
        F.rpad(name, 100, "\0"),                    # name
        F.lit(_field("0000644")),                    # mode
        F.lit(_field("0000000")),                    # uid
        F.lit(_field("0000000")),                    # gid
        size_oct, F.lit("\0"),                       # size (octal)
        F.lit(_field("00000000000")),                # mtime = 0
        F.lit(" " * 8),                              # chksum placeholder
        F.lit("0"),                                  # typeflag: regular
        F.lit("\0" * 100),                           # linkname
        F.lit(_field("ustar")), F.lit("00"),         # magic + version
        F.lit("\0" * 32), F.lit("\0" * 32),          # uname, gname
        F.lit("\0" * 8), F.lit("\0" * 8),            # devmajor, devminor
        F.lit("\0" * 155),                           # prefix
        F.lit("\0" * 12),                            # pad to 512
    )


def _char_sum(s: Column) -> Column:
    """Byte-sum of an ASCII string column (NULs count 0)."""
    return F.aggregate(
        F.transform(
            F.split(s, ""),
            lambda c: F.coalesce(F.ascii(c), F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def tar_entry(name: Column, payload: Column) -> Column:
    """One complete ustar archive entry as a BINARY column:
    header(512) + payload + NUL padding to the next 512-byte
    boundary. Pure codegen — checksum included."""
    size = F.length(payload).cast("bigint")
    h0 = _tar_header_prefix(name, size)
    chk = _FIXED_CHKSUM + _char_sum(F.rpad(name, 100, "\0")) + _char_sum(
        F.lpad(F.conv(size.cast("string"), 10, 8), 11, "0")
    )
    chk_field = F.concat(
        F.lpad(F.conv(chk.cast("string"), 10, 8), 6, "0"),
        F.lit("\0 "),
    )
    header = F.concat(
        F.substring(h0, 1, 148), chk_field, F.substring(h0, 157, 356)
    )
    pad_len = F.pmod(F.lit(512) - F.pmod(size, F.lit(512)), F.lit(512))
    return F.concat(
        F.encode(header, "UTF-8"),
        payload,
        F.encode(
            F.substring(F.lit(_NULS), F.lit(1), pad_len.cast("int")),
            "UTF-8",
        ),
    )


def webdataset_records(
    images: DataFrame,
    n_shards: int = 64,
    key_col: str = "image_id",
) -> DataFrame:
    """(key, shard, n_bytes, record) — one WebDataset sample per image
    row: ``<key>.<fmt>`` (payload bytes) + ``<key>.txt`` (caption) +
    ``<key>.json`` (w/h/fmt/phash metadata), framed as three
    consecutive tar entries. Shard assignment is
    ``pmod(xxhash64(key), n_shards)`` — uniform regardless of key
    distribution, so shard sizes stay balanced at any corpus size
    (size the constant so one shard ≈ 1-10 GB: ~10^4 shards at
    100 TB)."""
    key = F.col(key_col)
    ascii_ok = key.rlike("^[\\x20-\\x7e]+$")
    checked = F.when(ascii_ok, key).otherwise(
        F.assert_true(ascii_ok, F.lit("non-ASCII webdataset key")).cast(
            "string"
        )
    )
    meta = F.encode(
        F.to_json(F.struct(F.col("w"), F.col("h"), F.col("fmt"),
                           F.col("phash"))),
        "UTF-8",
    )
    record = F.concat(
        tar_entry(F.concat(checked, F.lit("."), F.col("fmt")),
                  F.col("bytes")),
        tar_entry(F.concat(checked, F.lit(".txt")),
                  F.encode(F.col("caption"), "UTF-8")),
        tar_entry(F.concat(checked, F.lit(".json")), meta),
    )
    return images.select(
        key.alias("key"),
        F.pmod(F.xxhash64(key), F.lit(n_shards)).cast("int").alias("shard"),
        F.length(record).alias("n_bytes"),
        record.alias("record"),
    )


def write_webdataset(
    images: DataFrame, out_dir: str, n_shards: int = 64, **kw
) -> None:
    """Land the corpus as ``shard-<hash>.tar`` files, one per shard,
    executor-side. Samples are sorted by key within each shard so a
    re-export of the same corpus is byte-identical file-for-file."""
    os.makedirs(out_dir, exist_ok=True)
    recs = webdataset_records(images, n_shards=n_shards, **kw)

    def _flush(buf: list, first: str) -> None:
        if not buf:
            return
        name = hashlib.md5(first.encode()).hexdigest()[:16]
        with open(os.path.join(out_dir, f"shard-{name}.tar"), "wb") as f:
            f.write(b"".join(buf))
            f.write(b"\0" * 1024)  # tar end-of-archive marker

    def _write(rows) -> None:
        # a hash-repartitioned task may hold SEVERAL shard ids — the
        # shard-major sort makes each id a contiguous run, and every
        # run lands as its own tar (one file per shard, always)
        buf: list = []
        first = None
        cur = None
        for r in rows:
            if r["shard"] != cur:
                _flush(buf, first)
                buf, first, cur = [], r["key"], r["shard"]
            buf.append(bytes(r["record"]))
        _flush(buf, first)

    recs.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "key"
    ).foreachPartition(_write)


def read_webdataset(spark, path_glob: str) -> DataFrame:
    """Distributed WebDataset ingest: ``binaryFile`` (one task per
    shard) + Arrow-batched ``mapInPandas`` regrouping same-stem tar
    members into samples. stdlib ``tarfile`` re-validates every
    header checksum, so a framing bug in the writer fails HERE, not
    silently downstream.

    Returns (image_id, fmt, bytes, caption, meta_json)."""
    import pandas as pd

    shards = spark.read.format("binaryFile").load(path_glob)

    def _parse(pdf_iter):
        import io
        import tarfile

        for pdf in pdf_iter:
            rows = []
            for blob in pdf["content"]:
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        stem, _, ext = m.name.rpartition(".")
                        if stem not in samples:
                            samples[stem] = {}
                            order.append(stem)
                        samples[stem][ext] = tf.extractfile(m).read()
                for stem in order:
                    parts = samples[stem]
                    img = [v for k, v in parts.items()
                           if k not in ("txt", "json")]
                    fmt = [k for k in parts if k not in ("txt", "json")]
                    rows.append({
                        "image_id": stem,
                        "fmt": fmt[0] if fmt else None,
                        "bytes": img[0] if img else None,
                        "caption": parts.get("txt", b"").decode("utf-8"),
                        "meta_json": parts.get("json", b"").decode("utf-8"),
                    })
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "bytes", "caption",
                         "meta_json"],
            )

    return shards.select("content").mapInPandas(
        _parse,
        "image_id string, fmt string, bytes binary, caption string, "
        "meta_json string",
    )


def webdataset_manifest(
    images: DataFrame, n_shards: int = 64, key_col: str = "image_id"
) -> DataFrame:
    """Shard manifest — (shard, n_samples, n_bytes, first_key,
    last_key) — the index a training loader reads to plan epoch
    schedules and detect short shards without opening tars. Derived
    from the same framing expressions the writer uses, so manifest
    byte counts are exact (incl. the 1 KiB end-of-archive marker
    per shard). One hash agg on the shard id."""
    recs = webdataset_records(images, n_shards=n_shards, key_col=key_col)
    return recs.groupBy("shard").agg(
        F.count("*").alias("n_samples"),
        (F.sum("n_bytes") + 1024).alias("n_bytes"),
        F.min("key").alias("first_key"),
        F.max("key").alias("last_key"),
    )
