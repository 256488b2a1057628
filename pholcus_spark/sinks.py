"""Output sinks — the S1-S9 pipeline surface as DataFrame writers.

Reference: ``app/pipeline/collector`` — batch-buffered outputs
(collector.go:34-140) fanned out per (namespace, rule) where
namespace = spider[+keyin-hash] and rule names the sheet/table/topic
(output_util.go:8-39). Our micro-batch round IS the batch; each writer
below is one flush.

Implemented Spark-first:
- CSV (S2, output_csv.go:17-70): header, per-(namespace,rule) dirs,
  non-string cells JSON-encoded like the reference.
- Kafka-shaped JSON (S6, output_kafka.go:38-83): topic column
  ``namespace__rule`` + ``to_json(struct(*))`` value. Without a broker
  in the sandbox the frame is written as JSON lines; on a cluster the
  same frame goes to ``.format("kafka")`` unchanged.
- JDBC-shaped (S4, output_mysql.go:37-87): the writer builds the
  DataFrameWriter with url/table/mode; actual .save() needs a driver
  jar, so it is returned un-invoked for the caller (gated by jdbc_url).
- File/binary export (S8, output_file.go:20-71): one file per row via
  ``foreachPartition`` — executor-side, no driver collect.
- Report (S9, collector.go:180-188): per-(namespace,rule) data/file
  counts + byte totals.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def namespaced(df: DataFrame, spider: str, keyin: str | None = None) -> DataFrame:
    """Attach the reference's namespace column: spider[+keyin-hash]
    (output_util.go:8-39; keyin subname hash util.go:252-257)."""
    ns = spider if not keyin else None
    if ns is None:
        sub = F.substring(F.md5(F.lit(keyin)), 1, 8)
        col = F.concat(F.lit(spider + "__"), sub)
    else:
        col = F.lit(ns)
    return df.withColumn("namespace", col)


def write_csv(items: DataFrame, out_dir: str, rule_col: str = "rule") -> None:
    """S2: one directory per rule value, header row, non-string cells
    JSON-encoded (the reference JSON-encodes non-string fields,
    output_csv.go:52-59). Binary columns are hex-encoded first."""
    cols = []
    for f in items.schema.fields:
        t = f.dataType.simpleString()
        if t == "binary":
            cols.append(F.hex(F.col(f.name)).alias(f.name))
        elif t == "string":
            cols.append(F.col(f.name))
        elif t.startswith(("array", "map", "struct")):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name).cast("string").alias(f.name))
    (
        items.select(*cols)
        .write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')  # RFC-4180 doubled quotes, not backslash
        .partitionBy(rule_col)
        .csv(out_dir)
    )


def kafka_frame(items: DataFrame, namespace: str, rule_col: str = "rule") -> DataFrame:
    """S6: (topic, key, value) frame — topic = namespace__rule, value =
    JSON of the full row. Feed to .format('kafka') on a cluster."""
    payload_cols = [c for c in items.columns if c != rule_col]
    return items.select(
        F.concat(F.lit(namespace + "__"), F.col(rule_col)).alias("topic"),
        F.coalesce(F.col(payload_cols[0]).cast("string"), F.lit("")).alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )


def write_kafka_shaped(items: DataFrame, out_dir: str, namespace: str) -> None:
    """Sandbox flush of the kafka frame as JSON lines (same frame, file
    sink); swap the writer for format('kafka') + bootstrap.servers."""
    kafka_frame(items, namespace).write.mode("overwrite").json(out_dir)


def jdbc_writer(items: DataFrame, jdbc_url: str, table: str,
                driver: str | None = None):
    """S4: JDBC writer (reference output_mysql.go:37-87 — dynamic table
    create + batch insert; Spark's jdbc source does both). The caller
    invokes ``.save()``. ``driver`` pins the JDBC driver class when the
    URL prefix alone can't resolve it — exercised end-to-end against
    embedded Derby (shipped with Spark) in test_sinks; point the URL at
    MySQL/Postgres with its driver jar on a real cluster."""
    w = (
        items.write.mode("append")
        .format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", table)
    )
    if driver:
        w = w.option("driver", driver)
    return w


def jdbc_reader(
    spark,
    jdbc_url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S4 read path: the DB-backed history source (reference resumes
    success/failure history from MySQL/Mongo at start,
    app/aid/history/history.go:106-264). Pair with
    ``CrawlEngine.import_seen`` to inherit a foreign seen set, or read
    any sink table back. ``partition_column``/bounds/``num_partitions``
    split the read into parallel range scans — REQUIRED at scale: a
    10^10-key history behind one JDBC cursor is a single-task read."""
    r = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", table)
    )
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach Spark as the literal "None" and die
            # in a NumberFormatException deep inside load()
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return r.load()


def export_files(files: DataFrame, out_dir: str,
                 name_col: str = "image_id", bytes_col: str = "bytes") -> None:
    """S8: one binary file per row, written executor-side via
    foreachPartition (no driver collect; reference writes concurrently
    per file, output_file.go:20-71)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        for r in rows:
            name = str(r[name_col]).replace(os.sep, "_")
            payload = r[bytes_col]
            if payload is None:
                continue
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(bytes(payload))

    files.select(name_col, bytes_col).foreachPartition(_write)


def report(items: DataFrame, namespace: str, rule_col: str = "rule",
           bytes_col: str | None = "bytes") -> DataFrame:
    """S9: per-(namespace, rule) flush report — row/byte counts, the
    ReportChan analog (collector.go:180-188)."""
    aggs = [F.count("*").alias("n_rows")]
    if bytes_col and bytes_col in items.columns:
        aggs.append(
            F.coalesce(F.sum(F.length(F.col(bytes_col))), F.lit(0)).alias("n_bytes")
        )
    return (
        items.groupBy(F.col(rule_col).alias("rule"))
        .agg(*aggs)
        .select(F.lit(namespace).alias("namespace"), "*")
    )


def mongo_frame(items: DataFrame, namespace: str, rule_col: str = "rule") -> DataFrame:
    """S5 (output_mgo.go:18-77): document-shaped frame — collection =
    namespace__rule, deterministic ``_id`` (md5 of the document; the
    reference lets mgo auto-assign ObjectIds — a content hash gives the
    same upsert-idempotence the success-history writer uses,
    history.go:106-156), doc = JSON of the flattened row. Feed to
    ``.format("mongodb")`` + collection option on a cluster; the
    sandbox flush writes the identical frame as JSON lines."""
    payload_cols = [c for c in items.columns if c != rule_col]
    doc = F.to_json(F.struct(*payload_cols))
    return items.select(
        F.concat(F.lit(namespace + "__"), F.col(rule_col)).alias("collection"),
        F.md5(doc).alias("_id"),
        doc.alias("doc"),
    )


def write_mongo_shaped(items: DataFrame, out_dir: str, namespace: str) -> None:
    mongo_frame(items, namespace).write.mode("overwrite").json(out_dir)


def mongo_reader(
    spark,
    path: str,
    collection: str | None = None,
    doc_schema=None,
) -> DataFrame:
    """S5 READ path — the Mongo half of the reference's history
    inherit (history.go:161-264: ``mgo Find(nil).All`` over the
    success/failure collection, un-serializing each document and
    skipping the ones that fail). Reads the mongo-shaped frames
    ``write_mongo_shaped`` flushes (JSON lines of
    (collection, _id, doc) — the sandbox stand-in); on a cluster,
    swap the load for ``spark.read.format("mongodb")`` with the same
    downstream shape — the collection filter and document parse are
    source-agnostic. ``doc_schema`` (DDL string or StructType) parses
    each document body into a ``fields`` struct; a malformed document
    parses to NULL fields, mirroring the reference's
    skip-on-unserialize-error (history.go:185-189) once the caller
    drops the nulls. Pair with ``CrawlEngine.import_seen`` to inherit
    a foreign seen set, like ``jdbc_reader``."""
    df = spark.read.schema("collection string, _id string, doc string").json(
        path
    )
    if collection is not None:
        df = df.filter(F.col("collection") == collection)
    if doc_schema is not None:
        df = df.withColumn("fields", F.from_json("doc", doc_schema))
    return df


def beanstalk_frame(
    items: DataFrame,
    namespace: str,
    rule_col: str = "rule",
    priority: int = 0,
    delay_s: int = 0,
    ttr_s: int = 60,
) -> DataFrame:
    """S7 (output_beanstalkd.go:19-55): job-shaped frame — tube =
    namespace__rule, one JSON job body per row with the put parameters
    (pri/delay/ttr) the reference passes to conn.Put. A worker drains
    the frame with any beanstalkd client; the sandbox flush is JSON
    lines of the same frame."""
    payload_cols = [c for c in items.columns if c != rule_col]
    return items.select(
        F.concat(F.lit(namespace + "__"), F.col(rule_col)).alias("tube"),
        F.lit(priority).cast("long").alias("pri"),
        F.lit(delay_s).cast("long").alias("delay_s"),
        F.lit(ttr_s).cast("long").alias("ttr_s"),
        F.to_json(F.struct(*payload_cols)).alias("job"),
    )


def write_excel(
    items: DataFrame,
    out_path: str,
    rule_col: str = "rule",
    max_rows_per_sheet: int = 65536,
    max_total_rows: int = 1_000_000,
) -> int:
    """S3 (output_excel.go:18-76): one workbook, one sheet per rule
    value, header row + stringified cells. Self-contained OOXML writer
    (zipfile + hand-built sheet XML — no xlsx library in the sandbox).

    Excel is the reference's small human-export sink (batches are
    BatchCap-bounded, 10k rows); rows stream through toLocalIterator so
    driver memory stays one-partition-bounded, and each sheet truncates
    at ``max_rows_per_sheet``. Returns the number of rows written.

    This is a driver-side funnel BY DESIGN (human-sized exports only):
    ``max_total_rows`` is the tripwire that turns "someone pointed the
    Excel sink at a crawl table" into a loud error instead of a silent
    multi-hour iterate."""
    import zipfile
    from xml.sax.saxutils import escape

    cols = []
    for f in items.schema.fields:
        t = f.dataType.simpleString()
        if t == "binary":
            cols.append(F.hex(F.col(f.name)).alias(f.name))
        elif t.startswith(("array", "map", "struct")):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name).cast("string").alias(f.name))
    df = items.select(*cols)
    header = [f.name for f in df.schema.fields if f.name != rule_col]

    sheets: dict[str, list[list[str]]] = {}
    n_rows = 0
    n_seen = 0
    for r in df.toLocalIterator():
        n_seen += 1
        if n_seen > max_total_rows:
            raise ValueError(
                f"write_excel: input exceeds max_total_rows="
                f"{max_total_rows}; this sink is for human-sized exports"
                " — write a distributed sink (CSV/parquet) instead"
            )
        rule = str(r[rule_col])
        rows = sheets.setdefault(rule, [header])
        if len(rows) <= max_rows_per_sheet:
            rows.append(["" if r[c] is None else str(r[c]) for c in header])
            n_rows += 1

    def col_letter(j: int) -> str:
        # base-26 bijective numeration (A..Z, AA..AZ, BA..): >26 columns
        # must not wrap back to 'A' or the worksheet has duplicate refs
        s = ""
        j += 1
        while j > 0:
            j, rem = divmod(j - 1, 26)
            s = chr(65 + rem) + s
        return s

    def sheet_xml(rows: list[list[str]]) -> str:
        out = [
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>',
        ]
        for i, row in enumerate(rows, 1):
            cells = "".join(
                f'<c r="{col_letter(j)}{i}" t="inlineStr">'
                f"<is><t>{escape(v)}</t></is></c>"
                for j, v in enumerate(row)
            )
            out.append(f'<row r="{i}">{cells}</row>')
        out.append("</sheetData></worksheet>")
        return "".join(out)

    names = sorted(sheets)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.'
                'spreadsheetml.worksheet+xml"/>'
                for i in range(len(names))
            )
            + "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{escape(n)}" sheetId="{i + 1}" '
                f'r:id="rId{i + 1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(sheets[n]))
    return n_rows


def warc_records(
    items: DataFrame,
    url_col: str = "url",
    bytes_col: str = "bytes",
    time_col: str = "download_time",
    extra_cols: tuple = (),
) -> DataFrame:
    """Crawl-archive records in WARC/1.0 framing (ISO 28500) — the
    interchange format real crawl pipelines (Common Crawl, Heritrix)
    archive into. One ``resource`` record per fetched row: headers +
    payload as a single binary column, record id derived from
    xxhash64(url) so re-exports are byte-identical (idempotent
    archives, same philosophy as the content-hashed mongo ``_id``).

    Pure column expressions — framing is concat/length arithmetic in
    codegen, no Python in the loop; pair with ``export_files`` or
    ``write_warc`` to land segment files executor-side.
    """
    payload = F.coalesce(F.col(bytes_col), F.lit(b""))
    crlf = F.lit("\r\n")
    header = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: resource"), crlf,
        F.lit("WARC-Record-ID: <urn:pholcus:"),
        # lpad to 16 nibbles: fixed-width ids make the whole header
        # length a function of (url, payload) alone, so the framing
        # arithmetic is oracle-checkable without xxhash64 in DuckDB
        F.lpad(F.lower(F.hex(F.xxhash64(F.col(url_col)))), 16, "0"),
        F.lit(">"), crlf,
        F.lit("WARC-Date: "),
        F.date_format(
            F.to_timestamp(F.col(time_col)), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ), crlf,
        F.lit("WARC-Target-URI: "), F.col(url_col), crlf,
        F.lit("Content-Type: application/octet-stream"), crlf,
        F.lit("Content-Length: "),
        F.length(payload).cast("string"), crlf, crlf,
    )
    record = F.concat(
        F.encode(header, "UTF-8"), payload, F.encode(F.concat(crlf, crlf), "UTF-8")
    )
    return items.select(
        F.col(url_col).alias("url"),
        F.length(record).alias("record_len"),
        record.alias("record"),
        *extra_cols,
    )


def write_warc(items: DataFrame, out_dir: str, **kw) -> None:
    """Land WARC records as one segment file per partition,
    executor-side (S8 shape: foreachPartition, no driver collect).
    Segment names are content-addressed from the partition's first
    record id, so retried tasks overwrite their own output
    (idempotent against speculative execution)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        buf = []
        first = None
        for r in rows:
            if first is None:
                first = r["url"]
            buf.append(bytes(r["record"]))
        if not buf:
            return
        import hashlib

        name = hashlib.md5(first.encode()).hexdigest()[:16]
        with open(os.path.join(out_dir, f"seg-{name}.warc"), "wb") as f:
            f.write(b"".join(buf))

    warc_records(items, **kw).foreachPartition(_write)


def read_warc(spark, path_glob: str) -> "DataFrame":
    """Distributed WARC ingest — the reprocessing path real corpora
    arrive through (Common Crawl ships ~90k WARC segments per crawl).
    ``binaryFile`` gives one row per segment (Spark assigns whole
    files to tasks, so parallelism = segment count — the same layout
    Common Crawl jobs exploit), and an Arrow-batched ``mapInPandas``
    explodes each segment into records. At 100 TB the scan parallelizes
    across executors with no shuffle; record parsing is CPU-local.

    Returns (url, warc_date, record_id, n_bytes, body).
    """
    import pandas as pd

    segs = spark.read.format("binaryFile").load(path_glob)

    def _parse(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for blob in pdf["content"]:
                for rec in _parse_warc_bytes(bytes(blob)):
                    h = rec["headers"]
                    rows.append(
                        {
                            "url": h.get("WARC-Target-URI", ""),
                            "warc_date": h.get("WARC-Date", ""),
                            "record_id": h.get("WARC-Record-ID", ""),
                            "n_bytes": len(rec["body"]),
                            "body": rec["body"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_date", "record_id", "n_bytes", "body"],
            )

    return segs.select("content").mapInPandas(
        _parse,
        "url string, warc_date string, record_id string, "
        "n_bytes long, body binary",
    )


def _parse_warc_bytes(data: bytes) -> list[dict]:
    out = []
    pos = 0
    while pos < len(data):
        head_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        for line in data[pos:head_end].decode("utf-8").splitlines()[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        n = int(headers["Content-Length"])
        body = data[head_end + 4 : head_end + 4 + n]
        out.append({"headers": headers, "body": body})
        pos = head_end + 4 + n + 4  # trailing CRLFCRLF
    return out


def read_warc_file(path: str) -> list[dict]:
    """Parse one WARC segment back into records (the verification
    twin of ``warc_records``; driver-side, test/audit-sized)."""
    return _parse_warc_bytes(open(path, "rb").read())


def _warc_segment(url_col: str, n_segments: int):
    """Deterministic segment assignment shared by the segmented writer
    and the CDX index: portable 60-bit md5 (not xxhash64) so a foreign
    engine — and the DuckDB oracle — can recompute the placement."""
    from .textops import md5_long

    return F.pmod(md5_long(F.col(url_col)), F.lit(n_segments)).cast("int")


def write_warc_segments(
    items: DataFrame,
    out_dir: str,
    n_segments: int = 8,
    url_col: str = "url",
    **kw,
) -> None:
    """Land WARC records into a DETERMINISTIC segment layout — the one
    ``cdx_index`` predicts byte offsets for. Each record's segment is a
    pure function of its url (``_warc_segment``) and records sort by
    url inside a segment, so re-exports are byte-identical per segment
    file regardless of input partitioning or cluster width (unlike
    ``write_warc``'s partition-shaped segments).

    One Exchange on segment id; the in-partition sort feeds sequential
    appends. Several segments may share a task (hash collision) — the
    writer splits files on the segment boundary, so the on-disk layout
    is exactly one ``seg-%05d.warc`` per segment id."""
    os.makedirs(out_dir, exist_ok=True)
    recs = (
        warc_records(items, url_col=url_col, **kw)
        .withColumn("segment", _warc_segment("url", n_segments))
        .repartition(n_segments, "segment")
        .sortWithinPartitions("segment", "url")
    )

    def _write(rows) -> None:
        cur, buf = None, []

        def _flush() -> None:
            if cur is not None and buf:
                path = os.path.join(out_dir, f"seg-{cur:05d}.warc")
                with open(path, "wb") as f:
                    f.write(b"".join(buf))

        for r in rows:
            if r["segment"] != cur:
                _flush()
                cur, buf = r["segment"], []
            buf.append(bytes(r["record"]))
        _flush()

    recs.foreachPartition(_write)


def cdx_index(
    items: DataFrame,
    n_segments: int = 8,
    url_col: str = "url",
    bytes_col: str = "bytes",
    time_col: str = "download_time",
) -> DataFrame:
    """CDX-style URL index over the ``write_warc_segments`` layout —
    the Common Crawl / Wayback lookup artifact: for every capture, a
    SURT-keyed row naming the segment file, byte offset, and record
    length, so a reader fetches one record with a ranged read instead
    of scanning segments. Sorting/range-partitioning the output by
    ``surt`` gives the per-domain locality the CDX layout exists for
    (``urlnorm.surt_key_col``).

    Scale shape: framing lengths come from ``warc_records``'s codegen
    arithmetic map-side and the record BYTES are projected away before
    the shuffle — only (url, ts, record_len) moves. Offsets are one
    prefix-sum window over the same (segment, url) partitioning the
    writer uses, so index and files agree byte-for-byte (verified in
    tests by seeking each (offset, len) and re-parsing the record).

    Returns (surt, url, ts, segment, offset, record_len)."""
    from .urlnorm import surt_key_col

    ts = F.date_format(
        F.to_timestamp(F.col(time_col)), "yyyyMMddHHmmss"
    ).alias("ts")
    recs = warc_records(
        items,
        url_col=url_col,
        bytes_col=bytes_col,
        time_col=time_col,
        extra_cols=(ts,),
    ).select("url", "record_len", "ts")
    recs = recs.withColumn("segment", _warc_segment("url", n_segments))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("segment")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return recs.select(
        surt_key_col(F.col("url")).alias("surt"),
        "url",
        "ts",
        F.format_string("seg-%05d.warc", "segment").alias("segment"),
        F.coalesce(F.sum("record_len").over(w), F.lit(0))
        .cast("long")
        .alias("offset"),
        F.col("record_len").cast("long").alias("record_len"),
    )


def warc_revisit_records(
    items: DataFrame,
    url_col: str = "url",
    bytes_col: str = "bytes",
    time_col: str = "download_time",
) -> DataFrame:
    """WARC payload-digest dedup (ISO 28500 §6.7.2, the Heritrix /
    Common Crawl archive-dedup feature): the FIRST capture of each
    payload digest writes a full ``resource`` record; every later
    capture of byte-identical content writes a tiny ``revisit``
    record carrying the digest and a WARC-Refers-To pointer at the
    original — archives of recrawls shrink by the duplicate fraction
    without losing any capture event.

    Election = min (url, time) per md5 digest: ONE map-side-combined
    hash aggregation on the digest, joined back digest-keyed (the
    line-dedup skeleton — only (digest, url, time) triples shuffle,
    never payloads; the full-record framing runs in the scan
    projection after the join decides each row's type).

    Returns (url, record_type, digest, refers_to, record_len,
    record) — revisit records frame the digest + pointer headers with
    NO payload body."""
    payload = F.coalesce(F.col(bytes_col), F.lit(b""))
    digest = F.md5(payload)
    keyed = items.withColumn("_digest", digest)
    first = keyed.groupBy("_digest").agg(
        F.min(F.struct(F.col(url_col), F.col(time_col))).alias("_f")
    )
    j = keyed.join(first, "_digest")
    is_first = (F.col(url_col) == F.col("_f")[url_col]) & (
        F.col(time_col) == F.col("_f")[time_col]
    )
    crlf = F.lit("\r\n")
    rid = F.lpad(F.lower(F.hex(F.xxhash64(F.col(url_col)))), 16, "0")
    ref_id = F.lpad(
        F.lower(F.hex(F.xxhash64(F.col("_f")[url_col]))), 16, "0"
    )
    wdate = F.date_format(
        F.to_timestamp(F.col(time_col)), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    res_header = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: resource"), crlf,
        F.lit("WARC-Record-ID: <urn:pholcus:"), rid, F.lit(">"), crlf,
        F.lit("WARC-Date: "), wdate, crlf,
        F.lit("WARC-Target-URI: "), F.col(url_col), crlf,
        F.lit("WARC-Payload-Digest: md5:"), F.col("_digest"), crlf,
        F.lit("Content-Type: application/octet-stream"), crlf,
        F.lit("Content-Length: "),
        F.length(payload).cast("string"), crlf, crlf,
    )
    res_record = F.concat(
        F.encode(res_header, "UTF-8"),
        payload,
        F.encode(F.concat(crlf, crlf), "UTF-8"),
    )
    rev_header = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: revisit"), crlf,
        F.lit("WARC-Record-ID: <urn:pholcus:"), rid, F.lit(">"), crlf,
        F.lit("WARC-Refers-To: <urn:pholcus:"), ref_id, F.lit(">"), crlf,
        F.lit("WARC-Date: "), wdate, crlf,
        F.lit("WARC-Target-URI: "), F.col(url_col), crlf,
        F.lit("WARC-Payload-Digest: md5:"), F.col("_digest"), crlf,
        F.lit("Content-Length: 0"), crlf, crlf,
    )
    rev_record = F.concat(
        F.encode(rev_header, "UTF-8"),
        F.encode(F.concat(crlf, crlf), "UTF-8"),
    )
    record = F.when(is_first, res_record).otherwise(rev_record)
    return j.select(
        F.col(url_col).alias("url"),
        F.when(is_first, F.lit("resource"))
        .otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.col("_digest").alias("digest"),
        F.when(is_first, F.lit(None).cast("string"))
        .otherwise(F.col("_f")[url_col])
        .alias("refers_to"),
        F.length(record).alias("record_len"),
        record.alias("record"),
    )


def wet_records(
    texts: DataFrame,
    url_col: str = "url",
    text_col: str = "main_text",
    time_col: str = "download_time",
) -> DataFrame:
    """WET extracted-text records — the Common Crawl *.warc.wet.gz
    artifact: one WARC ``conversion`` record per page whose payload
    is the EXTRACTED plain text (harvest.main_text upstream), with
    WARC-Refers-To pointing at the page's capture record. Most
    text-corpus consumers never touch the raw WARC; shipping WET
    beside it is what makes the crawl a text dataset. Same codegen
    framing as warc_records (fixed-width ids keep lengths
    oracle-checkable); completes the archive family: WARC capture +
    revisit dedup + CDX index + WET conversion."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    crlf = F.lit("\r\n")
    rid = F.lpad(
        F.lower(F.hex(F.xxhash64(F.concat(F.lit("wet:"), F.col(url_col))))),
        16, "0",
    )
    ref = F.lpad(F.lower(F.hex(F.xxhash64(F.col(url_col)))), 16, "0")
    header = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: conversion"), crlf,
        F.lit("WARC-Record-ID: <urn:pholcus:"), rid, F.lit(">"), crlf,
        F.lit("WARC-Refers-To: <urn:pholcus:"), ref, F.lit(">"), crlf,
        F.lit("WARC-Date: "),
        F.date_format(
            F.to_timestamp(F.col(time_col)), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ), crlf,
        F.lit("WARC-Target-URI: "), F.col(url_col), crlf,
        F.lit("Content-Type: text/plain"), crlf,
        F.lit("Content-Length: "),
        F.length(payload).cast("string"), crlf, crlf,
    )
    record = F.concat(
        F.encode(header, "UTF-8"), payload,
        F.encode(F.concat(crlf, crlf), "UTF-8"),
    )
    return texts.select(
        F.col(url_col).alias("url"),
        F.length(payload).cast("long").alias("text_bytes"),
        F.length(record).cast("long").alias("record_len"),
        record.alias("record"),
    )


def export_warc_bundle(captures: DataFrame, out_dir: str) -> None:
    """One-call archive export: deterministic WARC segments +
    ``cdx.parquet`` ranged-read URL index over that exact layout +
    ``wet.parquet`` extracted-text conversion records — the Common
    Crawl artifact set for a crawl's fetched log. ``captures`` needs
    (url, bytes, download_time); html payloads feed the WET pass
    through ``harvest.main_text``. Backs the CLI's ``--export-warc``."""
    from . import harvest

    caps = captures.select(
        "url",
        F.coalesce(F.col("bytes"), F.lit(b"")).alias("bytes"),
        "download_time",
    )
    write_warc_segments(caps, os.path.join(out_dir, "segments"))
    cdx_index(caps).write.mode("overwrite").parquet(
        os.path.join(out_dir, "cdx.parquet")
    )
    pages = captures.select(
        "url",
        F.col("bytes").cast("string").alias("html"),
        "download_time",
    )
    wet = wet_records(
        harvest.main_text(pages).join(
            pages.select("url", "download_time"), "url"
        )
    )
    wet.select("url", "record").write.mode("overwrite").parquet(
        os.path.join(out_dir, "wet.parquet")
    )
