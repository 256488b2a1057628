"""Sink surface (S2/S6/S8/S9): golden-shape checks mirroring the
reference's collector tests (collector_test.go:133-360)."""

from __future__ import annotations

import csv
import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from pholcus_spark import sinks


def _items(spark):
    rows = [
        ("page", "http://h1/a", b"\x01\x02", {"k": "v"}, 7),
        ("page", "http://h1/b", b"\x03", None, 8),
        ("root", "http://h2/c", None, {"x": "y"}, 9),
    ]
    return spark.createDataFrame(
        rows,
        "rule string, url string, bytes binary, temp map<string,string>, n int",
    )


def test_write_csv_shape(spark, tmp_store_dir):
    out = os.path.join(tmp_store_dir, "csv")
    sinks.write_csv(_items(spark), out)
    # one dir per rule value (namespace fan-out, output_util.go:8-39)
    assert sorted(
        os.path.basename(p) for p in glob.glob(out + "/rule=*")
    ) == ["rule=page", "rule=root"]
    files = glob.glob(out + "/rule=page/*.csv")
    rows = []
    for p in files:
        with open(p) as f:
            r = csv.DictReader(f)
            rows.extend(r)
    rows.sort(key=lambda x: x["url"])
    assert rows[0]["bytes"] == "0102"  # binary hex-encoded
    assert json.loads(rows[0]["temp"]) == {"k": "v"}  # complex JSON-encoded
    assert rows[0]["n"] == "7"


def test_kafka_frame_shape(spark):
    kf = sinks.kafka_frame(_items(spark), "pholcus")
    rows = kf.collect()
    assert set(kf.columns) == {"topic", "key", "value"}
    topics = {r["topic"] for r in rows}
    assert topics == {"pholcus__page", "pholcus__root"}
    payload = json.loads(
        [r for r in rows if r["topic"] == "pholcus__root"][0]["value"]
    )
    assert payload["url"] == "http://h2/c" and payload["n"] == 9


def test_export_files(spark, tmp_store_dir):
    out = os.path.join(tmp_store_dir, "files")
    df = spark.createDataFrame(
        [("a.bin", b"hello"), ("b.bin", b"world")], "image_id string, bytes binary"
    )
    sinks.export_files(df, out)
    assert open(os.path.join(out, "a.bin"), "rb").read() == b"hello"
    assert open(os.path.join(out, "b.bin"), "rb").read() == b"world"


def test_report(spark):
    rep = {
        r["rule"]: r
        for r in sinks.report(_items(spark), "pholcus").collect()
    }
    assert rep["page"]["n_rows"] == 2 and rep["page"]["n_bytes"] == 3
    assert rep["root"]["n_rows"] == 1 and rep["root"]["n_bytes"] == 0
    assert rep["page"]["namespace"] == "pholcus"


def test_namespaced_keyin_hash(spark):
    df = sinks.namespaced(_items(spark), "spider", keyin="golang")
    ns = df.select("namespace").first()["namespace"]
    assert ns.startswith("spider__") and len(ns) == len("spider__") + 8


def test_mongo_frame_shape(spark):
    rows = sinks.mongo_frame(_items(spark), "pholcus").collect()
    assert {r["collection"] for r in rows} == {"pholcus__page", "pholcus__root"}
    docs = [json.loads(r["doc"]) for r in rows]
    assert all("url" in d for d in docs)
    # deterministic content-hash _id (upsert idempotence)
    import hashlib

    for r in rows:
        assert r["_id"] == hashlib.md5(r["doc"].encode()).hexdigest()


def test_beanstalk_frame_shape(spark):
    rows = sinks.beanstalk_frame(
        _items(spark), "pholcus", priority=5, ttr_s=30
    ).collect()
    assert {r["tube"] for r in rows} == {"pholcus__page", "pholcus__root"}
    assert all(r["pri"] == 5 and r["ttr_s"] == 30 for r in rows)
    assert all(json.loads(r["job"]) for r in rows)


def test_write_excel_roundtrip(spark, tmp_store_dir):
    """Minimal-OOXML workbook: one sheet per rule, header + values,
    readable by unzipping the sheet XML."""
    import re
    import zipfile

    out = os.path.join(tmp_store_dir, "items.xlsx")
    n = sinks.write_excel(_items(spark), out)
    assert n == 3
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
        assert "xl/workbook.xml" in names
        wb = z.read("xl/workbook.xml").decode()
        assert 'name="page"' in wb and 'name="root"' in wb
        sheets = sorted(
            n for n in names if n.startswith("xl/worksheets/sheet")
        )
        assert len(sheets) == 2
        all_text = "".join(z.read(s).decode() for s in sheets)
        cells = re.findall(r"<t>([^<]*)</t>", all_text)
        assert "url" in cells  # header
        assert "http://h2/c" in cells  # value


def test_write_excel_wide_frame_unique_cell_refs(spark, tmp_store_dir):
    """>26 columns must produce base-26 refs (AA, AB, ...), not wrap
    back to 'A' and corrupt the worksheet (ADVICE r2)."""
    import re
    import zipfile

    n_cols = 30
    cols = [f"c{i:02d}" for i in range(n_cols)]
    df = spark.createDataFrame(
        [tuple(["r1"] + [str(i) for i in range(1, n_cols)])],
        ", ".join(f"{c} string" for c in cols),
    ).withColumn("rule", F.lit("wide"))
    path = f"{tmp_store_dir}/wide.xlsx"
    sinks.write_excel(df, path)
    with zipfile.ZipFile(path) as z:
        xml = z.read("xl/worksheets/sheet1.xml").decode()
    refs = re.findall(r'<c r="([A-Z]+)1"', xml)
    assert len(refs) == n_cols
    assert len(set(refs)) == n_cols  # unique
    assert "AA" in refs and "AD" in refs


def test_jdbc_roundtrip_embedded_derby(spark, tmp_store_dir):
    """S4 exercised end-to-end: write items through the JDBC sink into
    embedded Derby (the driver Spark ships for its Hive metastore),
    read them back via spark.read.jdbc, compare (reference
    output_mysql.go:37-87 — table create + batch insert)."""
    url = f"jdbc:derby:{tmp_store_dir}/derby_items;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    items = spark.range(40).select(
        F.col("id").alias("seq"),
        F.concat(F.lit("http://x.example.com/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("cap "), F.col("id").cast("string")).alias("caption"),
    )
    sinks.jdbc_writer(items, url, "items", driver=driver).save()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "items")
        .option("driver", driver)
        .load()
    )
    got = {(r["seq"], r["url"], r["caption"]) for r in back.collect()}
    exp = {(r["seq"], r["url"], r["caption"]) for r in items.collect()}
    assert got == exp
    # append mode adds, never clobbers
    sinks.jdbc_writer(items.limit(5), url, "items", driver=driver).save()
    assert back.count() == 45


def test_write_excel_total_row_tripwire(spark, tmp_store_dir):
    """Pointing the Excel sink at a crawl-table-sized frame must fail
    loudly (it is a driver-side funnel by design), not iterate for
    hours."""
    big = spark.range(200).select(
        F.lit("r").alias("rule"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="max_total_rows"):
        sinks.write_excel(big, f"{tmp_store_dir}/big.xlsx",
                          max_total_rows=100)


def test_jdbc_history_inherit_roundtrip(spark, tmp_store_dir):
    """S4 history READ path (history.go:106-156): a finished crawl's
    seen set exported to Derby, read back with jdbc_reader (partitioned
    range scan), imported into a FRESH store via import_seen — the new
    run admits nothing it inherited, and dropping the inherited history
    (success_inherit=False) makes the full crawl admissible again."""
    import os

    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.schemas import URL_SEEN_SCHEMA
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set

    url = f"jdbc:derby:{tmp_store_dir}/derby_hist;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    cfg = CrawlConfig(n_hosts=8, batch_size=12, limit=60)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)

    eng_a = CrawlEngine(
        spark, SnapshotStore(os.path.join(tmp_store_dir, "a")), cfg
    )
    eng_a.run(seeds)
    seen_a = url_seen_set(eng_a)
    assert seen_a
    sinks.jdbc_writer(
        eng_a.load("url_seen", URL_SEEN_SCHEMA), url, "url_seen",
        driver=driver,
    ).save()

    hist = sinks.jdbc_reader(
        spark, url, "url_seen", driver=driver,
        partition_column="url_key",
        lower_bound=min(seen_a), upper_bound=max(seen_a) + 1,
        num_partitions=4,
    )
    assert hist.rdd.getNumPartitions() == 4  # parallel range scan
    # import into an empty store FIRST, then push the seeds — they must
    # dedup against the inherited history at admission time
    eng_c = CrawlEngine(
        spark, SnapshotStore(os.path.join(tmp_store_dir, "c")), cfg
    )
    eng_c.bootstrap([])  # empty bootstrap commits an empty snapshot
    eng_c.import_seen(hist.select("url_key"))
    eng_c.start_new_run(seeds)
    eng_c.run()
    # every inherited URL was refused admission: no visit overlaps A
    visited_c = {
        r["url_key"] for r in eng_c.fetched_df().select("url_key").collect()
    }
    assert not (visited_c & seen_a)
    # dropping the inherited history re-admits everything
    eng_c.start_new_run(seeds, success_inherit=False)
    eng_c.run()
    assert url_seen_set(eng_c) >= seen_a


def test_warc_roundtrip(spark, tmp_store_dir):
    import glob
    import os

    from pholcus_spark.sinks import read_warc_file, write_warc

    rows = [
        ("http://h.test/a", bytearray(b"\x89PNG-payload"), "2024-05-01 10:00:00"),
        ("http://h.test/b", bytearray(b""), "2024-05-01 10:00:01"),
        ("http://h.test/c", None, "2024-05-01 10:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "url string, bytes binary, download_time string"
    ).coalesce(1)
    out = os.path.join(tmp_store_dir, "warc")
    write_warc(df, out)

    segs = glob.glob(os.path.join(out, "seg-*.warc"))
    assert len(segs) == 1
    recs = read_warc_file(segs[0])
    assert len(recs) == 3
    by_uri = {r["headers"]["WARC-Target-URI"]: r for r in recs}
    assert by_uri["http://h.test/a"]["body"] == b"\x89PNG-payload"
    assert by_uri["http://h.test/b"]["body"] == b""
    assert by_uri["http://h.test/c"]["body"] == b""  # NULL payload coalesces
    a = by_uri["http://h.test/a"]["headers"]
    assert a["WARC-Type"] == "resource"
    assert a["WARC-Date"] == "2024-05-01T10:00:00Z"
    assert a["WARC-Record-ID"].startswith("<urn:pholcus:")
    assert int(a["Content-Length"]) == len(b"\x89PNG-payload")


def test_warc_export_is_idempotent(spark, tmp_store_dir):
    import glob
    import os

    from pholcus_spark.sinks import write_warc

    df = spark.createDataFrame(
        [("http://h.test/x", bytearray(b"abc"), "2024-01-01 00:00:00")],
        "url string, bytes binary, download_time string",
    ).coalesce(1)
    out = os.path.join(tmp_store_dir, "warc2")
    write_warc(df, out)
    seg = glob.glob(os.path.join(out, "seg-*.warc"))[0]
    first = open(seg, "rb").read()
    write_warc(df, out)  # re-export overwrites the same segment
    assert glob.glob(os.path.join(out, "seg-*.warc")) == [seg]
    assert open(seg, "rb").read() == first


def test_read_warc_distributed_roundtrip(spark, tmp_store_dir):
    import os

    from pholcus_spark.sinks import read_warc, write_warc

    rows = [
        (f"http://h{i % 4}.test/p{i}", bytearray(f"payload-{i}".encode()),
         "2024-03-01 00:00:00")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "url string, bytes binary, download_time string"
    ).repartition(4)
    out = os.path.join(tmp_store_dir, "warc_rt")
    write_warc(df, out)

    back = read_warc(spark, os.path.join(out, "seg-*.warc"))
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 40
    for i in range(40):
        url = f"http://h{i % 4}.test/p{i}"
        assert bytes(got[url]["body"]) == f"payload-{i}".encode()
        assert got[url]["n_bytes"] == len(f"payload-{i}")
        assert got[url]["warc_date"] == "2024-03-01T00:00:00Z"
        assert got[url]["record_id"].startswith("<urn:pholcus:")
    # the read is distributed: one input partition per segment file
    assert back.rdd.getNumPartitions() >= 1


def test_cdx_index_matches_segment_bytes(spark, tmp_store_dir):
    """The CDX index's (segment, offset, record_len) triples must agree
    byte-for-byte with the files write_warc_segments lands: a ranged
    read at each offset parses exactly one record with the row's url,
    and each file's size equals its record_len sum. Also: the layout is
    deterministic under different input partitioning."""
    from pholcus_spark.sinks import (
        _parse_warc_bytes,
        cdx_index,
        write_warc_segments,
    )

    rows = [
        (f"http://s{i % 3}.h{i % 5}.test/d/{i}",
         bytearray((b"x" * (i % 17)) + f"payload-{i}".encode()),
         "2024-03-01 00:00:00")
        for i in range(50)
    ]
    schema = "url string, bytes binary, download_time string"
    df = spark.createDataFrame(rows, schema).repartition(7)
    out = os.path.join(tmp_store_dir, "cdx_segs")
    write_warc_segments(df, out, n_segments=4)

    idx = cdx_index(df, n_segments=4).collect()
    assert len(idx) == 50
    assert all(r["ts"] == "20240301000000" for r in idx)
    assert idx[0]["surt"].startswith("test,")
    per_seg: dict[str, int] = {}
    for r in idx:
        data = open(os.path.join(out, r["segment"]), "rb").read()
        recs = _parse_warc_bytes(
            data[r["offset"]:r["offset"] + r["record_len"]]
        )
        assert len(recs) == 1
        assert recs[0]["headers"]["WARC-Target-URI"] == r["url"]
        per_seg[r["segment"]] = per_seg.get(r["segment"], 0) + r["record_len"]
    for seg, tot in per_seg.items():
        assert os.path.getsize(os.path.join(out, seg)) == tot

    # deterministic: a single-partition input produces the same index
    idx2 = cdx_index(
        spark.createDataFrame(rows, schema).coalesce(1), n_segments=4
    ).collect()
    assert sorted(map(tuple, idx)) == sorted(map(tuple, idx2))


def test_warc_revisit_records_dedup_and_framing(spark):
    from pholcus_spark import sinks

    rows = [
        ("http://a/1", b"same bytes", "2024-01-01 00:00:00"),
        ("http://a/2", b"same bytes", "2024-01-02 00:00:00"),
        ("http://b/1", b"unique", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(b), t) for u, b, t in rows],
        "url string, bytes binary, download_time string",
    )
    got = {r["url"]: r for r in
           sinks.warc_revisit_records(df).collect()}
    assert got["http://a/1"]["record_type"] == "resource"
    assert got["http://a/1"]["refers_to"] is None
    rev = got["http://a/2"]
    assert rev["record_type"] == "revisit"
    assert rev["refers_to"] == "http://a/1"
    assert rev["digest"] == got["http://a/1"]["digest"]
    assert got["http://b/1"]["record_type"] == "resource"
    # revisit records carry NO payload body
    raw = bytes(rev["record"]).decode()
    assert "WARC-Type: revisit" in raw
    assert "Content-Length: 0" in raw and "same bytes" not in raw
    assert "WARC-Refers-To: <urn:pholcus:" in raw
    full = bytes(got["http://a/1"]["record"])
    assert b"same bytes" in full
    assert len(full) == got["http://a/1"]["record_len"]
    assert len(bytes(rev["record"])) == rev["record_len"]


def test_wet_records_structure(spark):
    from pholcus_spark import sinks

    df = spark.createDataFrame(
        [("http://x/page", "Extracted body text.", "2024-06-01 12:00:00")],
        "url string, main_text string, download_time string",
    )
    r = sinks.wet_records(df).collect()[0]
    raw = bytes(r["record"]).decode()
    assert raw.startswith("WARC/1.0\r\n")
    assert "WARC-Type: conversion" in raw
    assert "WARC-Refers-To: <urn:pholcus:" in raw
    assert "WARC-Target-URI: http://x/page" in raw
    assert "Content-Type: text/plain" in raw
    assert "WARC-Date: 2024-06-01T12:00:00Z" in raw
    assert raw.endswith("Extracted body text.\r\n\r\n")
    assert r["text_bytes"] == len("Extracted body text.")
    assert r["record_len"] == len(bytes(r["record"]))
    # the conversion record's own id differs from the capture id it
    # refers to (same url, different namespace salt)
    rid = raw.split("WARC-Record-ID: <urn:pholcus:")[1][:16]
    ref = raw.split("WARC-Refers-To: <urn:pholcus:")[1][:16]
    assert rid != ref


def test_export_warc_bundle_artifacts(spark, tmp_path):
    from pholcus_spark import sinks

    rows = [
        ("http://a/1", b"<html><body><p>" + b"content one " * 20
         + b"</p></body></html>", "2024-01-01 00:00:00"),
        ("http://b/2", b"<html><body><p>" + b"content two " * 20
         + b"</p></body></html>", "2024-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(b), t) for u, b, t in rows],
        "url string, bytes binary, download_time string",
    )
    out = str(tmp_path / "bundle")
    sinks.export_warc_bundle(df, out)
    import glob
    import os

    segs = glob.glob(os.path.join(out, "segments", "*.warc"))
    assert segs
    blob = b"".join(open(f, "rb").read() for f in segs)
    assert blob.count(b"WARC/1.0") == 2 and b"content one" in blob
    cdx = spark.read.parquet(os.path.join(out, "cdx.parquet"))
    assert cdx.count() == 2
    # every CDX row's (offset, len) seek re-parses to a WARC header
    for r in cdx.collect():
        seg = open(os.path.join(out, "segments", r["segment"]), "rb").read()
        rec = seg[r["offset"]:r["offset"] + r["record_len"]]
        assert rec.startswith(b"WARC/1.0")
        assert r["url"].encode() in rec
    wet = spark.read.parquet(os.path.join(out, "wet.parquet"))
    assert wet.count() == 2
    raw = bytes(wet.collect()[0]["record"])
    assert b"WARC-Type: conversion" in raw and b"<html" not in raw


def test_mongo_history_inherit_roundtrip(spark, tmp_store_dir):
    """S5 history READ path (history.go:161-264, the mgo inherit
    branch): a finished crawl's seen set exported as mongo-shaped
    success documents, read back with mongo_reader (collection filter
    + doc parse), imported into a FRESH store via import_seen — the
    inherit matrix must behave exactly like the Derby/JDBC twin: the
    new run admits nothing it inherited, and success_inherit=False
    re-admits everything. A malformed document is skipped, not fatal
    (history.go:185-189)."""
    import os

    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.schemas import URL_SEEN_SCHEMA
    from pholcus_spark.tables import SnapshotStore
    from tests.helpers import url_seen_set

    cfg = CrawlConfig(n_hosts=8, batch_size=12, limit=60)
    seeds = synthetic.seed_urls(6, cfg.n_hosts)

    eng_a = CrawlEngine(
        spark, SnapshotStore(os.path.join(tmp_store_dir, "a")), cfg
    )
    eng_a.run(seeds)
    seen_a = url_seen_set(eng_a)
    assert seen_a

    mongo_dir = os.path.join(tmp_store_dir, "mongo_success")
    sinks.write_mongo_shaped(
        eng_a.load("url_seen", URL_SEEN_SCHEMA)
        .withColumn("rule", F.lit("success")),
        mongo_dir,
        "pholcus",
    )
    # plant one malformed document — the reader must skip it like the
    # reference's UnSerialize-error continue
    with open(os.path.join(mongo_dir, "malformed.json"), "w") as f:
        f.write(
            '{"collection": "pholcus__success", "_id": "bad",'
            ' "doc": "{not json"}\n'
        )

    hist = sinks.mongo_reader(
        spark, mongo_dir, collection="pholcus__success",
        doc_schema="url_key long",
    )
    keys = hist.select(F.col("fields.url_key").alias("url_key")).where(
        F.col("url_key").isNotNull()
    )
    assert {r["url_key"] for r in keys.collect()} == seen_a
    # the other-collection filter actually filters
    assert sinks.mongo_reader(
        spark, mongo_dir, collection="pholcus__other"
    ).count() == 0

    eng_c = CrawlEngine(
        spark, SnapshotStore(os.path.join(tmp_store_dir, "c")), cfg
    )
    eng_c.bootstrap([])
    eng_c.import_seen(keys)
    eng_c.start_new_run(seeds)
    eng_c.run()
    visited_c = {
        r["url_key"] for r in eng_c.fetched_df().select("url_key").collect()
    }
    assert not (visited_c & seen_a)
    # dropping the inherited history re-admits everything
    eng_c.start_new_run(seeds, success_inherit=False)
    eng_c.run()
    assert url_seen_set(eng_c) >= seen_a
