"""url_key parity: pure-Python xxhash64 == Spark F.xxhash64 (the oracle
and the engine must derive identical dedup keys; reference analog is
the MD5 request key, request.go:139-145)."""

from pyspark.sql import functions as F

from pholcus_spark.hashing import url_key, xxh64, xxhash64_strings


def test_xxh64_reference_vectors():
    # Published XXH64 test vectors (seed 0): xxhash spec
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_matches_spark_xxhash64(spark):
    rows = [
        ("s", "r", "http://a.example.com/x", "GET"),
        ("spider2", "rule2", "https://b.org/path?q=1&b=2", "POST"),
        ("x", "y", "http://h000.example.com/" + "p" * 100, "HEAD"),
        ("", "", "", ""),
    ]
    df = spark.createDataFrame(
        rows, "spider string, rule string, url string, method string"
    )
    got = df.select(
        F.xxhash64("spider", "rule", "url", "method").alias("h")
    ).collect()
    for row, g in zip(rows, got):
        assert g["h"] == url_key(*row)


def test_chaining_order_matters():
    assert xxhash64_strings("a", "b") != xxhash64_strings("b", "a")
