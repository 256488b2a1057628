"""Conditional revisits: validator join, 304 merge, store refresh
(revalidate.py) + the fetcher-side 304 path (httpfetch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pholcus_spark import revalidate as RV


def _validators(spark):
    return spark.createDataFrame(
        [(1, "et-1", "lm-1", 101), (2, "et-2", None, 102),
         (9, "et-9", "lm-9", 109)],  # 9 is not in the batch
        "url_key long, etag string, last_modified string, "
        "fingerprint long",
    )


def _candidates(spark):
    return spark.createDataFrame(
        [(1, "u1"), (2, "u2"), (3, "u3")], "url_key long, url string")


def test_conditional_headers_flags(spark):
    got = {r["url_key"]: r for r in RV.conditional_headers(
        _candidates(spark), _validators(spark)).collect()}
    assert got[1]["is_conditional"] and got[1]["etag"] == "et-1"
    assert got[1]["cached_fp"] == 101
    # Last-Modified missing but ETag present is still conditional
    assert got[2]["is_conditional"] and got[2]["last_modified"] is None
    # first visit: nothing stored
    assert not got[3]["is_conditional"] and got[3]["etag"] is None


def test_merge_and_store_refresh(spark):
    # url 1 changed (200 + new validators), url 2 unchanged (304,
    # NULL payload from the server), url 3 first visit (200)
    results = spark.createDataFrame(
        [(1, "u1", 200, "et-1b", "lm-1b", 201),
         (2, "u2", 304, None, None, None),
         (3, "u3", 200, "et-3", "lm-3", 203)],
        "url_key long, url string, status int, etag string, "
        "last_modified string, fingerprint long",
    )
    merged, store = RV.merge_revalidated(results, _validators(spark))
    m = {r["url_key"]: r for r in merged.collect()}
    assert (m[1]["fingerprint"], m[1]["from_cache"]) == (201, False)
    # the 304 recovered the STORED fingerprint and validators
    assert (m[2]["fingerprint"], m[2]["etag"], m[2]["from_cache"]) == (
        102, "et-2", True)
    assert (m[3]["fingerprint"], m[3]["from_cache"]) == (203, False)
    s = {r["url_key"]: r for r in store.collect()}
    assert s[1]["etag"] == "et-1b"          # 200 overwrites
    assert s[2]["etag"] == "et-2"           # 304 carries forward
    assert s[3]["etag"] == "et-3"           # first visit enters
    assert s[9]["etag"] == "et-9"           # outside the batch persists
    assert len(s) == 4


def test_unchanged_path_joins_only_304_slice(spark):
    """The store join must sit under a status=304 filter — payload
    rows for 200s never shuffle into it."""
    results = spark.createDataFrame(
        [(1, "u1", 200, "e", "l", 1)],
        "url_key long, url string, status int, etag string, "
        "last_modified string, fingerprint long",
    )
    merged, _ = RV.merge_revalidated(results, _validators(spark))
    opt = merged._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in opt
    assert opt.count("Join") == 1
    # the filter is pushed below the join's left side
    join_at = opt.index("Join")
    assert "= 304" in opt[join_at:]


def test_fetcher_304_is_clean_success():
    from tests.test_httpfetch import _FakeNet, _ok

    net = _FakeNet([_ok(body=b"", status=304)])
    f = net.fetcher()
    resp = f.request(
        "http://h.example.com/p",
        headers={"If-None-Match": ["et-1"],
                 "If-Modified-Since": ["lm-1"]},
        try_times=3,
    )
    assert resp.status == 304 and resp.body == b""
    [call] = net.calls  # one attempt: 304 is success, never retried
    assert call["headers"]["If-None-Match"] == ["et-1"]
    assert call["headers"]["If-Modified-Since"] == ["lm-1"]
    assert net.slept == []
