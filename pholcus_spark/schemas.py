"""Engine table schemas (FIXTURES.md §1-7; reference data model SURVEY.md §1).

Static Spark schemas replacing the reference's dynamic, runtime-grown
row maps (``app/pipeline/collector/data/data.go:16-21``,
``app/spider/spider.go:92-100``): per-rule ItemFields are declared
config-time, the crawl tables below are fixed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# frontier — the Request work-item table
# (reference app/downloader/request/request.go:20-43 + Matrix status maps
#  app/scheduler/matrix.go:18-30 folded into one `status` column)
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("spider", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("round_enqueued", T.IntegerType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("temp", T.MapType(T.StringType(), T.StringType()), True),
        # request headers + POST body (reference request.go:24-31
        # Header http.Header = map[string][]string / PostData; values
        # are arrays so repeated headers (Accept, Set-Cookie style)
        # survive losslessly)
        T.StructField(
            "headers",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            True,
        ),
        T.StructField("post_data", T.StringType(), True),
        T.StructField("reloadable", T.BooleanType(), False),
        T.StructField("try_times", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

# images — payload table, exactly the BASELINE.json input_hint shape
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# url_seen — persistent success-history set
# (reference app/aid/history/success.go:16-23)
URL_SEEN_SCHEMA = T.StructType([T.StructField("url_key", T.LongType(), False)])

# seen_sketch — per-bucket serialized bloom filters (SURVEY.md §4 custom #1)
SEEN_SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("sketch", T.BinaryType(), False),
    ]
)

# failures — failed-request store (reference app/aid/history/failure.go:18-24)
FAILURES_SCHEMA = T.StructType(
    FRONTIER_SCHEMA.fields
    + [
        T.StructField("fail_round", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

# politeness — per-host budgets (north-rule addition; reference analog is a
# single global randomized pause, app/crawler/crawler.go:53-59)
POLITENESS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("max_per_round", T.IntegerType(), False),
    ]
)

# rules — declarative crawl-rule config (reference spider.go:48-59 RuleTree)
RULES_SCHEMA = T.StructType(
    [
        T.StructField("spider", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("item_fields", T.ArrayType(T.StringType()), True),
        T.StructField("child_rule", T.StringType(), True),
        T.StructField("max_depth", T.IntegerType(), False),
    ]
)

# rounds — per-partition lineage/metrics (north rule; reference analog
# cache.Report, runtime/cache/cache.go:34-42)
ROUNDS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("pulled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("deduped", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("items", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
    ]
)

# items — DataCell output rows (reference data.go:37-45 fixed keys +
# per-rule dynamic fields folded into the images payload columns)
ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("rule", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("download_time", T.StringType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# fetch UDF output (D1/D3/D4 surface)
FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url_key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("spider", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("round_enqueued", T.IntegerType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("temp", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "headers",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            True,
        ),
        T.StructField("post_data", T.StringType(), True),
        T.StructField("reloadable", T.BooleanType(), False),
        T.StructField("try_times", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType(), False),
                        T.StructField("rule", T.StringType(), False),
                        T.StructField("priority", T.IntegerType(), False),
                        # form-submit children (P9, form.go:104-140)
                        # carry their own method + body; plain <a> links
                        # leave these NULL (→ GET, no body)
                        T.StructField("method", T.StringType(), True),
                        T.StructField("post_data", T.StringType(), True),
                        # per-request renderer from JsAddQueue's
                        # DownloaderID (request.go:37,53-63); NULL =
                        # the target rule's default
                        T.StructField("downloader", T.StringType(), True),
                        # JsAddQueue TryTimes (request.go:48); NULL =
                        # inherit the parent's retry budget
                        T.StructField("try_times", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
        # JS-rule Output cells (parsejs.go:121-133 → ctx.Output,
        # context.go:244-280): dynamic key→value rows, NULL for
        # declarative rules
        T.StructField(
            "outs",
            T.ArrayType(T.MapType(T.StringType(), T.StringType())),
            True,
        ),
        # Set-Cookie headers the response carried (reference Surf jar
        # feed, surfer/param.go:47-108); merged into the cookies table
        # at round commit
        T.StructField(
            "set_cookies", T.MapType(T.StringType(), T.StringType()), True
        ),
        # proxy the request was routed through (F12,
        # app/aid/proxy/proxy.go:141-197); NULL when no pool configured
        T.StructField("proxy", T.StringType(), True),
    ]
)

# cookies — per-(spider, host) cookie-jar state (reference: Surf keeps
# a cookie jar per spider across requests, surfer/param.go:47-108;
# EnableCookie inherited per request, request.go:28 +
# context.go:110-112). Engine semantics are snapshot-consistent at
# round boundaries: cookies set by round N's responses apply to rounds
# > N (the micro-batch serialization of the reference's sequential jar,
# same adaptation as the politeness budget).
COOKIES_SCHEMA = T.StructType(
    [
        T.StructField("spider", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)
