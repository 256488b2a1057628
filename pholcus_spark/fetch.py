"""Vectorized fetch + decode + parse — the D1/D3/D4/P1-P3 surface as
one Arrow-batched ``mapInPandas`` pass over the round's dispatch batch.

Reference path being reproduced: ``crawler.Process`` (download →
ctx.Parse → item/link emission, ``app/crawler/crawler.go:112-174``)
with Surf's retry loop (``surfer/surf.go:180-194``: ≤ TryTimes
attempts). One UDF pass per round — fetch, pixel decode, phash, caption
and child-link extraction happen on the executor without a second
shuffle of the payload bytes.

No per-row Python UDFs: the plan-side API is mapInPandas (Arrow
batches); the per-URL loop inside is the sandbox's stand-in for network
I/O (a real fetcher would run an async HTTP client over the same batch).
"""

from __future__ import annotations

import sys
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd

from pyspark.sql import DataFrame

from . import synthetic
from .dom import dom_first, dom_select
from .forms import submit_form
from .jsrules import JsError, JsParseCtx, run_js
from .oracle import instance_keyin
from .schemas import FETCH_RESULT_SCHEMA
from .urlnorm import canonicalize


def fetch_batch(
    batch: DataFrame,
    rules: dict[tuple[str, str], dict],
    n_hosts: int,
    try_times_default: int = 3,
    failure_pct: int = synthetic.FAILURE_PCT,
    px_scale: int = 1,
    cookies: DataFrame | None = None,
    n_part_hint: int | None = None,
    n_rows: int | None = None,
    min_part_rows: int = 8,
) -> DataFrame:
    """Run the fetch/parse UDF over a dispatch batch.

    ``rules`` maps (spider, rule) -> {child_rule, max_depth, priority}
    (the declarative RuleTree, reference spider.go:48-59) and is
    closure-captured → shipped once per task, broadcast-style.

    ``cookies`` (COOKIES_SCHEMA rows, or None when EnableCookie is off)
    is the per-(spider, host) jar as of the round start — a dimension
    table in the politeness class (bounded by hosts × spiders, not by
    frontier size), broadcast-joined onto the batch so each request
    carries its jar slice (Surf attaches the spider's jar per request,
    surfer/param.go:47-108).
    """
    sess = batch.sparkSession
    bc_rules = sess.sparkContext.broadcast(rules)

    if cookies is not None:
        from pyspark.sql import functions as F

        jar = cookies.groupBy("spider", "host").agg(
            F.map_from_entries(
                F.collect_list(F.struct("name", "value"))
            ).alias("jar")
        )
        batch = batch.join(F.broadcast(jar), ["spider", "host"], "left")
    else:
        from pyspark.sql import functions as F

        batch = batch.withColumn(
            "jar",
            F.lit(None).cast("map<string,string>"),
        )

    # Emit output frames in bounded chunks: payload rows can be tens of
    # KB each, and a full input batch's worth of images in one pandas
    # frame (hundreds of MB × one per worker) stalls the Arrow pipe and
    # the JVM heap. ~64 images per frame keeps in-flight memory flat.
    out_chunk = 64

    def _fetch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rules_map = bc_rules.value
        cols = [f.name for f in FETCH_RESULT_SCHEMA.fields]

        for pdf in pdf_iter:
            out_rows = []
            for row in pdf.itertuples(index=False):
                tries = int(row.try_times or try_times_default)
                base_attempt = int(row.attempt) * tries
                jar = dict(row.jar) if row.jar else None
                rule_cfg = rules_map.get((row.spider, row.rule), {})
                # D2 downloader dispatch (downloader_surfer.go:35-74):
                # rules marked downloader="chrome" route through the JS
                # renderer — same fetch surface, rendered content.
                # A per-REQUEST DownloaderID (JsAddQueue,
                # request.go:37,53-63) travels in temp["__downloader"]
                # and wins over the rule default.
                dl = (row.temp or {}).get("__downloader") or rule_cfg.get(
                    "downloader", "surf"
                )
                res = None
                for i in range(tries):
                    res = synthetic.fetch_one(
                        row.url, int(row.depth), base_attempt + i, n_hosts,
                        failure_pct, px_scale,
                        method=row.method, post_data=row.post_data,
                        cookies=jar, downloader=dl,
                    )
                    if res.ok:
                        break
                child_rule = rule_cfg.get("child_rule")
                max_depth = rule_cfg.get("max_depth", 0)
                caption = res.caption
                child_urls = res.links
                form_req = None
                outs = None
                js_queued: list[dict] = []
                if res.ok and rule_cfg.get("js_parse") is not None:
                    # P8 dynamic rule: run the compiled <Script> body
                    # over the page (parsejs.go:121-133); Output cells
                    # land in ``outs``, JsAddQueue children in links.
                    page = synthetic.html_page_for(
                        row.url, int(row.depth), n_hosts,
                        method=row.method, post_data=row.post_data,
                        cookies=jar, downloader=dl,
                    )
                    jctx = JsParseCtx(
                        page, row.url, instance_keyin(row.spider),
                        temp=dict(row.temp) if row.temp else None,
                        method=row.method, rule=row.rule,
                        spider=row.spider,
                    )
                    try:
                        run_js(rule_cfg["js_parse"], {"ctx": jctx})
                    except JsError as exc:
                        # parsejs.go:126-130: a script runtime error is
                        # logged and the parse keeps whatever the script
                        # emitted before failing; the fetch itself stays
                        # successful (DoHistory records success). Never
                        # let one page's script kill the Spark task.
                        print(
                            f"dynamic rule [ParseFunc] {row.url}: {exc}",
                            file=sys.stderr,
                        )
                    outs = jctx.outputs or None
                    js_queued = jctx.queued
                if res.ok and res.image_id is not None and (
                    rule_cfg.get("parse") == "dom"
                ):
                    # selector-driven rule (D4): the page body is HTML;
                    # caption and child links come from CSS selection
                    # over the parsed DOM (GetDom().Find analog,
                    # context.go:612-627) — NOT from the fetch result.
                    # Fidelity vs the oracle (which uses the direct
                    # values) proves the extraction is lossless.
                    page = synthetic.html_page_for(
                        row.url, int(row.depth), n_hosts,
                        method=row.method, post_data=row.post_data,
                        cookies=jar, downloader=dl,
                    )
                    caption = dom_first(page, "div#main h1#caption", "text")
                    child_urls = dom_select(
                        page, "div#main ul.children a.child", "attr:href"
                    )
                    form_cfg = rule_cfg.get("form")
                    if form_cfg is not None:
                        # P9 form rule (Form.Submit, form.go:81-140):
                        # scrape the page's form, apply the rule's
                        # input overrides, and enqueue the submit
                        # request as a child (AddQueue with
                        # method/post_data).
                        form_req = submit_form(
                            page, row.url,
                            form_cfg.get("selector", "form"),
                            form_cfg.get("inputs"),
                            form_cfg.get("button"),
                        )
                links = []
                if res.ok and child_rule is not None and row.depth < max_depth:
                    child_prio = rule_cfg.get("child_priority", 0)
                    for link in child_urls:
                        cu = canonicalize(link)
                        if cu:
                            links.append(
                                {"url": cu, "rule": child_rule,
                                 "priority": child_prio,
                                 "method": None, "post_data": None,
                                 "downloader": None, "try_times": None}
                            )
                if form_req is not None and res.ok:
                    fcu = canonicalize(form_req["url"])
                    form_cfg = rule_cfg["form"]
                    if fcu and row.depth < rule_cfg.get("max_depth", 0):
                        links.append(
                            {
                                "url": fcu,
                                "rule": form_cfg.get("rule", row.rule),
                                "priority": form_cfg.get("priority", 0),
                                "method": form_req["method"],
                                "post_data": form_req["post_data"],
                                "downloader": None,
                                "try_times": None,
                            }
                        )
                for q in js_queued:
                    # explicit AddQueue requests are depth-independent
                    # (the reference gates only on dedup/budget,
                    # context.go:104-125); relative URLs — including
                    # protocol-relative and query-only forms — resolve
                    # against the page like MakeUrl (RFC 3986 urljoin)
                    qu = q["url"]
                    if not qu:
                        continue
                    cu = canonicalize(urljoin(row.url, qu))
                    if cu:
                        links.append(
                            {
                                "url": cu,
                                "rule": q["rule"] or row.rule,
                                "priority": q["priority"],
                                "method": q["method"],
                                "post_data": q["post_data"],
                                "downloader": q["downloader"],
                                # JsAddQueue TryTimes (request.go:48):
                                # NULL = inherit the parent's
                                "try_times": q.get("try_times"),
                            }
                        )
                out_rows.append(
                    {
                        "url_key": row.url_key,
                        "url": row.url,
                        "host": row.host,
                        "spider": row.spider,
                        "rule": row.rule,
                        "method": row.method,
                        "priority": row.priority,
                        "depth": row.depth,
                        "seq": row.seq,
                        "round_enqueued": row.round_enqueued,
                        "parent_url": row.parent_url,
                        "temp": row.temp,
                        "headers": row.headers,
                        "post_data": row.post_data,
                        "reloadable": row.reloadable,
                        "try_times": row.try_times,
                        "attempt": row.attempt,
                        "ok": res.ok,
                        "error": res.error,
                        "image_id": res.image_id,
                        "bytes": res.payload,
                        "w": res.w,
                        "h": res.h,
                        "fmt": res.fmt,
                        "caption": caption,
                        "phash": res.phash,
                        "links": links,
                        "outs": outs,
                        "set_cookies": res.set_cookies,
                        "proxy": getattr(row, "proxy", None),
                    }
                )
                if len(out_rows) >= out_chunk:
                    yield pd.DataFrame(out_rows, columns=cols)
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)

    # Repartition the batch across executors so fetch parallelism =
    # cluster width. 4x the shuffle width: per-URL fetch+decode cost
    # varies (payload sizes differ), so several short waves of tasks
    # smooth stragglers that a single wave of cluster-width tasks
    # cannot (~20% wall on skewed batches).
    n_part = 4 * int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    if n_part_hint:
        # caller-sized (see run_round: targets bounded rows/bytes per
        # partition so parquet writers and Arrow buffers stay small);
        # never below the 4x-wave floor
        n_part = max(n_part, int(n_part_hint))
    if n_rows is not None:
        # exact batch size known (run_round counts the cached batch):
        # never schedule more tasks than ~n_rows/min_part_rows — a
        # politeness-bound round of ~30 URLs otherwise pays 4x-width
        # (128 at local[32]) near-empty tasks plus a 128-file scratch
        # write that every downstream consumer re-reads. Large batches
        # are unaffected (the row bound exceeds the wave floor).
        n_part = min(n_part, max(1, -(-int(n_rows) // max(min_part_rows, 1))))
    return batch.repartition(n_part, "url_key").mapInPandas(
        _fetch, FETCH_RESULT_SCHEMA
    )


def links_to_candidates(results: DataFrame) -> DataFrame:
    """Explode parsed child links into enqueue candidates (P3 →
    AddQueue, reference context.go:104-125): inherit spider, fresh
    GET method, auto-Referer header from parent, depth+1, deterministic cand_order =
    (parent seq, link index) for the FIFO tie-break."""
    from pyspark.sql import functions as F

    exploded = results.filter(F.col("ok")).select(
        "spider",
        "url",
        "depth",
        "seq",
        "temp",
        "try_times",
        F.posexplode_outer("links").alias("link_idx", "link"),
    )
    # cand_order: lexicographic (parent_seq, link_idx) packed into one
    # long — parents emit ≤ 2^20 links so (seq << 20) | idx is ordered.
    return exploded.filter(F.col("link").isNotNull()).select(
        F.col("link.url").alias("url"),
        F.regexp_extract("link.url", r"^[a-z]+://([^/:]+)", 1).alias("host"),
        "spider",
        F.col("link.rule").alias("rule"),
        # child links are fresh GET requests with an auto-Referer from
        # the parent (context.go:141-207); POST bodies never inherit —
        # except form-submit children (P9), which carry the form's own
        # method + encoded body
        F.coalesce(F.col("link.method"), F.lit("GET")).alias("method"),
        F.col("link.priority").alias("priority"),
        (F.col("depth") + 1).cast("int").alias("depth"),
        F.col("url").alias("parent_url"),
        # temp passes through (P5) — except __downloader, which is
        # per-REQUEST (request.go:37): children carry their own link
        # downloader or none, never the parent's
        F.when(
            F.col("link.downloader").isNotNull(),
            F.map_concat(
                F.map_filter(
                    F.coalesce(
                        F.col("temp"),
                        F.create_map().cast("map<string,string>"),
                    ),
                    lambda k, _v: k != F.lit("__downloader"),
                ),
                F.create_map(
                    F.lit("__downloader"), F.col("link.downloader")
                ),
            ),
        )
        .otherwise(
            F.map_filter(F.col("temp"), lambda k, _v: k != F.lit("__downloader"))
        )
        .alias("temp"),
        F.create_map(F.lit("Referer"), F.array(F.col("url"))).alias("headers"),
        F.col("link.post_data").alias("post_data"),
        F.lit(False).alias("reloadable"),
        # JsAddQueue TryTimes wins; other children inherit the parent's
        F.coalesce(F.col("link.try_times"), F.col("try_times")).alias(
            "try_times"
        ),
        (F.shiftleft(F.col("seq"), 20) + F.col("link_idx")).alias("cand_order"),
    )
