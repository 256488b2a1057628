"""Host-authority ranking for frontier prioritization.

The reference crawler dequeues purely by (priority, FIFO)
(matrix.go:101-124); at web scale a crawler additionally wants
*importance-ordered* crawling — spend the politeness budget on hosts
the link graph says matter (OPIC / PageRank-style frontier ordering,
Cho et al. "Efficient Crawling Through URL Ordering"). This module
adds that as an opt-in layer: compute a damped power-iteration
authority score over the observed host→host link graph, then fold it
into the frontier's integer ``priority`` before enqueue, so the
reference's dequeue order contract (``select_batch``) is untouched.

Scale shape (the point): the raw link stream is corpus-sized, but the
FIRST operation collapses it to the weighted host graph —
``groupBy(src, dst).count()`` with map-side partial aggregation — and
every later step runs on host-graph-sized data (hosts ≪ pages; the
whole graph for a 10^10-page frontier is ~10^7 hosts). Each power
iteration is ONE shuffle of (host, contribution) pairs; the dangling
mass and host count ride along as 1-row broadcast aggregates, so no
per-iteration driver action and no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 3


def host_rank(
    edges: DataFrame,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    round_to: int | None = 6,
) -> DataFrame:
    """Damped power-iteration authority over a host link graph.

    ``edges`` is the raw (src, dst) link stream — duplicates are
    weights, self-links allowed. Returns ``(host, rank)`` for every
    host that appears on either side; ranks sum to 1 (dangling mass is
    redistributed uniformly, the standard PageRank completion).

    ``round_to`` rounds the final score for cross-engine hash parity
    (the oracle recomputes the same unrolled iterations in DuckDB;
    double-precision sums agree far past 6 decimals but not to the
    last ulp). Pass ``None`` for raw doubles.

    Plan: weighted-graph collapse (1 shuffle, map-side combine), then
    per iteration one (dst-keyed) shuffle over host-graph-sized rows +
    two 1-row broadcast crossJoins. Iterations are fixed and small
    (authority ordering needs coarse scores, not convergence); for
    deep runs callers should ``localCheckpoint`` every ~8 rounds as
    ``dedup.star_components`` does.
    """
    w = edges.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    outdeg = w.groupBy("src").agg(F.sum("cnt").alias("out"))
    hosts = (
        w.select(F.col("src").alias("host"))
        .union(w.select(F.col("dst").alias("host")))
        .distinct()
    )
    # Host count as a 1-row frame: stays lazy, broadcasts into every
    # iteration — no driver round-trip.
    n1 = hosts.agg(F.count("*").alias("n_hosts"))

    we = w.join(outdeg, "src").select(
        "src", "dst", (F.col("cnt") / F.col("out")).alias("share")
    )
    dangling = hosts.join(
        outdeg.select(F.col("src").alias("host")), "host", "left_anti"
    )

    ranks = hosts.crossJoin(F.broadcast(n1)).select(
        "host", (F.lit(1.0) / F.col("n_hosts")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            we.join(ranks, we["src"] == ranks["host"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("c"))
        )
        dm1 = dangling.join(ranks, "host").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            hosts.join(contrib, hosts["host"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dm1))
            .select(
                "host",
                (
                    (1.0 - damping) / F.col("n_hosts")
                    + damping
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.col("n_hosts")
                    )
                ).alias("rank"),
            )
        )
    if round_to is not None:
        ranks = ranks.select("host", F.round("rank", round_to).alias("rank"))
    return ranks


def apply_authority(
    pending: DataFrame,
    ranks: DataFrame,
    weight: int = 100,
) -> DataFrame:
    """Fold authority into the frontier's integer ``priority``.

    Hosts score a bump of ``floor(rank / max_rank * weight)`` —
    scale-free (the top host gets +weight regardless of graph size),
    integer (the frontier's priority column and the reference's
    dequeue contract stay intact), and broadcast-joined (ranks are
    host-graph-sized). Unranked hosts keep their priority.
    """
    top = ranks.agg(F.max("rank").alias("max_rank"))
    boost = ranks.crossJoin(F.broadcast(top)).select(
        "host",
        F.floor(F.col("rank") / F.col("max_rank") * weight)
        .cast("int")
        .alias("boost"),
    )
    return (
        pending.join(F.broadcast(boost), "host", "left")
        .withColumn(
            "priority",
            F.col("priority") + F.coalesce(F.col("boost"), F.lit(0)),
        )
        .drop("boost")
    )
