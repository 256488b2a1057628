"""host_rank power iteration + apply_authority priority folding.

Hand-computed expectations on a 3-node graph with a dangling node —
the case the sf-fixture oracle (all hosts have out-links) never
exercises.
"""

from __future__ import annotations

import pytest

from pholcus_spark import hostrank


def _ranks(df):
    return {r["host"]: r["rank"] for r in df.collect()}


def test_host_rank_hand_computed_with_dangling(spark):
    # a -> b, a -> c, b -> c; c dangles.
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )
    got = _ranks(hostrank.host_rank(edges, iterations=1, round_to=6))

    # One iteration by hand: r0 = 1/3 each; shares a->b .5, a->c .5,
    # b->c 1; dangling mass = r0[c] = 1/3 spread over n=3.
    n, d = 3.0, 0.85
    base = (1.0 - d) / n + d * ((1.0 / 3.0) / n)
    exp = {
        "a": round(base, 6),
        "b": round(base + d * (1.0 / 3.0 * 0.5), 6),
        "c": round(base + d * (1.0 / 3.0 * 0.5 + 1.0 / 3.0), 6),
    }
    assert got == pytest.approx(exp)
    # Total mass is conserved (the dangling completion's whole point).
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_host_rank_mass_conserved_over_iterations(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        ["src", "dst"],
    )
    got = _ranks(hostrank.host_rank(edges, iterations=4, round_to=None))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # c receives from two sources incl. the a->c direct edge; d only
    # holds the teleport floor (no in-links).
    assert got["c"] > got["b"]
    assert min(got, key=got.get) == "d"


def test_host_rank_multi_edges_are_weights(spark):
    # Two a->b edges vs one a->c: b must outrank c.
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")],
        ["src", "dst"],
    )
    got = _ranks(hostrank.host_rank(edges, iterations=3, round_to=None))
    assert got["b"] > got["c"]


def test_apply_authority_bumps_priority(spark):
    ranks = spark.createDataFrame(
        [("big.com", 0.5), ("mid.com", 0.25), ("cold.com", 0.05)],
        ["host", "rank"],
    )
    pending = spark.createDataFrame(
        [
            ("u1", "big.com", 10),
            ("u2", "mid.com", 10),
            ("u3", "cold.com", 10),
            ("u4", "unknown.com", 10),
        ],
        ["url", "host", "priority"],
    )
    out = {
        r["host"]: r["priority"]
        for r in hostrank.apply_authority(pending, ranks, weight=100).collect()
    }
    # floor(rank / 0.5 * 100): 100, 50, 10; unranked host untouched.
    assert out == {
        "big.com": 110,
        "mid.com": 60,
        "cold.com": 20,
        "unknown.com": 10,
    }


def test_engine_host_authority_from_crawl(spark, tmp_store_dir):
    """host_authority over a finished crawl's own link graph: ranks
    sum to 1, every linked host scored, reusable via apply_authority."""
    import tempfile

    from pholcus_spark import synthetic
    from pholcus_spark.crawler import CrawlEngine
    from pholcus_spark.oracle import CrawlConfig
    from pholcus_spark.tables import SnapshotStore

    cfg = CrawlConfig(n_hosts=6, batch_size=32, limit=60)
    eng = CrawlEngine(
        spark, SnapshotStore(tempfile.mkdtemp(dir=tmp_store_dir)), cfg
    )
    eng.run(synthetic.seed_urls(8, cfg.n_hosts))

    ranks = eng.host_authority().collect()
    assert len(ranks) > 0
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-4
    assert all(r["rank"] > 0 for r in ranks)

    # the intended loop: next run's seeds get priority bumps from the
    # previous crawl's authority scores
    seeds = spark.createDataFrame(
        [(r["host"], f"http://{r['host']}/", 1) for r in ranks],
        ["host", "url", "priority"],
    )
    boosted = hostrank.apply_authority(seeds, eng.host_authority())
    by_host = {r["host"]: r["priority"] for r in boosted.collect()}
    top = max(ranks, key=lambda r: r["rank"])["host"]
    assert by_host[top] == 1 + 100  # top host gets the full weight
    assert all(p >= 1 for p in by_host.values())
