"""ANN banding: corpus-sized signature widths and banded recall."""

from __future__ import annotations

from pholcus_spark import ann


def test_band_bits_for_scales_with_corpus():
    assert ann.band_bits_for(1_000) == 1
    assert ann.band_bits_for(100_000, 1024) == 7
    assert ann.band_bits_for(10**10, 1024) == 24  # ~1k-row buckets at 10^10
    # widening the target loosens the width
    assert ann.band_bits_for(10**10, 2**20) == 14


def test_banded_neardup_catches_planted_pairs(spark):
    """Planted near-identical vectors must surface through the banded
    candidate stage and survive the exact verify; far pairs must not."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for i in range(200):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, v))
    # plant 10 clones: id+1000 with one sign flip (cos ~= 1 - 2/16)
    for i in range(0, 100, 10):
        v = list(rows[i][1])
        v[3] = -v[3]
        rows.append((i + 1000, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann.banded_cosine_neardup(
        df, threshold=0.8, band_bits=6, n_bands=4
    ).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in out}

    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    vecs = dict(rows)
    eligible = {
        (i, i + 1000)
        for i in range(0, 100, 10)
        if cos(vecs[i], vecs[i + 1000]) >= 0.8
    }
    assert len(eligible) >= 6  # the fixture actually plants hard pairs
    # banding is probabilistic per pair but deterministic given the
    # fixed planes: the large majority of eligible pairs must come back
    assert len(got & eligible) >= len(eligible) - 1
    # the exact verify stage is authoritative: every emitted pair truly
    # clears the threshold (candidates below it were killed)
    for r in out:
        a, b = vecs[r["vec_a"]], vecs[r["vec_b"]]
        assert cos(a, b) >= 0.8 - 1e-4


def test_codebook_literal_roundtrips_doubles_exactly(spark):
    """_codebook_lit ships the codebook through generated SQL text;
    repr(float) must round-trip bit-exact through the JVM parser,
    including shortest-repr artifacts, subnormals, and exponents."""
    vals = [
        1e-05,
        -3.4028234663852886e38,
        0.30000000000000004,
        5e-324,
        -0.0,
        123456789.123456789,
    ]
    cents = [(0, vals), (3, [-v for v in vals])]
    row = spark.range(1).select(ann._codebook_lit(cents).alias("cb")).first()
    got = {-e["nid"]: list(e["v"]) for e in row["cb"]}
    assert got[0] == vals
    assert got[3] == [-v for v in vals]


def test_sign_matrix_path_matches_md5_path(spark):
    """dim-typed bucket_id must be bit-identical to the generic
    md5-per-element path across plane counts and band offsets."""
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(i, [((i * 7 + j * 13) % 17 - 8) / 8.0 for j in range(12)])
         for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    for n_planes, off in [(8, 0), (5, 3), (16, 32)]:
        bad = (
            emb.select(
                ann.bucket_id(F.col("embedding"), n_planes, off).alias("a"),
                ann.bucket_id(
                    F.col("embedding"), n_planes, off, dim=12
                ).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .count()
        )
        assert bad == 0, (n_planes, off)


def test_fixed_dim_queries_take_literal_sign_path(spark):
    """The registered embedding queries run over a fixed-width corpus,
    so their physical plans must carry the precomputed sign matrix —
    no per-element md5 in the signature hot path."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(i, [float((i + j) % 5) for j in range(8)]) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    for df in (
        ann.lsh_bucketed_topk(emb, n_queries=4, k=2, n_planes=4),
        ann.banded_cosine_neardup(emb, band_bits=3, n_bands=2),
    ):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(True)
        assert "md5" not in buf.getvalue(), "signature fell back to md5 path"


def test_kmeans_separates_planted_clusters(spark):
    """Three well-separated blobs must come out as three distinct
    k-means labels, and semantic_dedup must drop exactly the planted
    in-cluster near-duplicates."""
    import random

    rng = random.Random(11)
    anchors = {
        0: [5.0 if d == 0 else 0.1 for d in range(8)],
        1: [5.0 if d == 3 else 0.1 for d in range(8)],
        2: [5.0 if d == 6 else 0.1 for d in range(8)],
    }
    rows = []
    for i in range(90):
        a = anchors[i % 3]
        rows.append((i, [x + rng.uniform(-0.2, 0.2) for x in a]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ann.kmeans_centroids(df, k=3, iters=2)
    assert len(cents) == 3
    assigned = ann.kmeans_assign(df, cents).collect()
    # every blob maps to one label and the labels are distinct
    by_blob = {}
    for r in assigned:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3


def test_semantic_dedup_drops_only_near_duplicates(spark):
    """Exact clones with a higher id are dropped; the lowest id of each
    clone group and all singletons are kept."""
    import random

    rng = random.Random(23)
    rows = []
    for i in range(60):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))
    # ids 1000/1001 clone vec 0; id 2000 clones vec 5
    rows.append((1000, list(rows[0][1])))
    rows.append((1001, list(rows[0][1])))
    rows.append((2000, list(rows[5][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["kept"] for r in
           ann.semantic_dedup(df, k=2, iters=1, tau=0.999).collect()}
    assert out[0] and out[5]
    assert not out[1000] and not out[1001] and not out[2000]
    # nothing else in this random corpus clears tau=0.999
    assert sum(1 for v in out.values() if not v) == 3


def test_pq_codes_and_adc_recall(spark):
    """PQ encode + ADC search: codes are valid codeword indices, exact
    clones encode identically, the ADC distance matches a numpy
    recompute, and a planted clone scores the minimum possible ADC
    distance for its query."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ]
    # exact clones of the first 4 vectors (the query set)
    rows += [(1000 + i, list(rows[i][1])) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    m, ks = 4, 8
    cbs = ann.pq_codebooks(df, m=m, ks=ks)
    assert len(cbs) == m and all(len(s) == ks for s in cbs)
    sub = len(cbs[0][0])
    assert sub == 4

    from pyspark.sql import functions as F

    coded = {
        r["vec_id"]: r["codes"]
        for r in df.select(
            "vec_id",
            ann.pq_codes(F.col("embedding"), ann._pq_codebook_lit(cbs), sub)
            .alias("codes"),
        ).collect()
    }
    assert all(
        len(c) == m and all(0 <= x < ks for x in c) for c in coded.values()
    )
    for i in range(4):  # exact clone -> identical codes
        assert coded[i] == coded[1000 + i]

    out = ann.pq_adc_topk(df, n_queries=4, k=5, m=m, ks=ks).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    vecs = {i: [float(x) for x in v] for i, v in rows}
    for qid, hits in by_q.items():
        assert [r["rank"] for r in sorted(hits, key=lambda r: r["rank"])] == [
            1, 2, 3, 4, 5
        ]
        # numpy-free recompute: adist = sum_mm l2sq(q_sub, cw[code_mm])
        q = vecs[qid]

        def adc(nid):
            s = 0.0
            for mm in range(m):
                cw = cbs[mm][coded[nid][mm]]
                s += sum(
                    (q[mm * sub + t] - cw[t]) ** 2 for t in range(sub)
                )
            return round(s, 4)

        for r in hits:
            assert abs(r["adc_dist"] - adc(r["neighbor_id"])) < 1e-9
        # the exact clone's codes equal the query's own, so its ADC
        # distance is the minimum achievable for this query
        clone_d = adc(1000 + qid)
        assert min(r["adc_dist"] for r in hits) == clone_d


def test_ivfadc_residual_encoding_and_recall(spark):
    """IVFADC: clones land in the same list with identical residual
    codes, scores match a driver recompute, and the planted clone
    scores the per-query minimum ADC distance."""
    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ]
    rows += [(1000 + i, list(rows[i][1])) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = ann.ivfadc_topk(
        df, n_queries=3, k=4, n_lists=4, n_probe=2, m=4, ks=8
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}

    # driver recompute of the whole IVFADC pipeline
    vecs = {i: [float(x) for x in v] for i, v in rows}
    coarse = ann.ivf_centroids(df, 4)
    cvecs = [v for _c, v in coarse]
    assign = {i: ann._assign_py(v, cvecs) for i, v in vecs.items()}
    res = {
        i: [x - c for x, c in zip(v, cvecs[assign[i]])]
        for i, v in vecs.items()
    }
    sample = ann.ivf_centroids(df, 8)
    res_sample = [
        [float(x) - c for x, c in zip(v, cvecs[ann._assign_py(v, cvecs)])]
        for _c, v in sample
    ]
    sub = 4
    cbs = [
        [r_[mm * sub : (mm + 1) * sub] for r_ in res_sample]
        for mm in range(4)
    ]

    def code_of(i):
        out_ = []
        for mm in range(4):
            rsub = res[i][mm * sub : (mm + 1) * sub]
            best = min(
                range(8),
                key=lambda j: (
                    sum((a - b) ** 2 for a, b in zip(rsub, cbs[mm][j])),
                    j,
                ),
            )
            out_.append(best)
        return out_

    def adc(qid, nid):
        qres = res[qid]  # probing the clone's own list: same centroid
        s = 0.0
        for mm in range(4):
            cw = cbs[mm][code_of(nid)[mm]]
            s += sum(
                (qres[mm * sub + t] - cw[t]) ** 2 for t in range(sub)
            )
        return round(s, 4)

    for qid, hits in by_q.items():
        clone = 1000 + qid
        assert assign[clone] == assign[qid]  # same coarse list
        assert code_of(clone) == code_of(qid)  # identical residual codes
        got_min = min(r["adc_dist"] for r in hits)
        assert abs(got_min - adc(qid, clone)) < 1e-9


def test_linear_head_gate_matches_python(spark):
    """Engine head score equals a plain-Python recompute of the
    integer-weight, micro-unit-rounded dot product."""
    from decimal import Decimal, ROUND_HALF_UP

    from pholcus_spark import ann

    vecs = [
        (0, [0.5, -0.25, 0.125, 1.0]),
        (1, [-1.0, -1.0, -1.0, -1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in ann.linear_head_gate(df).collect()}

    def score(vals):
        tot = 0
        for i, x in enumerate(vals):
            w = (i * 37 + 11) % 21 - 10
            term = float(np_float32(x)) * w * 1e6
            tot += int(Decimal(term).quantize(0, rounding=ROUND_HALF_UP))
        return tot

    import numpy as np

    def np_float32(x):
        return np.float32(x)

    for vid, vals in vecs:
        assert got[vid]["head_score_u"] == score(vals), vid
        assert got[vid]["keep"] == (score(vals) >= 0)


def test_recall_at_k_bounds_and_planted(spark):
    """recall_milli is in [0, 1000]; a degenerate 1-plane index (two
    buckets) finds most true neighbors, and the integer arithmetic
    matches a Python recompute of |approx ∩ exact| / k."""
    from pholcus_spark import ann

    embeds = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    rows = ann.recall_at_k(embeds, n_queries=5, k=3).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] == 3
        assert 0 <= r["n_hit"] <= 3
        assert r["recall_milli"] == r["n_hit"] * 1000 // 3


def test_truncated_rerank_full_overfetch_equals_exact(spark):
    from pholcus_spark import ann

    embeds = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = embeds.count()
    # overfetch covering the whole corpus -> stage 1 prunes nothing,
    # so the result must EQUAL exact brute force
    exact = ann.brute_force_topk(embeds, n_queries=5, k=3).collect()
    two = ann.truncated_rerank_topk(
        embeds, n_queries=5, k=3, prefix_dim=8, overfetch=(n // 3) + 1
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])  # noqa: E731
    assert sorted(key(r) for r in exact) == sorted(key(r) for r in two)


def test_truncated_rerank_cos_is_full_dim(spark):
    from pholcus_spark import ann

    embeds = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = ann.truncated_rerank_topk(
        embeds, n_queries=3, k=3, prefix_dim=8, overfetch=4
    ).collect()
    # within a query, final ranking follows full-dim cos_sim even when
    # the prefix order disagreed
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_bq_codes_pack_sign_bits(spark):
    from pholcus_spark import ann

    vec = [1.0 if i % 3 == 0 else -1.0 for i in range(64)]
    df = spark.createDataFrame([(0, vec)],
                               "vec_id long, embedding array<double>")
    r = ann.bq_codes(df).collect()[0]
    hi = sum(1 << (31 - i) for i in range(32) if i % 3 == 0)
    lo = sum(1 << (31 - i) for i in range(32) if (i + 32) % 3 == 0)
    assert r["bq_hi"] == hi and r["bq_lo"] == lo


def test_bq_rerank_full_overfetch_equals_exact(spark):
    from pholcus_spark import ann

    embeds = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = embeds.count()
    exact = ann.brute_force_topk(embeds, n_queries=5, k=3).collect()
    bq = ann.bq_rerank_topk(
        embeds, n_queries=5, k=3, overfetch=(n // 3) + 1
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])  # noqa: E731
    assert sorted(key(r) for r in exact) == sorted(key(r) for r in bq)
