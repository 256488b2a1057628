

def test_line_shape_stats_gopher_gates(spark):
    """Shape-gate edges: an all-bullet doc fails the bullet gate; an
    ellipsis-heavy doc fails the ellipsis gate; hash spam fails the
    symbol gate; a numeric dump fails the alpha gate; clean prose
    passes all four."""
    from pyspark.sql import functions as F

    from pholcus_spark import textops

    docs = spark.createDataFrame(
        [
            (1, "clean prose with plenty of normal english words here"),
            (2, "- a\n- b\n- c\n- d"),
            (3, "one real line\nteaser one...\nteaser two…"),
            (4, "# # # # # # # # # # words"),
            (5, "1 2 3 4 5 6 7 8 9 0 word"),
        ],
        "doc_id long, text string",
    )
    s = textops.line_shape_stats(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            *[v.alias(k) for k, v in s.items()],
            textops.line_shape_keep(F.col("text")).alias("keep"),
        ).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["frac_bullet_lines"] == 1.0 and not rows[2]["keep"]
    # 2 of 3 lines end with an ellipsis (one ascii, one unicode)
    assert rows[3]["frac_ellipsis_lines"] == 0.6667 and not rows[3]["keep"]
    assert rows[4]["symbol_word_ratio"] > 0.1 and not rows[4]["keep"]
    assert rows[5]["frac_alpha_words"] == 0.0909 and not rows[5]["keep"]


def test_topk_ngrams_cms_never_undercounts(spark):
    from pholcus_spark import textops

    rows = [(i, f"w{i % 11} x{i % 7} y{i % 5} z{i % 3} q{i % 2}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # width=4 forces heavy collisions: the sketch must OVER-count,
    # never under
    out = textops.topk_ngrams(df, top_k=15, cms_depth=3, cms_width=4
                              ).collect()
    assert len(out) == 15
    assert all(r["cms_est"] >= r["n_occurrences"] for r in out)
    assert all(r["overcount"] == r["cms_est"] - r["n_occurrences"]
               for r in out)
    assert any(r["overcount"] > 0 for r in out)


def test_topk_ngrams_exact_counts_and_tie_order(spark):
    from pholcus_spark import textops

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "z z z")],
        "doc_id long, text string",
    )
    out = textops.topk_ngrams(df, top_k=2, cms_width=4096).collect()
    got = [(r["gram"], r["n_occurrences"], r["overcount"]) for r in out]
    # 'a b c' count 2 wins; the count-1 tie breaks lexicographically
    assert sorted(got)[0][0] in {"a b c"}
    by_gram = dict((g, n) for g, n, _ in got)
    assert by_gram["a b c"] == 2
    assert "a b c" in by_gram and len(by_gram) == 2
    # wide sketch, few grams: no collisions, estimates exact
    assert all(o == 0 for _, _, o in got)


def test_fit_linear_head_recovers_planted_weights(spark):
    from pholcus_spark import textops

    # exact linear relation, no noise: OLS must recover it exactly
    rows = [(i % 13 + 1, (i * 5) % 11 + 1) for i in range(60)]
    data = [(x1, x2, 7 + 3 * x1 - 2 * x2) for x1, x2 in rows]
    df = spark.createDataFrame(data, "x1 long, x2 long, y long")
    r = textops.fit_linear_head(df).collect()[0]
    assert r["n"] == 60
    assert abs(r["w0"] - 7) < 1e-6
    assert abs(r["w1"] - 3) < 1e-6
    assert abs(r["w2"] + 2) < 1e-6
    assert abs(r["mse"]) < 1e-6


def test_fit_linear_head_noise_shrinks_with_signal(spark):
    from pholcus_spark import textops

    # bounded noise: weights near truth, MSE ≈ noise variance
    data = [
        (x1, x2, 3 * x1 - 2 * x2 + (x1 * 7 + x2 * 3) % 5 - 2)
        for x1 in range(1, 21) for x2 in range(1, 21)
    ]
    df = spark.createDataFrame(data, "x1 long, x2 long, y long")
    r = textops.fit_linear_head(df).collect()[0]
    assert abs(r["w1"] - 3) < 0.1 and abs(r["w2"] + 2) < 0.1
    assert 0 < r["mse"] < 4  # noise in [-2,2] → variance ≈ 2


def test_lang_id_multi_profiles_ties_and_unk(spark):
    from pyspark.sql import functions as F

    from pholcus_spark import textops

    rows = [
        ("de", "der die und das ist der die"),
        ("fr", "le la et buffer les dans le"),
        ("zh", "的 是 在 了 和 的"),
        # en base words beat a single foreign marker
        ("en", "the and of is in the and der"),
        # no profile hits anywhere -> unk
        ("unk", "buffer socket kernel"),
        # exact tie (one hit each) breaks to the greater lang string
        ("fr", "der le"),
    ]
    df = spark.createDataFrame(rows, "want string, text string")
    got = df.select(
        "want", textops.lang_id_multi(F.col("text")).alias("pred")
    ).collect()
    for r in got:
        assert r["pred"] == r["want"], r


def test_bpe_fit_classic_example_and_overlap_runs(spark):
    from pholcus_spark import textops

    df = spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest newest widest")],
        "doc_id long, text string",
    )
    out = textops.bpe_fit(df, n_merges=3).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in out]
    # Sennrich's example: 'w e' (newest x4 + lower x2) wins round 1;
    # 'l o' and 's t' tie at 5 and the pair-string order breaks it
    assert got == [(1, "w", "e", 6), (2, "l", "o", 5), (3, "s", "t", 5)]

    # adjacent-overlapping runs merge left-to-right non-overlapping:
    # 'aaaa' under merge (a,a) yields 'aa aa', so round 2 pairs 'aa|aa'
    df2 = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    out2 = textops.bpe_fit(df2, n_merges=2).collect()
    got2 = [(r["rank"], r["merged"], r["pair_count"]) for r in out2]
    assert got2 == [(1, "aa", 6), (2, "aaaa", 2)]


def test_bpe_apply_counts_shrink_and_respect_boundaries(spark):
    from pholcus_spark import textops

    df = spark.createDataFrame(
        [(1, "low low"), (2, "lo w")], "doc_id long, text string"
    )
    # merges learned elsewhere: l+o, lo+w
    out = {r["doc_id"]: r for r in textops.bpe_apply_counts(
        df, [("l", "o"), ("lo", "w")]).collect()}
    # 'low low' -> two 'low' tokens (6 chars before merging)
    assert out[1]["n_tokens_bpe"] == 2
    # word boundary blocks lo+w across 'lo w': stays lo, w
    assert out[2]["n_tokens_bpe"] == 2
    assert out[1]["n_chars"] == 7
    # no merges at all -> pure character count (spaces excluded)
    raw = {r["doc_id"]: r["n_tokens_bpe"] for r in
           textops.bpe_apply_counts(df, []).collect()}
    assert raw[1] == 6 and raw[2] == 3
