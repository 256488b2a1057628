

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
