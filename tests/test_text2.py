"""Quality-gate operators: crafted edge cases the fixture corpus
doesn't exercise (the oracle covers the fixtures; these pin the
boundary semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _gate(spark, rows):
    from quack_reduce_spark.inventory import text2

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.createOrReplaceTempView("__t2docs")
    # run the same pipeline as text_gopher_quality over crafted docs
    tstats, bstats = text2._doc_token_frames(df)
    from quack_reduce_spark.functions.numeric import rnd

    top_frac = rnd(F.col("top_c") / F.col("n_bigrams"), 4)
    out = (
        tstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (
                (F.col("n_words") >= text2.MIN_WORDS)
                & (F.col("n_words") <= text2.MAX_WORDS)
                & (F.col("mean_word_len") >= text2.MIN_MEAN_WORD_LEN)
                & (F.col("mean_word_len") <= text2.MAX_MEAN_WORD_LEN)
                & (F.coalesce(top_frac <= text2.MAX_TOP_BIGRAM_FRAC, F.lit(False)))
            ).alias("accept"),
        )
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_single_word_doc_rejected_not_errored(spark):
    # one token -> zero bigrams -> top_bigram_frac NULL -> accept False
    rows = [(1, "word", "en", "s", 4)]
    out = _gate(spark, rows)
    assert out[1]["n_words"] == 1 and out[1]["accept"] is False


def test_repetitive_doc_rejected_good_doc_accepted(spark):
    good = " ".join(f"tok{i % 17} word{i % 13}" for i in range(40))  # 80 varied words
    spammy = "buy now " * 60  # one bigram dominates
    rows = [(1, good, "en", "s", len(good)), (2, spammy.strip(), "en", "s", len(spammy))]
    out = _gate(spark, rows)
    assert out[1]["accept"] is True
    assert out[2]["accept"] is False
