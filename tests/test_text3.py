"""Corpus-assembly operators (inventory/text3.py): handcrafted cases
pin the semantics; plan tests pin the scale shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def tiny_docs(spark):
    # doc 0 is the "eval" doc (doc_id % 25 == 0); doc 26 copies an
    # 8-gram from it verbatim; doc 27 shares only shorter overlaps
    eight = "a b c d e f g h"
    rows = [
        (0, eight + " tail words here", "en", "s0", 0),
        (26, "prefix " + eight + " suffix", "en", "s0", 0),
        (27, "a b c d e f g DIFFERENT and more padding text", "en", "s1", 0),
        (28, "totally unrelated content with enough words to matter", "en", "s1", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _with_docs(monkeypatch, df):
    import quack_reduce_spark.inventory.text3 as t3

    monkeypatch.setattr(t3, "load", lambda spark, sf_dir, name: df)
    return t3


def test_decontaminate_exact_8gram_rule(spark, tiny_docs, monkeypatch):
    t3 = _with_docs(monkeypatch, tiny_docs)
    out = {r["source"]: r for r in t3.text_decontaminate(spark, "_").collect()}
    # doc 26 contaminated (verbatim 8-gram), docs 27/28 clean
    assert out["s0"]["n_docs"] == 1 and out["s0"]["n_contaminated"] == 1
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_contaminated"] == 0
    assert out["s0"]["contamination_rate"] == 1.0


def test_decontaminate_is_broadcast_semi_join(spark, sf_dir):
    from quack_reduce_spark.inventory.text3 import text_decontaminate

    plan = (
        text_decontaminate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_pack_windows_boundary_math(spark, monkeypatch):
    # three docs of 1500 tokens each in one source, window=2048:
    # totals 4500 -> 3 windows; doc2 spans w0/w1 (start 1500, last 2999),
    # doc3 spans w1/w2 (start 3000, last 4499); final fill = 4500-4096
    rows = [
        (i, " ".join(["tok"] * 1500), "en", "sA", 0) for i in (1, 2, 3)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t3 = _with_docs(monkeypatch, docs)
    [r] = t3.text_pack_windows(spark, "_").collect()
    assert r["total_tokens"] == 4500
    assert r["n_windows"] == 3
    assert r["n_boundary_docs"] == 2
    assert r["final_window_fill"] == 404


def test_mixture_weights_upsample_small_sources(spark, monkeypatch):
    # alpha=0.5: a source with 4x the tokens gets only 2x the weight
    rows = [
        (1, " ".join(["x"] * 400), "en", "big", 0),
        (2, " ".join(["x"] * 100), "en", "small", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t3 = _with_docs(monkeypatch, docs)
    out = {r["source"]: r for r in t3.text_mixture_weights(spark, "_").collect()}
    assert out["big"]["n_tokens"] == 400 and out["small"]["n_tokens"] == 100
    assert abs(out["big"]["weight"] / out["small"]["weight"] - 2.0) < 1e-4
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-5


def test_lm_score_prefers_common_tokens(spark, monkeypatch):
    # a doc of corpus-frequent tokens must score lower NLL than a doc
    # of singletons
    rows = [
        (1, "common common common common", "en", "freq", 0),
        (2, "rare1 rare2 rare3 rare4", "en", "rare", 0),
        (3, "common common common common", "en", "freq", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t3 = _with_docs(monkeypatch, docs)
    out = {r["source"]: r["mean_nll"] for r in t3.text_lm_score(spark, "_").collect()}
    assert out["freq"] < out["rare"]


def test_registry_exposes_text3_with_oracles():
    from quack_reduce_spark.inventory import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    for k in (
        "text_decontaminate",
        "text_lm_score",
        "text_mixture_weights",
        "text_pack_windows",
    ):
        assert k in qs and k in os_


def test_epoch_order_is_partitioning_invariant_and_balanced(spark, monkeypatch):
    # the epoch shuffle must assign identical (shard, position) no
    # matter how the input is physically partitioned, and shards must
    # be roughly balanced
    import pyspark.sql.functions as F

    import quack_reduce_spark.inventory.text3 as t3

    rows = [(i, "x", "en", "s", 0) for i in range(1000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t3_load = t3.load
    try:
        t3.load = lambda spark, sf_dir, name: docs
        a = sorted(map(tuple, t3.text_epoch_order(spark, "_").collect()))
        t3.load = lambda spark, sf_dir, name: docs.repartition(17)
        b = sorted(map(tuple, t3.text_epoch_order(spark, "_").collect()))
    finally:
        t3.load = t3_load
    assert a == b
    sizes = {}
    for _, shard, _pos in a:
        sizes[shard] = sizes.get(shard, 0) + 1
    assert len(sizes) == t3.EPOCH_SHARDS
    assert max(sizes.values()) < 2.2 * min(sizes.values())  # hash balance
    # the order is a permutation: positions within a shard are 1..n
    for shard, n in sizes.items():
        poss = sorted(p for _, s, p in a if s == shard)
        assert poss == list(range(1, n + 1))


def test_pack_assignments_conserve_tokens_and_fill_windows(spark, monkeypatch):
    # the assignment fan-out must conserve every token exactly: sums per
    # doc equal doc lengths, sums per window equal 2048 (except the
    # final ragged window), and a boundary doc splits correctly
    import quack_reduce_spark.inventory.text3 as t3

    rows = [(i, " ".join(["t"] * 1500), "en", "sA", 0) for i in (1, 2, 3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t3_load = t3.load
    try:
        t3.load = lambda spark, sf_dir, name: docs
        out = t3.text_pack_assignments(spark, "_").collect()
    finally:
        t3.load = t3_load
    per_doc = {}
    per_win = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens_in_window"]
        per_win[r["window_idx"]] = per_win.get(r["window_idx"], 0) + r["n_tokens_in_window"]
    assert per_doc == {1: 1500, 2: 1500, 3: 1500}
    assert per_win == {0: 2048, 1: 2048, 2: 4500 - 4096}
    # doc 2 splits 548/952 across windows 0/1
    d2 = sorted(
        (r["window_idx"], r["n_tokens_in_window"]) for r in out if r["doc_id"] == 2
    )
    assert d2 == [(0, 548), (1, 952)]
