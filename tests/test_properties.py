"""Property-based invariants (hypothesis): the cross-engine rounding
formula and the as-of join, checked over generated inputs rather than
fixtures."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st


# rnd() must agree with DuckDB's FLOOR((x)*1eN + 0.5)/1eN evaluated on
# the same doubles — validate the python-level formula equivalence that
# both engines compile to.
@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_portable_round_formula_is_engine_agnostic(x, n):
    import duckdb

    scale = float(10**n)
    py = math.floor(x * scale + 0.5) / scale
    # CAST: duckdb parses bare decimal literals as DECIMAL(18), which
    # overflows; our oracles always operate on DOUBLE columns
    duck = duckdb.sql(
        f"SELECT FLOOR(CAST({x!r} AS DOUBLE) * {scale} + 0.5) / {scale}"
    ).fetchone()[0]
    assert py == duck


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=30,
    ),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=20),
)
@settings(max_examples=20, deadline=None)
def test_asof_join_matches_naive_python(spark_global, right_rows, left_rows):
    """asof_join == per-row 'latest right at-or-before' linear scan."""
    from quack_reduce_spark.operators.asof import asof_join

    spark = spark_global
    base = dt.datetime(2024, 1, 1)
    left = [(k, base + dt.timedelta(seconds=s)) for k, s in left_rows]
    right = [
        (k, base + dt.timedelta(seconds=s), float(v)) for k, s, v in right_rows
    ]
    # dedupe right on (k, ts) keeping max v — the operator's documented
    # contract requires unique right timestamps per key
    dedup: dict = {}
    for k, ts, v in right:
        dedup[(k, ts)] = max(v, dedup.get((k, ts), float("-inf")))
    right = [(k, ts, v) for (k, ts), v in dedup.items()]

    ldf = spark.createDataFrame(left, "k int, ts timestamp")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, v double") if right else None
    if rdf is None:
        return
    out = asof_join(ldf, rdf, ["k"], "ts", "ts", ["v"]).collect()

    def naive(k, ts):
        cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        return max(cands)[1] if cands else None

    assert len(out) == len(left)
    for row in out:
        assert row["v_asof"] == naive(row["k"], row["ts"])


# hypothesis can't use function-scoped pytest fixtures; expose the
# session-scoped spark fixture under a stable name
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40),
        min_size=2,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_jaccard_pairs_bounded_and_symmetric(spark_global, texts):
    """n-gram Jaccard: 0 < j <= 1, doc1 < doc2, and identical docs with
    >= n tokens always pair at j == 1."""
    from quack_reduce_spark.operators.dedup import ngram_jaccard_pairs

    spark = spark_global
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", n=2, threshold=0.0).collect()
    for r in pairs:
        assert r["doc1"] < r["doc2"]
        assert 0.0 < r["jaccard"] <= 1.0
    got = {(r["doc1"], r["doc2"]): r["jaccard"] for r in pairs}
    for i, a in enumerate(rows):
        for j in range(i + 1, len(rows)):
            b = rows[j]
            if a[1] == b[1] and len(a[1].split()) >= 2 and a[1].strip():
                toks = [t for t in a[1].split() if t]
                if len(toks) >= 2:
                    assert got.get((a[0], b[0])) == 1.0


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=60))
@settings(max_examples=40, deadline=None)
def test_rolling_hash_matches_python_fold(spark_global, text):
    """JVM rolling hash == the same fold computed in plain Python."""
    import pyspark.sql.functions as F

    from quack_reduce_spark.functions.text import (
        ROLLING_BASE,
        ROLLING_MOD,
        ROLLING_SEED,
        rolling_hash,
    )

    spark = spark_global
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(rolling_hash(F.col("text")).alias("rh")).collect()[0]["rh"]
    want = ROLLING_SEED
    for ch in text:
        want = (want * ROLLING_BASE + ord(ch)) % ROLLING_MOD
    assert got == want


def test_chunk_windows_cover_all_tokens_no_gaps(spark):
    # every token index must be covered by >= 1 chunk; consecutive
    # chunks overlap by exactly CHUNK_TOKENS - CHUNK_STRIDE tokens
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_windows,
    )

    sf = "/root/testdata/sf0.001"
    chunks = text_chunk_windows(spark, sf)
    from quack_reduce_spark.inventory._util import load

    docs = load(spark, sf, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok")
    )
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("n_chunk_tokens").alias("sum_chunk_tok"),
            F.max("chunk_idx").alias("max_idx"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    for r in agg:
        assert r["n_chunks"] == r["max_idx"] + 1
        # total chunked tokens = n_tok + overlap * (n_chunks - 1)
        overlap_total = sum(
            min(CHUNK_TOKENS, r["n_tok"] - i * CHUNK_STRIDE)
            for i in range(r["n_chunks"])
        )
        assert r["sum_chunk_tok"] == overlap_total


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=30,
    ),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=20),
)
@settings(max_examples=20, deadline=None)
def test_asof_forward_matches_naive_python(spark_global, right_rows, left_rows):
    """direction='forward' == per-row 'earliest right at-or-after'."""
    from quack_reduce_spark.operators.asof import asof_join

    spark = spark_global
    base = dt.datetime(2024, 1, 1)
    left = [(k, base + dt.timedelta(seconds=s)) for k, s in left_rows]
    right = [(k, base + dt.timedelta(seconds=s), float(v)) for k, s, v in right_rows]
    dedup: dict = {}
    for k, ts, v in right:
        dedup[(k, ts)] = max(v, dedup.get((k, ts), float("-inf")))
    right = [(k, ts, v) for (k, ts), v in dedup.items()]

    ldf = spark.createDataFrame(left, "k int, ts timestamp")
    if not right:
        return
    rdf = spark.createDataFrame(right, "k int, ts timestamp, v double")
    out = asof_join(ldf, rdf, ["k"], "ts", "ts", ["v"], direction="forward").collect()

    def naive(k, ts):
        cands = [(rts, v) for rk, rts, v in right if rk == k and rts >= ts]
        return min(cands)[1] if cands else None

    assert len(out) == len(left)
    for row in out:
        assert row["v_asof"] == naive(row["k"], row["ts"])


@given(
    st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=20)
)
@settings(max_examples=15, deadline=None)
def test_pack_windows_matches_naive_simulation(spark_global, counts):
    """Concat-and-chunk packing math vs a direct python simulation:
    window count, boundary-straddling docs, and final fill must agree
    for arbitrary per-doc token counts."""
    import pyspark.sql.functions as F

    import quack_reduce_spark.inventory.text3 as t3

    spark = spark_global
    rows = [
        (i, " ".join(["t"] * n), "en", "sX", 0) for i, n in enumerate(counts)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    real_load = t3.load
    t3.load = lambda spark, sf_dir, name: docs
    try:
        [r] = t3.text_pack_windows(spark, "_").collect()
    finally:
        t3.load = real_load

    W = t3.PACK_WINDOW
    total = sum(counts)
    boundary = 0
    pos = 0
    for n in counts:
        if pos // W != (pos + n - 1) // W:
            boundary += 1
        pos += n
    assert r["total_tokens"] == total
    assert r["n_windows"] == -(-total // W)
    assert r["n_boundary_docs"] == boundary
    assert r["final_window_fill"] == ((total - 1) % W) + 1


# PNG codec: encode->decode must be the identity for every 8-bit image
# shape/channel-count the codec claims, under arbitrary pixel content
# (all five scanline filters participate once height >= 5).
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_identity(w, h, ch, seed):
    import numpy as np

    from quack_reduce_spark.multimodal.png import decode_png, encode_png

    arr = np.random.RandomState(seed).randint(0, 256, (h, w, ch)).astype(np.uint8)
    gw, gh, mode, back = decode_png(encode_png(arr))
    assert (gw, gh) == (w, h)
    assert mode == {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[ch]
    assert (back == arr).all()


# WAV codec: synthesize->decode returns the exact synthesis parameters
# (RMS/peak of a square wave are its amplitude, exactly, in float64).
@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=32767),
    st.sampled_from([8000, 16000, 44100]),
    st.sampled_from([1, 2]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_parameters(n_samples, amplitude, rate, channels):
    import numpy as np

    from quack_reduce_spark.multimodal.codec import decode_wav, synthesize_wav

    got_rate, got_ch, samples = decode_wav(
        synthesize_wav(n_samples, amplitude, sample_rate=rate, n_channels=channels)
    )
    assert (got_rate, got_ch) == (rate, channels)
    assert len(samples) == n_samples * channels
    assert int(np.max(np.abs(samples))) == amplitude
    x = samples.astype("float64")
    assert float(np.sqrt(np.mean(x * x))) == float(amplitude)


def test_md5_bucket_matches_python_hashlib_on_tricky_strings(spark):
    """The portable-oracle keystone: Spark's conv(substring(md5(s),1,8),16,10)
    must equal Python's int(md5(utf8(s)).hexdigest()[:8], 16) for any
    string — unicode, whitespace, empties, long runs — because every
    portable split/fold/LSH derivation assumes all three engines hash
    identical bytes."""
    import hashlib

    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory.mlprep import _md5_bucket

    cases = [
        "", " ", "a", "hello world", "naïve café", "日本語テキスト",
        "emoji 🤖🚀", "tab\tsep", "new\nline", "x" * 10_000,
        "0", "-1", "3.14159", "NULL", "None",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r["s"]: r["b"]
        for r in df.select("s", _md5_bucket(F.col("s"), 1_000_003).alias("b")).collect()
    }
    for c in cases:
        want = int(hashlib.md5(c.encode("utf-8")).hexdigest()[:8], 16) % 1_000_003
        assert got[c] == want, (c, got[c], want)


def test_md5_bucket_matches_duckdb_on_random_strings(spark):
    """Differential keystone, DuckDB side: random printable strings
    through Spark and DuckDB's CAST('0x'||substring(md5(s),1,8) AS
    BIGINT) land in identical buckets."""
    import random
    import string

    import duckdb
    import pyspark.sql.functions as F

    from quack_reduce_spark.inventory.mlprep import _md5_bucket

    rng = random.Random(17)
    cases = [
        "".join(rng.choices(string.printable.strip() + " ", k=rng.randint(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r["s"]: r["b"]
        for r in df.select("s", _md5_bucket(F.col("s"), 4096).alias("b")).collect()
    }
    con = duckdb.connect()
    for c in cases:
        want = con.execute(
            "SELECT CAST('0x' || substring(md5(?), 1, 8) AS BIGINT) % 4096", [c]
        ).fetchone()[0]
        assert got[c] == want, (c, got[c], want)
