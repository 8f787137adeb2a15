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
    # An arbitrary float must reach DuckDB as a QUOTED STRING cast:
    # a BARE literal — even inside CAST(... AS DOUBLE) — first parses
    # as DECIMAL, and DuckDB's DECIMAL->DOUBLE conversion is not
    # correctly rounded (1-ulp error for e.g. 900719926.0078125, found
    # by hypothesis). The string->double parse IS correctly rounded,
    # which is the pairing the oracles rely on (their few embedded
    # constants are exactness-audited dyadics/integers; 1eN scientific
    # literals parse as DOUBLE directly).
    duck = duckdb.sql(
        f"SELECT FLOOR(CAST('{x!r}' AS DOUBLE) * 1e{n} + 0.5) / 1e{n}"
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


# ---------------------------------------------------------------------------
# round 8: hash-family diversity battery (the MinHash-degeneracy
# postmortem, VERDICT r7 "What's wrong #2"). The pre-r7 MinHash
# permutation family was monotone — every permutation picked the same
# argmin — and ordinary fixture tests only caught it when a fixture
# pair happened to expose it. Each hash family below gets a
# STATISTICAL property that a monotone / correlated / skewed family
# cannot pass. All md5-based checks are fully deterministic (fixed
# token sets); numpy draws are seeded — these either pass forever or
# fail forever.

import hashlib

import numpy as np

from quack_reduce_spark.operators.dedup import MINHASH_P, _perm_consts


def _minhash_agreement(perm, set_a, set_b):
    """Fraction of permutations on which min-hash(A) == min-hash(B)."""
    agree = 0
    for a, b in perm:
        ma = min((a * h + b) % MINHASH_P for h in set_a)
        mb = min((a * h + b) % MINHASH_P for h in set_b)
        agree += ma == mb
    return agree / len(perm)


def _crafted_pair(rng, n=100, replaced=20):
    """Integer 'shingle' sets with known Jaccard (n-r)/(n+r)."""
    pool = rng.choice(MINHASH_P, size=3 * n, replace=False)
    a = set(int(x) for x in pool[:n])
    b = set(list(a)[replaced:]) | {int(x) for x in pool[n : n + replaced]}
    j = len(a & b) / len(a | b)
    return a, b, j


def test_minhash_family_agreement_tracks_jaccard():
    """E[signature-component agreement] == Jaccard — THE MinHash
    property, and exactly what the degenerate families violate
    (their agreement collapses to ~all-or-nothing). 512 permutations
    give sigma = sqrt(j(1-j)/512) ~ 0.02; bound at 5 sigma."""
    rng = np.random.default_rng(7)
    perm = _perm_consts(512)
    for replaced in (10, 30, 60):
        a, b, j = _crafted_pair(rng, replaced=replaced)
        agree = _minhash_agreement(perm, a, b)
        sigma = (j * (1 - j) / 512) ** 0.5
        assert abs(agree - j) < 5 * sigma, (replaced, agree, j)
        # the direct degeneracy symptom: all-or-nothing agreement
        assert 0.0 < agree < 1.0


def test_minhash_statistic_catches_both_degenerate_lookalikes():
    """Meta-test: the agreement statistic must FLAG the two documented
    degenerate families (operators/dedup.py::_perm_consts docstring) —
    proof this battery would have caught the pre-r7 bug."""
    rng = np.random.default_rng(7)
    consts = _perm_consts(512)
    a, b, j = _crafted_pair(rng, replaced=30)  # j ~ 0.54

    # (1) no modulus: min(a*h+b) = a*min(h)+b — agreement is exactly
    # [min(A) == min(B)], i.e. 0.0 or 1.0, never ~j
    agree = 0
    for ca, cb in consts:
        ma = min(ca * h + cb for h in a)
        mb = min(ca * h + cb for h in b)
        agree += ma == mb
    no_mod = agree / len(consts)
    assert no_mod in (0.0, 1.0)

    # (2) modulus far above a*h (2^61-1 over 31-bit h): the product
    # wraps at most once, permutations stay correlated — agreement
    # sits far from j (observed: pinned at the all-or-nothing ends)
    big_p = (1 << 61) - 1
    agree = 0
    for ca, cb in consts:
        ma = min((ca * h + cb) % big_p for h in a)
        mb = min((ca * h + cb) % big_p for h in b)
        agree += ma == mb
    big_mod = agree / len(consts)
    sigma = (j * (1 - j) / 512) ** 0.5
    assert abs(big_mod - j) > 5 * sigma  # the healthy-family test rejects it


def test_simhash_bit_source_balanced_and_uncorrelated():
    """simhash_pairs_portable's per-token bit source (first 60 bits of
    md5): every bit ~Bernoulli(1/2) across tokens, and bit pairs
    uncorrelated — a biased or correlated bit makes fingerprint
    Hamming distances collapse. Deterministic (fixed token set)."""
    n, bits = 3000, 60
    hs = [
        int(hashlib.md5(f"tok{i}".encode()).hexdigest()[:15], 16) for i in range(n)
    ]
    mat = np.array([[(h >> j) & 1 for j in range(bits)] for h in hs])
    counts = mat.sum(axis=0)
    sigma = (n / 4) ** 0.5
    assert (np.abs(counts - n / 2) < 5 * sigma).all(), counts
    # pairwise correlation over all 60*59/2 pairs: 5 sigma ~ 0.09
    c = np.corrcoef(mat.T)
    off = c[np.triu_indices(bits, k=1)]
    assert np.abs(off).max() < 0.1, np.abs(off).max()


def test_sign_lsh_planes_balanced_and_diverse():
    """similarity._hyperplanes: per-plane sign balance ~50% over
    Gaussian vectors, bucket bits pairwise-independent (agreement
    ~0.5), and no two planes near-collinear — correlated planes make
    multi-probe LSH recall collapse the same way correlated MinHash
    permutations did."""
    from quack_reduce_spark.operators.similarity import _hyperplanes

    dim, n_planes, n_vecs = 16, 8, 4000
    planes = np.array(_hyperplanes(dim, n_planes))
    # plane diversity: |cos| between every pair well below collinear
    norms = planes / np.linalg.norm(planes, axis=1, keepdims=True)
    cos = norms @ norms.T
    off = cos[np.triu_indices(n_planes, k=1)]
    assert np.abs(off).max() < 0.6, np.abs(off).max()

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((n_vecs, dim))
    signs = (vecs @ planes.T) > 0  # (n_vecs, n_planes)
    counts = signs.sum(axis=0)
    sigma = (n_vecs / 4) ** 0.5
    assert (np.abs(counts - n_vecs / 2) < 5 * sigma).all(), counts
    # bit-pair agreement ~ 0.5 (independent planes); 5 sigma ~ 0.04
    for p in range(n_planes):
        for q in range(p + 1, n_planes):
            agree = (signs[:, p] == signs[:, q]).mean()
            assert abs(agree - 0.5) < 0.08, (p, q, agree)


def test_feature_hash_buckets_uniform_and_order_free():
    """ml_feature_hashing's md5 bucket family: chi-squared uniformity
    over 256 buckets for 20k distinct tokens, plus ~zero correlation
    between token index and bucket (a monotone family — the MinHash
    bug's shape — has |corr| ~ 1). Deterministic."""
    n, mod = 20_000, 256
    buckets = np.array(
        [int(hashlib.md5(f"term{i:05d}".encode()).hexdigest()[:8], 16) % mod for i in range(n)]
    )
    observed = np.bincount(buckets, minlength=mod)
    expected = n / mod
    chi2 = ((observed - expected) ** 2 / expected).sum()
    # chi2(df=255): mean 255, sd ~22.6; accept below mean + 5 sd
    assert chi2 < 368, chi2
    corr = np.corrcoef(np.arange(n), buckets)[0, 1]
    assert abs(corr) < 0.04, corr


def test_salted_md5_family_uniform_and_cross_salt_independent():
    """The ``r:``-salted md5 position family count-min buckets use
    (cms_buckets — the bloom filter moved to Kirsch-Mitzenmacher
    double hashing in r11, tested separately below): per-salt
    chi-squared uniformity over an 8184-slot position space (16
    coarse bins), and ~zero cross-salt position correlation — a
    family whose salts collapse to one function (the MinHash-bug
    shape) would correlate at |corr| ~ 1 and stack all k probes
    onto one slot. Deterministic."""
    from quack_reduce_spark.operators.sketches import BLOOM_K, BLOOM_M

    n, bins = 4000, 16
    pos = {
        r: np.array(
            [
                int(hashlib.md5(f"{r}:{k}".encode()).hexdigest()[:8], 16) % BLOOM_M
                for k in range(n)
            ]
        )
        for r in range(BLOOM_K)
    }
    for r in range(BLOOM_K):
        observed = np.bincount(pos[r] * bins // BLOOM_M, minlength=bins)
        expected = n / bins
        chi2 = ((observed - expected) ** 2 / expected).sum()
        # chi2(df=15): mean 15, sd ~5.5; accept below mean + 5 sd
        assert chi2 < 43, (r, chi2)
    for r1 in range(BLOOM_K):
        for r2 in range(r1 + 1, BLOOM_K):
            corr = np.corrcoef(pos[r1], pos[r2])[0, 1]
            assert abs(corr) < 0.05, (r1, r2, corr)


def test_train_split_fractions_and_key_range_independence():
    """ml_train_split's 80/10/10 md5 assignment: global fractions
    within 5 sigma of nominal AND stable across key-range deciles — a
    range-correlated assignment (every low key lands in train) passes
    the global check but fails the per-decile chi-squared."""
    n = 20_000
    buckets = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in range(n)]
    )
    split = np.where(buckets < 80, 0, np.where(buckets < 90, 1, 2))
    for s, frac in ((0, 0.8), (1, 0.1), (2, 0.1)):
        got = (split == s).mean()
        sigma = (frac * (1 - frac) / n) ** 0.5
        assert abs(got - frac) < 5 * sigma, (s, got)
    # decile x split chi-squared (df = 9*2 = 18): mean 18, sd 6
    chi2 = 0.0
    for d in range(10):
        seg = split[d * (n // 10) : (d + 1) * (n // 10)]
        for s, frac in ((0, 0.8), (1, 0.1), (2, 0.1)):
            exp = len(seg) * frac
            chi2 += ((seg == s).sum() - exp) ** 2 / exp
    assert chi2 < 48, chi2  # mean + 5 sd


def test_portable_shingle_fold_uniform(spark_global):
    """_portable_doc_hashes' fold (md5[:8] % MINHASH_P) and the
    production xxhash64>>33 base hash: both uniform over their range
    (64-bucket chi-squared) and uncorrelated with input order. The
    xxhash64 half runs through Spark — it IS the JVM function under
    test, there is no Python twin."""
    n, nb = 5000, 64
    # portable md5 fold — pure python replay of the column expression
    folded = np.array(
        [int(hashlib.md5(f"sh {i} x".encode()).hexdigest()[:8], 16) % MINHASH_P for i in range(n)]
    )
    observed = np.bincount(folded * nb // MINHASH_P, minlength=nb)
    chi2 = ((observed - n / nb) ** 2 / (n / nb)).sum()
    assert chi2 < 63 + 5 * (2 * 63) ** 0.5, chi2
    assert abs(np.corrcoef(np.arange(n), folded)[0, 1]) < 0.04

    # production xxhash64 fold, via the JVM
    import pyspark.sql.functions as F

    spark = spark_global
    df = spark.range(n).select(
        F.col("id"),
        F.shiftrightunsigned(F.xxhash64(F.concat(F.lit("sh "), F.col("id"))), 33).alias("h"),
    )
    rows = df.collect()
    hs = np.array([r["h"] for r in rows])
    idx = np.array([r["id"] for r in rows])
    observed = np.bincount(hs * nb // (1 << 31), minlength=nb)
    chi2 = ((observed - n / nb) ** 2 / (n / nb)).sum()
    assert chi2 < 63 + 5 * (2 * 63) ** 0.5, chi2
    assert abs(np.corrcoef(idx, hs)[0, 1]) < 0.04


def test_aes_sample_u_uniform_and_weight_proportional():
    """ml_weighted_sample's md5-48-bit u family: (a) per-decile
    chi-squared uniformity of u over [0,1); (b) the A-ES selection
    actually IS weight-proportional — with weights w and w' = 3w on
    two equal-size populations, the 3x-weighted half should win ~3/4
    of the top slots (binomial 5-sigma band); (c) u is well-spread
    WITHIN each 100-way split bucket (u's top 32 bits determine the
    md5 split bucket — chars 1-8 are a prefix of chars 1-12 — so a
    pipeline that both splits and weight-samples the same keys needs
    the within-bucket distribution to stay fine-grained, not
    clustered)."""
    n = 20_000
    u = np.array(
        [
            (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) + 0.5) / 2**48
            for i in range(n)
        ]
    )
    observed = np.histogram(u, bins=10, range=(0.0, 1.0))[0]
    chi2 = ((observed - n / 10) ** 2 / (n / 10)).sum()
    assert chi2 < 9 + 5 * (2 * 9) ** 0.5, chi2  # df=9: mean + 5 sd

    # (b) weight-proportionality of the pow-key selection
    w = np.where(np.arange(n) % 2 == 0, 1.0, 3.0)
    key = u ** (1.0 / w)
    top = np.argsort(-key)[: n // 10]
    heavy = (top % 2 == 1).mean()
    # P(select heavy) ~ 3/4 at weight ratio 3 (A-ES, small sample
    # fraction); binomial sd over n/10 draws
    sd = (0.75 * 0.25 / (n // 10)) ** 0.5
    assert abs(heavy - 0.75) < 5 * sd, heavy

    # (c) within-bucket spread: conditioned on split bucket, u must
    # still fill [0,1) (quartile chi-squared per bucket, pooled)
    buckets = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in range(n)]
    )
    chi2c, df = 0.0, 0
    for b in range(100):
        ub = u[buckets == b]
        if len(ub) < 40:
            continue
        obs = np.histogram(ub, bins=4, range=(0.0, 1.0))[0]
        chi2c += ((obs - len(ub) / 4) ** 2 / (len(ub) / 4)).sum()
        df += 3
    assert chi2c < df + 5 * (2 * df) ** 0.5, (chi2c, df)


def test_km_double_hash_positions_uniform_per_probe():
    """The enhanced-double-hashing bloom probe family (g_i = (h1 +
    i*h2 + (i^3-i)/6) mod m, h1/h2 = the two 32-bit md5 halves, h2
    odd): every probe
    index i must individually be uniform over the position space —
    a broken stride (h2 collapsing to a constant) would turn probes
    1..k-1 into shifted copies of probe 0 and show up here as
    non-uniform residues. Deterministic."""
    m, n, bins = 8184, 4000, 16
    k = 7
    pos = {}
    for i in range(k):
        ps = []
        for key in range(n):
            d = hashlib.md5(str(key).encode()).hexdigest()
            h1 = int(d[:8], 16)
            h2 = int(d[8:16], 16) | 1
            ps.append((h1 + i * h2 + (i * i * i - i) // 6) % m)
        pos[i] = np.array(ps)
    for i in range(k):
        observed = np.bincount(pos[i] * bins // m, minlength=bins)
        expected = n / bins
        chi2 = ((observed - expected) ** 2 / expected).sum()
        assert chi2 < 43, (i, chi2)  # chi2(df=15): mean 15 + 5 sd
    # and the stride actually varies per key: probe deltas are not a
    # global constant (the degenerate-h2 failure mode)
    deltas = (pos[1] - pos[0]) % m
    assert len(np.unique(deltas)) > n // 4
