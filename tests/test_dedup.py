"""Dedup operators: crafted cases + cross-validation of the approximate
operators (MinHash-LSH, SimHash) against the exact-Jaccard ground truth
on the fixture corpus — the unit-test complement to the driver's
rows-only check (see inventory/dedup.py docstring)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import dedup as D


@pytest.fixture(scope="module")
def crafted(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "THE  Quick brown fox jumps over the lazy dog"),  # case/ws dup of 1
        (4, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (5, "completely different text about spark engines here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(crafted):
    out = {r["keep_id"]: r["n_copies"] for r in D.exact_dedup(crafted, "text", "doc_id").collect()}
    assert out[1] == 3  # docs 1, 2, 3 normalize identically
    assert out[4] == 1 and out[5] == 1


def test_ngram_jaccard_finds_near_dup(crafted):
    pairs = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(crafted, "text", "doc_id", threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert 0.3 <= pairs[(1, 4)] < 1.0  # one word changed
    assert (1, 5) not in pairs


def test_minhash_identical_docs_full_signature_match(crafted):
    sig = crafted.select(
        D.minhash_signature(crafted.text).alias("s"), "doc_id"
    ).collect()
    sigs = {r["doc_id"]: tuple(r["s"]) for r in sig}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[5]


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    exact = {
        (r["doc1"], r["doc2"])
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    lsh = {
        (r["doc1"], r["doc2"])
        for r in D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    # banded LSH at (32 hashes, 8 bands) has >90% recall at j>=0.5
    assert len(lsh) >= 0.8 * len(exact)


def test_minhash_lsh_matches_exact_pairs(spark):
    """The dedup_minhash_lsh ORACLE CONTRACT: on the fixture data the
    banded LSH recalls every exact-Jaccard pair (min fixture pair
    j = 0.8 → per-pair recall 1-(1-j^4)^8 >= 0.985; determinism of the
    data + xxhash64 makes the equality stable). If fixture
    regeneration ever plants pairs near the 0.5 threshold, THIS test
    fails before the driver's differential does — move the key back to
    rows-only in that case.

    ALL THREE fixture SFs are asserted (r8, advice): sf0.1 is where
    the scale sweep and bench run, and with per-pair banded recall
    ~0.985 at the fixtures' min j=0.8 the LARGEST fixture is exactly
    where a missed pair (silent oracle red) is most likely."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = load(spark, f"/root/testdata/{sf}", "documents")
        exact = {
            (r["doc1"], r["doc2"], r["jaccard"])
            for r in D.ngram_jaccard_pairs(
                docs, "text", "doc_id", threshold=0.5
            ).collect()
        }
        lsh = {
            (r["doc1"], r["doc2"], r["jaccard"])
            for r in D.minhash_lsh_pairs(
                docs, "text", "doc_id", threshold=0.5
            ).collect()
        }
        assert lsh == exact, sf


def test_minhash_permutations_not_degenerate(spark):
    """Regression for the r7 find: min((a*h+b)) without a modulus (or
    with a modulus so large the product wraps at most once) makes every
    permutation pick the SAME argmin shingle — signature agreement
    becomes all-or-nothing instead of ~j. Two docs sharing 2/3 of
    their shingles must agree on SOME but not ALL permutations with
    overwhelming probability under a healthy family."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = base.replace("delta", "delta2").replace("theta", "theta2").replace(
        "kappa", "kappa2"
    )
    df = spark.createDataFrame([(1, base), (2, other)], "doc_id long, text string")
    sigs = {
        r["doc_id"]: list(r["s"])
        for r in df.select(
            "doc_id", D.minhash_signature(F.col("text"), num_hashes=64).alias("s")
        ).collect()
    }
    agree = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    # true jaccard of the 3-gram sets is well inside (0, 1): a healthy
    # family agrees on a nontrivial strict subset of permutations
    assert 0 < agree < 64, f"degenerate all-or-nothing signature: {agree}/64"


def test_simhash_flags_exact_dups(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    exact_dups = {
        (r["doc1"], r["doc2"])
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.999).collect()
    }
    sim = {(r["doc1"], r["doc2"]) for r in D.simhash_pairs(docs, "text", "doc_id").collect()}
    # identical token streams have identical simhash -> hamming 0
    assert exact_dups <= sim


def test_embedding_lsh_pairs_subset_and_recall(spark, sf_dir):
    # Banded-LSH blocked pairs are exact-cosine verified: precision
    # must be 1.0 (subset of the exact pairs); recall on the fixture
    # embeddings must clear 60%.
    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in S.lsh_cosine_pairs(
            emb, dim=64, id_col="vec_id", vec_col="embedding", threshold=0.4
        ).collect()
    }
    assert lsh <= exact
    assert exact, "fixture must contain near-dup pairs at 0.4"
    assert len(lsh) / len(exact) >= 0.6


def test_connected_components_transitivity_and_chain(spark):
    # A 4-node chain (diameter 3) plus an isolated edge pair: min-label
    # propagation must cluster transitively-linked nodes even though
    # (1,4) is never an emitted pair, and needs >1 round to converge.
    from quack_reduce_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc1", "doc2"]
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_canonical_docs_keeps_min_and_isolated(spark):
    from quack_reduce_spark.operators.components import canonical_docs

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    pairs = spark.createDataFrame([(5, 2), (2, 3)], ["doc1", "doc2"])
    rows = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in canonical_docs(docs, pairs, "doc_id").collect()}
    # cluster {2,3,5} -> canonical 2; untouched docs are their own cluster
    assert rows == {
        1: (1, True), 2: (2, True), 3: (2, False),
        4: (4, True), 5: (2, False), 6: (6, True),
    }


def test_word_shingles_short_docs_yield_empty(spark):
    # ADVICE r1 (medium): docs with < n tokens used to crash the whole
    # job (descending F.sequence -> element_at index 0/negative); they
    # must instead contribute an empty shingle set
    rows = [(1, "two tokens"), (2, "one"), (3, ""), (4, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select("doc_id", D.word_shingles(F.col("text"), 3).alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in out}
    assert by_id[1] == [] and by_id[2] == [] and by_id[3] == []
    assert by_id[4] == ["a b c", "b c d"]
    # and the signature path over a mixed corpus no longer aborts
    sigs = df.select(D.minhash_signature(F.col("text"), 3, 8).alias("sig")).collect()
    assert len(sigs) == 4


def test_connected_components_raises_on_nonconvergence(spark):
    # ADVICE r1: hitting max_iter with labels still moving must raise,
    # not silently return partially-propagated components
    from quack_reduce_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc1 long, doc2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    ok = connected_components(chain, max_iter=20)
    assert ok.select("component").distinct().count() == 1


def test_two_phase_components_matches_label_prop(spark):
    # random multi-component graph: both algorithms must agree exactly
    import random

    from quack_reduce_spark.operators.components import connected_components

    rng = random.Random(11)
    edges = []
    for base in (0, 100, 200, 300):  # 4 disjoint blobs
        nodes = list(range(base, base + rng.randint(5, 30)))
        for n in nodes[1:]:
            edges.append((rng.choice(nodes[: nodes.index(n)]), n))
        for _ in range(10):  # extra random intra-blob edges
            edges.append((rng.choice(nodes), rng.choice(nodes)))
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc1 long, doc2 long")
    lp = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=50).collect()
    }
    tp = {
        r["node"]: r["component"]
        for r in connected_components(df, algorithm="two_phase").collect()
    }
    assert tp == lp and len({v for v in tp.values()}) == 4


def test_two_phase_converges_on_high_diameter_chain(spark):
    # a 120-node path has diameter 119: label propagation at
    # max_iter=20 must refuse; two-phase contracts it in O(log d)
    import pytest as _pytest

    from quack_reduce_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc1 long, doc2 long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=20)
    labels = {
        r["node"]: r["component"]
        for r in connected_components(
            chain, algorithm="two_phase", max_iter=20
        ).collect()
    }
    assert set(labels.values()) == {0} and len(labels) == 121


def test_minhash_portable_matches_production_contract(spark, sf_dir):
    """The md5-portable LSH and the xxhash64 production LSH are the
    same algorithm over different hash families: both must be subsets
    of the exact-Jaccard pair set (precision 1.0), agree on jaccard
    values for shared pairs, and achieve comparable recall."""
    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.operators import dedup as D

    docs = load(spark, sf_dir, "documents")
    exact = {
        (r.doc1, r.doc2): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    portable = {
        (r.doc1, r.doc2): r.jaccard
        for r in D.minhash_lsh_pairs_portable(docs, "text", "doc_id").collect()
    }
    assert portable, "portable LSH found no pairs on the dup-seeded fixture"
    # precision 1.0 vs the hashed-shingle ground truth contract:
    # every recalled pair is a true >=0.5 pair (jaccard over the md5
    # 32-bit shingle space may differ in the last rounded digit from
    # the exact-string space, so compare membership, not values)
    assert set(portable) <= set(exact)
    # recall on the seeded fixture: LSH with 4 bands x 4 rows should
    # recover most true pairs
    assert len(portable) >= 0.6 * len(exact)


def test_embedding_lsh_portable_precision_and_recall(spark, sf_dir):
    """Portable sign-LSH: precision-1.0 subset of the exact cosine
    pairs with identical cos_sim values, decent recall, and
    deterministic plane construction."""
    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4).collect()
    }
    port = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.lsh_cosine_pairs_portable(
            emb, dim=64, threshold=0.4, n_bands=4, planes_per_band=4
        ).collect()
    }
    assert port, "portable sign-LSH found no pairs"
    assert set(port) <= set(exact)
    for k, v in port.items():
        assert v == exact[k]
    assert len(port) >= 0.5 * len(exact)

    # the plane matrix is a pure function of (planes, dim)
    a = S.portable_plane_signs(4, 8)
    b = S.portable_plane_signs(4, 8)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)


def test_simhash_portable_agrees_with_hamming_ground_truth(spark, sf_dir):
    """Portable SimHash: every emitted pair's hamming is the TRUE
    fingerprint distance (banding is pigeonhole-complete for <=3), and
    near-identical docs from the dup-seeded fixture are recovered."""
    from quack_reduce_spark.inventory._util import load
    from quack_reduce_spark.operators import dedup as D

    docs = load(spark, sf_dir, "documents")
    pairs = D.simhash_pairs_portable(docs, "text", "doc_id", max_hamming=3).collect()
    assert pairs
    assert all(0 <= r.hamming <= 3 for r in pairs)
    # determinism: a second full run yields the identical pair set
    again = D.simhash_pairs_portable(docs, "text", "doc_id", max_hamming=3).collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, again))


def test_lsh_index_probe_equals_cross_cutoff_pairs(spark):
    """The persisted-index probe must find EXACTLY the cross-cutoff
    subset of the one-shot portable LSH pairs (same band keys, same
    verify) — persistence and the corpus/batch split change the data
    flow, never the answer. Also proves the parquet roundtrip of the
    band-key table is lossless."""
    from quack_reduce_spark.inventory.dedup import (
        INDEX_PROBE_CUTOFF_FRAC,
        dedup_lsh_index_probe,
        dedup_minhash_portable,
    )

    sf = "/root/testdata/sf0.001"
    probe = {
        (r["corpus_doc"], r["batch_doc"], r["jaccard"])
        for r in dedup_lsh_index_probe(spark, sf).collect()
    }
    docs = load(spark, sf, "documents")
    cutoff = int(docs.count() * INDEX_PROBE_CUTOFF_FRAC)
    one_shot = {
        (r["doc1"], r["doc2"], r["jaccard"])
        for r in dedup_minhash_portable(spark, sf).collect()
        if r["doc1"] < cutoff <= r["doc2"]
    }
    assert probe == one_shot and probe  # non-empty on the fixtures


def test_prefix_filter_equals_inverted_index_all_sfs(spark):
    """dedup_prefix_filter's ORACLE CONTRACT: prefix filtering is
    EXACT (completeness theorem in prefix_filter_candidates'
    docstring), so its output must equal the plain inverted-index join
    bit-for-bit at every fixture SF — the same promotion rationale as
    dedup_minhash_lsh, but theorem-backed rather than
    fixture-recall-backed."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = load(spark, f"/root/testdata/{sf}", "documents")
        exact = {
            (r["doc1"], r["doc2"], r["jaccard"])
            for r in D.ngram_jaccard_pairs(
                docs, "text", "doc_id", threshold=0.5
            ).collect()
        }
        pf = {
            (r["doc1"], r["doc2"], r["jaccard"])
            for r in D.prefix_filter_pairs(
                docs, "text", "doc_id", threshold=0.5
            ).collect()
        }
        assert pf == exact, sf


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The point of prefix filtering: strictly fewer candidate pairs
    than the any-shared-shingle inverted index (measured ~14x from the
    prefix+length filters alone; the r9 PPJoin positional filter cuts
    a further ~2.5x, ~35x total on the sf0.1 fixture), while remaining
    complete (previous test)."""
    docs = load(spark, sf_dir, "documents")
    pf = D.prefix_filter_candidates(docs, "text", "doc_id", threshold=0.5).count()
    sh = D._shingle_table(docs, "text", "doc_id", 3, hashed=True, distinct=True)
    inv = (
        sh.select(F.col("doc").alias("d1"), "sh")
        .join(sh.select(F.col("doc").alias("d2"), "sh"), "sh")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .count()
    )
    assert pf < inv / 10, (pf, inv)
