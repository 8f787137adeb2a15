"""Deduplication inventory over the documents table (north-star ops).

dedup_exact / dedup_ngram_jaccard have exact DuckDB oracles, and the
portable trilogy (dedup_minhash_portable, dedup_simhash_portable,
dedup_embedding_lsh_portable) puts banded LSH ITSELF through the hash
gate — md5-derived hash families and integer-exact projections both
engines can compute. dedup_minhash_lsh was promoted to the hash
gate in r7: its verified output equals the exact-Jaccard pair set on
the fixtures (recall exhaustive, asserted at all three SFs), so the
exact-pairs SQL is its oracle of record. The remaining
xxhash64/seeded-Gaussian production variants (dedup_simhash /
dedup_embedding_lsh) stay rows-only — engine-specific hash families
whose outputs genuinely depend on unreplayable bands — with unit tests
in tests/test_dedup.py asserting agreement with the exact ground truth
on the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load
from quack_reduce_spark.operators import components as C
from quack_reduce_spark.operators import dedup as D


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-of-normalized-text groupBy (one shuffle)."""
    docs = load(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (>= 0.5) via shingle
    inverted-index self-join."""
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs (>= 0.5) via AllPairs/PPJoin PREFIX
    FILTERING (operators/dedup.py::prefix_filter_pairs) — the third
    candidate-generation strategy next to the plain inverted index
    (dedup_ngram_jaccard) and banded LSH (dedup_minhash_lsh). Exact by
    the prefix-completeness theorem, so its oracle of record is the
    same exact-pairs SQL as dedup_ngram_jaccard: identical output,
    ~14x fewer candidate pairs measured on the fixtures (the join only
    fires on each doc's RAREST shingles under the global
    rare-first order). At 100 TB this is the exact-dedup workhorse:
    the quadratic term shrinks to the low-df tail of the shingle
    distribution, no posting cap (and thus no recall tradeoff)
    needed."""
    docs = load(spark, sf_dir, "documents")
    return D.prefix_filter_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


NGRAM_DOC_FREQ_CAP = 50


def dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The posting-cap variant of dedup_ngram_jaccard — shingles
    appearing in more than 50 docs are dropped before the self-join
    (the search-engine stop-list move that keeps the inverted index
    sub-quadratic; REQUIRED at 100 TB, SCALE.md dedup section). The
    oracle replicates the cap exactly, so the scale knob itself is
    hash-verified: Jaccard is computed on the REDUCED shingle sets."""
    docs = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, max_doc_freq=NGRAM_DOC_FREQ_CAP
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8 bands) candidates verified by exact Jaccard.

    Oracle of record (promoted r7): the exact-Jaccard pair set. The
    xxhash64 permutation mins never leave the engine, so the oracle
    cannot replay the bands — instead it relies on the verified-output
    contract: every emitted pair passes the exact-Jaccard >= 0.5
    verify (so Spark ⊆ oracle by construction), and the banded recall
    (1-(1-j^4)^8, >= 0.985 at the fixtures' minimum true-pair j = 0.8,
    >= 0.9998 at their p10 j = 0.94) is exhaustive on the fixed
    fixture data — asserted at all three SFs by
    tests/test_dedup.py::test_minhash_lsh_matches_exact_pairs, and
    deterministic because both the data and xxhash64 are. The md5
    twin dedup_minhash_portable additionally hash-replays the band
    construction itself.
    """
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)


MINHASH_PORTABLE_HASHES = 16
MINHASH_PORTABLE_BANDS = 4


def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) with md5-based permutations — the
    FULLY ORACLE-REPLAYED LSH: the DuckDB twin recomputes the same
    32-bit md5 shingle hashes, the same (a·h+b) permutation mins, the
    same band keys, the same candidate join, and the same exact-Jaccard
    verify, so the differential gate checks the exact pair set, not
    just recall. Companion to dedup_minhash_lsh (the xxhash64
    production variant, whose r7 oracle of record is the exact-pairs
    set rather than a band replay)."""
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_portable(
        docs,
        "text",
        "doc_id",
        num_hashes=MINHASH_PORTABLE_HASHES,
        bands=MINHASH_PORTABLE_BANDS,
        threshold=0.5,
    )


INDEX_PROBE_CUTOFF_FRAC = 0.8


def dedup_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup detection against a PERSISTED LSH index —
    the daily-crawl shape at 100 TB: the historical corpus's banded
    MinHash keys live as a maintained table (built once, appended per
    ingest), and each new batch computes ONLY ITS OWN band keys and
    probes the index with an equality join. Nothing rescans the
    corpus text: probe cost is O(batch) + one keyed join against the
    index, and verification touches candidate pairs only.

    Here docs below the 80% id cutoff play the corpus (same convention
    as dedup_incremental, which does the exact-fingerprint version of
    this funnel); the index is genuinely written to and read back from
    parquet (built once per process — immutable fixture), so the
    persisted-roundtrip contract is exercised, not simulated. Band
    keys use the engine-portable md5 family
    (operators/dedup.py::minhash_band_keys_portable), so the DuckDB
    oracle replays the identical index build, probe join, and
    exact-Jaccard verify — the full incremental pipeline through the
    hash gate."""
    import os

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    cutoff = int(n_docs * INDEX_PROBE_CUTOFF_FRAC)
    import pyspark.sql.functions as F

    corpus = docs.filter(F.col("doc_id") < cutoff)
    batch = docs.filter(F.col("doc_id") >= cutoff)

    # Index path is keyed on a fingerprint of the FULL sf_dir (two
    # fixture dirs sharing a basename must not collide) AND the pid
    # (concurrent processes — bench.py + check_oracle.py on one
    # machine — must never plan a read over each other's in-flight
    # overwrite). Built under a unique temp dir, then atomically
    # renamed into place; the memo + lock make the build once-per-
    # process even under the threaded burst.
    index_dir = _lsh_index_dir(sf_dir)
    with _LSH_INDEX_LOCK:
        if index_dir not in _LSH_INDEX_MATERIALIZED:
            import shutil
            import uuid

            tmp = f"{index_dir}.tmp.{uuid.uuid4().hex}"
            D.minhash_band_keys_portable(
                corpus,
                "text",
                "doc_id",
                num_hashes=MINHASH_PORTABLE_HASHES,
                bands=MINHASH_PORTABLE_BANDS,
            ).write.mode("overwrite").parquet(tmp)
            if os.path.isdir(index_dir):
                # pid-reuse leftover from a previous boot; nothing
                # live can be reading our pid-keyed path
                shutil.rmtree(index_dir)
            os.rename(tmp, index_dir)
            _LSH_INDEX_MATERIALIZED.add(index_dir)
    index = spark.read.parquet(index_dir)

    probe = D.minhash_band_keys_portable(
        batch,
        "text",
        "doc_id",
        num_hashes=MINHASH_PORTABLE_HASHES,
        bands=MINHASH_PORTABLE_BANDS,
    )
    candidates = (
        probe.select("band", "bkey", F.col("doc").alias("batch_doc"))
        .join(
            index.select("band", "bkey", F.col("doc").alias("corpus_doc")),
            ["band", "bkey"],
        )
        .select("batch_doc", "corpus_doc")
        .distinct()
        # referenced three times below (both verify joins + the id
        # semi-join); Spark never shares subtrees across references,
        # so materialize the (tiny) candidate list once
        .localCheckpoint(eager=True)
    )
    # verify ONLY candidate docs' shingle sets: semi-join the corpus
    # down to candidate ids BEFORE shingling, so the expensive
    # shingle+collect_set runs over |candidates| docs, not the whole
    # historical corpus (in production the shingle sets would be a
    # second persisted table; the semi-join keeps the rebuild honest
    # at the same asymptotic cost)
    cand_ids = (
        candidates.select(F.col("batch_doc").alias("doc_id"))
        .unionByName(candidates.select(F.col("corpus_doc").alias("doc_id")))
        .distinct()
    )
    hashes = D._portable_doc_hashes(
        docs.join(F.broadcast(cand_ids), "doc_id", "left_semi"), "text", "doc_id"
    )
    # referenced by both verify joins below; without the
    # materialization the semi-join + md5 shingle hashing +
    # collect_set ran once per side. r17: persist (reuse_persist)
    # instead of localCheckpoint — same dedup, recompute-on-loss
    # lineage at cluster scale (guide §5).
    from quack_reduce_spark.operators.reuse import reuse_persist

    docsets = reuse_persist(
        hashes.groupBy("doc").agg(F.collect_set("h").alias("shset")),
        "lsh_index_probe.docsets",
    )
    from quack_reduce_spark.functions.numeric import rnd

    return (
        candidates.join(
            docsets.select(F.col("doc").alias("batch_doc"), F.col("shset").alias("__s1")),
            "batch_doc",
        )
        .join(
            docsets.select(F.col("doc").alias("corpus_doc"), F.col("shset").alias("__s2")),
            "corpus_doc",
        )
        .withColumn("__common", F.array_size(F.array_intersect("__s1", "__s2")))
        .withColumn(
            "jaccard",
            rnd(
                F.col("__common")
                / (F.array_size("__s1") + F.array_size("__s2") - F.col("__common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("batch_doc", "corpus_doc", "jaccard")
    )


_LSH_INDEX_MATERIALIZED: set[str] = set()
import threading as _threading  # noqa: E402

_LSH_INDEX_LOCK = _threading.Lock()


def _lsh_index_dir(sf_dir: str) -> str:
    """Per-process, full-path-keyed location of the persisted LSH
    index for ``sf_dir``. md5 of the absolute path (not the basename —
    /a/sf0.01 and /b/sf0.01 are different corpora) + pid (no
    cross-process sharing: a concurrent process overwriting a shared
    dir could race a reader's file listing into silently-missing
    candidate pairs)."""
    import hashlib
    import os
    import tempfile

    fp = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    root = os.path.join(tempfile.gettempdir(), "qrs_lsh_index")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"{fp}-pid{os.getpid()}")


def _lsh_index_probe_oracle() -> str:
    from quack_reduce_spark.operators.dedup import _perm_consts

    consts = _perm_consts(MINHASH_PORTABLE_HASHES)
    rows_per_band = MINHASH_PORTABLE_HASHES // MINHASH_PORTABLE_BANDS
    values = ",\n                ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(consts)
    )
    return f"""
        WITH cut AS (
            SELECT CAST(FLOOR(COUNT(*) * {INDEX_PROBE_CUTOFF_FRAC}) AS BIGINT) AS c
            FROM documents
        ),
        w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        shs AS (
            SELECT doc_id AS doc,
                   unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                           for i in generate_series(1, len(words) - 2)]) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sh AS (
            SELECT doc,
                   CAST('0x' || substring(md5(sh), 1, 8) AS BIGINT) % 2147483647 AS h
            FROM shs
        ),
        consts AS (
            SELECT * FROM (VALUES
                {values}
            ) AS t(i, a, b)
        ),
        sig AS (
            SELECT sh.doc, c.i, MIN((sh.h * c.a + c.b) % 2147483647) AS m
            FROM sh CROSS JOIN consts c
            GROUP BY sh.doc, c.i
        ),
        bandkeys AS (
            SELECT doc, i // {rows_per_band} AS band,
                   string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
            FROM sig GROUP BY doc, i // {rows_per_band}
        ),
        cand AS (
            SELECT DISTINCT p.doc AS batch_doc, x.doc AS corpus_doc
            FROM bandkeys p
            JOIN bandkeys x ON p.band = x.band AND p.bkey = x.bkey
            WHERE p.doc >= (SELECT c FROM cut) AND x.doc < (SELECT c FROM cut)
        ),
        sets AS (SELECT doc, COUNT(DISTINCT h) AS sz FROM sh GROUP BY doc),
        inter AS (
            SELECT c.batch_doc, c.corpus_doc, COUNT(DISTINCT a.h) AS common
            FROM cand c
            JOIN sh a ON a.doc = c.batch_doc
            JOIN sh b ON b.doc = c.corpus_doc AND b.h = a.h
            GROUP BY c.batch_doc, c.corpus_doc
        )
        SELECT i.batch_doc, i.corpus_doc,
               FLOOR((CAST(i.common AS DOUBLE)
                      / (s1.sz + s2.sz - i.common)) * 1e6 + 0.5) / 1e6
                   AS jaccard
        FROM inter i
        JOIN sets s1 ON i.batch_doc = s1.doc
        JOIN sets s2 ON i.corpus_doc = s2.doc
        WHERE FLOOR((CAST(i.common AS DOUBLE)
                     / (s1.sz + s2.sz - i.common)) * 1e6 + 0.5) / 1e6 >= 0.5
    """


def _minhash_portable_oracle() -> str:
    from quack_reduce_spark.operators.dedup import _perm_consts

    consts = _perm_consts(MINHASH_PORTABLE_HASHES)
    rows_per_band = MINHASH_PORTABLE_HASHES // MINHASH_PORTABLE_BANDS
    values = ",\n                ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(consts)
    )
    return f"""
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        shs AS (
            SELECT doc_id AS doc,
                   unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                           for i in generate_series(1, len(words) - 2)]) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sh AS (
            SELECT doc,
                   CAST('0x' || substring(md5(sh), 1, 8) AS BIGINT) % 2147483647 AS h
            FROM shs
        ),
        consts AS (
            SELECT * FROM (VALUES
                {values}
            ) AS t(i, a, b)
        ),
        sig AS (
            -- the % modulus is what makes these real permutations:
            -- without it min(a*h+b) = a*min(h)+b degenerates every
            -- permutation to the same argmin (see operators/dedup.py)
            SELECT sh.doc, c.i, MIN((sh.h * c.a + c.b) % 2147483647) AS m
            FROM sh CROSS JOIN consts c
            GROUP BY sh.doc, c.i
        ),
        bandkeys AS (
            SELECT doc, i // {rows_per_band} AS band,
                   string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
            FROM sig GROUP BY doc, i // {rows_per_band}
        ),
        cand AS (
            SELECT DISTINCT l.doc AS doc1, r.doc AS doc2
            FROM bandkeys l
            JOIN bandkeys r ON l.band = r.band AND l.bkey = r.bkey
                           AND l.doc < r.doc
        ),
        sets AS (SELECT doc, COUNT(DISTINCT h) AS sz FROM sh GROUP BY doc),
        inter AS (
            SELECT c.doc1, c.doc2, COUNT(DISTINCT a.h) AS common
            FROM cand c
            JOIN sh a ON a.doc = c.doc1
            JOIN sh b ON b.doc = c.doc2 AND b.h = a.h
            GROUP BY c.doc1, c.doc2
        )
        SELECT i.doc1, i.doc2,
               FLOOR((CAST(i.common AS DOUBLE)
                      / (s1.sz + s2.sz - i.common)) * 1e6 + 0.5) / 1e6
                   AS jaccard
        FROM inter i
        JOIN sets s1 ON i.doc1 = s1.doc
        JOIN sets s2 ON i.doc2 = s2.doc
        WHERE FLOOR((CAST(i.common AS DOUBLE)
                     / (s1.sz + s2.sz - i.common)) * 1e6 + 0.5) / 1e6 >= 0.5
    """


def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 near-dup pairs (Hamming <= 3), FULLY ORACLE-REPLAYED:
    per-token bits come from md5 (15 hex chars = 60 bits, positive in
    int64 in any engine), and votes / fingerprint / pigeonhole bands /
    bit_count(xor) verify are all integer arithmetic — the DuckDB twin
    derives the identical fingerprints and the identical pair set.
    Companion to dedup_simhash (the xxhash64 production variant,
    rows-only by design). Completes the portable-dedup trilogy with
    dedup_minhash_portable and dedup_embedding_lsh_portable."""
    docs = load(spark, sf_dir, "documents")
    return D.simhash_pairs_portable(docs, "text", "doc_id", max_hamming=3)


_SIMHASH_PORTABLE_ORACLE = """
        WITH toks AS (
            SELECT DISTINCT doc_id AS doc, t.tok
            FROM documents,
                 UNNEST(string_split_regex(trim(text), '\\s+')) AS t(tok)
        ),
        h AS (
            SELECT doc,
                   CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
            FROM toks
        ),
        bits AS (SELECT j FROM generate_series(0, 59) s(j)),
        votes AS (
            SELECT doc, b.j,
                   SUM(CASE WHEN (h.h >> b.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN bits b
            GROUP BY doc, b.j
        ),
        fp AS (
            SELECT doc,
                   CAST(SUM(CASE WHEN v > 0
                                 THEN (CAST(1 AS BIGINT) << j)
                                 ELSE 0 END) AS BIGINT) AS sh60
            FROM votes GROUP BY doc
        ),
        banded AS (
            SELECT doc, sh60, b.b AS band,
                   (sh60 >> (15 * b.b)) & 32767 AS bkey
            FROM fp CROSS JOIN generate_series(0, 3) b(b)
        )
        SELECT DISTINCT l.doc AS doc1, r.doc AS doc2,
               bit_count(xor(l.sh60, r.sh60)) AS hamming
        FROM banded l
        JOIN banded r ON l.band = r.band AND l.bkey = r.bkey
                     AND l.doc < r.doc
        WHERE bit_count(xor(l.sh60, r.sh60)) <= 3
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup candidate pairs (Hamming <= 3), banded.

    No SQL oracle (xxhash64 bit votes); unit-tested for overlap with
    the exact near-dup ground truth.
    """
    docs = load(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "text", "doc_id", max_hamming=3)


COS_THRESHOLD = 0.4
EMBED_DIM = 64


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (round(cos,6) >= 0.4).

    The oracle-checked ground truth (DuckDB list_cosine_similarity).
    O(n^2) pair space — the 100 TB scale path is
    ``dedup_embedding_lsh`` below; this stays the recall yardstick.
    """
    from quack_reduce_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    return S.cosine_pairs(emb, "vec_id", "embedding", threshold=COS_THRESHOLD)


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH blocked embedding near-dup pairs, exact-cosine
    verified (subset of dedup_embedding_cosine; precision 1.0).

    No SQL oracle (seeded hyperplanes are not SQL-portable); recall vs
    the exact pairs is unit-tested in tests/test_dedup.py.
    """
    from quack_reduce_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    return S.lsh_cosine_pairs(
        emb, dim=EMBED_DIM, id_col="vec_id", vec_col="embedding", threshold=COS_THRESHOLD
    )



LSH_PORTABLE_BANDS = 4
LSH_PORTABLE_PLANES = 4


def dedup_embedding_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH embedding near-dup pairs, FULLY ORACLE-REPLAYED:
    md5-parity ±1 hyperplanes and integer-quantized projections mean
    the DuckDB twin derives the same planes, the same bucket bits, the
    same candidates, and the same exact-cosine verification — the
    whole LSH pipeline goes through the hash gate, not just its
    recall. Companion to dedup_embedding_lsh (the seeded-Gaussian
    production variant, rows-only by design)."""
    from quack_reduce_spark.operators import similarity as S

    emb = load(spark, sf_dir, "embeddings")
    return S.lsh_cosine_pairs_portable(
        emb,
        dim=EMBED_DIM,
        id_col="vec_id",
        vec_col="embedding",
        threshold=COS_THRESHOLD,
        n_bands=LSH_PORTABLE_BANDS,
        planes_per_band=LSH_PORTABLE_PLANES,
    )


def _embedding_lsh_portable_oracle() -> str:
    n_planes = LSH_PORTABLE_BANDS * LSH_PORTABLE_PLANES
    return f"""
        WITH dims AS (SELECT i FROM generate_series(0, {EMBED_DIM - 1}) s(i)),
        planes AS (SELECT p FROM generate_series(0, {n_planes - 1}) s(p)),
        sgns AS (
            SELECT p, i,
                   CASE WHEN CAST('0x' || substring(
                            md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
                            1, 2) AS INT) % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM planes, dims
        ),
        q AS (
            SELECT vec_id, d.i,
                   CAST(FLOOR(CAST(embedding[d.i + 1] AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS xq
            FROM embeddings, dims d
        ),
        proj AS (
            SELECT q.vec_id, s.p, SUM(q.xq * s.sgn) AS pr
            FROM q JOIN sgns s ON q.i = s.i
            GROUP BY q.vec_id, s.p
        ),
        bits AS (
            SELECT vec_id, p // {LSH_PORTABLE_PLANES} AS band,
                   string_agg(CASE WHEN pr > 0 THEN '1' ELSE '0' END,
                              '' ORDER BY p) AS bkey
            FROM proj GROUP BY vec_id, p // {LSH_PORTABLE_PLANES}
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bits a
            JOIN bits b ON a.band = b.band AND a.bkey = b.bkey
                       AND a.vec_id < b.vec_id
        ),
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS n
            FROM embeddings
        )
        SELECT c.id_a, c.id_b,
               FLOOR((list_dot_product(a.v, b.v) / (a.n * b.n)) * 1e6 + 0.5)
                   / 1e6 AS cos_sim
        FROM cand c
        JOIN e a ON c.id_a = a.vec_id
        JOIN e b ON c.id_b = b.vec_id
        WHERE FLOOR((list_dot_product(a.v, b.v) / (a.n * b.n)) * 1e6 + 0.5)
                  / 1e6 >= {COS_THRESHOLD}
    """


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: ngram-Jaccard pairs -> connected
    components (iterative min-label propagation) -> every doc mapped to
    its cluster (min member id) with a deterministic canonical flag.
    Transitivity is the point: A~B, B~C clusters A,B,C even though
    (A,C) was never an emitted pair. Oracle: DuckDB recursive CTE
    reachability over the identical pair list."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return C.canonical_docs(docs, pairs, "doc_id")


def dedup_components_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical clustering contract to dedup_components, computed by
    the large-star/small-star two-phase algorithm
    (operators/components.py) — O(log d) rounds instead of O(d), the
    opt-in for high-diameter duplicate graphs. Same DuckDB recursive-
    CTE oracle as the label-propagation entry: both algorithms must
    land on the exact same (doc, component, canonical) labeling, so
    the algorithm swap itself is hash-verified through the driver
    gate."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return C.canonical_docs(docs, pairs, "doc_id", algorithm="two_phase")


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication: doc pairs sharing >= 5 distinct
    32-char grams (copied-passage detection; word-level Jaccard can
    miss these). Oracle joins raw substrings; Spark joins xxhash64'd
    grams — identical counts barring astronomically-unlikely (and
    deterministic) 64-bit collisions."""
    docs = load(spark, sf_dir, "documents")
    return D.char_ngram_pairs(docs, "text", "doc_id", k=32, min_shared=5)


INCR_CUTOFF_FRAC = 0.8  # doc_id below 80th-percentile id = existing corpus


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: docs with doc_id below the cutoff
    play the EXISTING corpus; the rest are the new batch. A new doc is
    dropped if its content fingerprint already exists in the corpus, or
    if an earlier doc in the same batch claimed it first. Reports the
    per-source admission funnel — the daily-ingest accounting every
    production pipeline runs.

    Scale: the corpus side reduces to DISTINCT fingerprints (one
    aggregate over the historical fingerprint store — in production a
    maintained table, not a rescan); the batch is one groupBy + one
    join on fingerprint. No self-joins.

    Fingerprint = md5 of the 64-char document lead (copied-lead
    detection): the fixture has no full-text duplicates, so the
    full-content fingerprint would make this funnel trivially
    all-admitted; the lead fingerprint exercises real collisions while
    the fingerprint function stays pluggable in production.
    """
    import pyspark.sql.functions as F

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    cutoff = int(n_docs * INCR_CUTOFF_FRAC)
    fp = docs.select(
        "doc_id", "source", F.md5(F.substring(F.trim(F.col("text")), 1, 64)).alias("fp")
    )
    corpus_fps = (
        fp.filter(F.col("doc_id") < cutoff).select("fp").distinct()
        .withColumn("__in_corpus", F.lit(True))
    )
    batch = fp.filter(F.col("doc_id") >= cutoff)
    first_in_batch = batch.groupBy("fp").agg(F.min("doc_id").alias("__first"))
    verdicts = (
        batch.join(first_in_batch, "fp")
        .join(corpus_fps, "fp", "left")
        .select(
            "source",
            F.when(F.col("__in_corpus").isNotNull(), F.lit("dup_vs_corpus"))
            .when(F.col("doc_id") != F.col("__first"), F.lit("dup_in_batch"))
            .otherwise(F.lit("admitted"))
            .alias("verdict"),
        )
    )
    return (
        verdicts.groupBy("source")
        .pivot("verdict", ["admitted", "dup_vs_corpus", "dup_in_batch"])
        .count()
        .select(
            "source",
            F.coalesce("admitted", F.lit(0)).alias("n_admitted"),
            F.coalesce("dup_vs_corpus", F.lit(0)).alias("n_dup_vs_corpus"),
            F.coalesce("dup_in_batch", F.lit(0)).alias("n_dup_in_batch"),
        )
    )


def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for each pair of sources,
    how many distinct content fingerprints they share (who copies from
    whom). The (fingerprint, source) table is distinct-reduced BEFORE
    the self-join, so join input is one row per (fp, source) — group
    sizes are the number of sources sharing a fp (≤ 20 here, small
    always), never the number of copies. Fingerprint = 64-char lead
    (see dedup_incremental — full-text fps never collide in this
    fixture)."""
    import pyspark.sql.functions as F

    docs = load(spark, sf_dir, "documents")
    fps = docs.select(
        F.md5(F.substring(F.trim(F.col("text")), 1, 64)).alias("fp"), "source"
    ).distinct()
    other = fps.select(F.col("fp"), F.col("source").alias("source_b"))
    return (
        fps.join(other, "fp")
        .filter(F.col("source") < F.col("source_b"))
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


def dedup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure diagnostics of the near-dup graph: nodes, edges,
    triangles, and max degree. Triangle density separates paste-chains
    (A~B~C without A~C — risky for transitive dedup, clusters merge
    text that isn't mutually similar) from true duplicate cliques.
    Triangles count via the standard oriented two-hop join: edges kept
    as a<b, joined (a,b)x(b,c) then closed by (a,c) — each triangle
    counted exactly once; the pair list is small (near-dup output),
    so both joins are broadcast-sized."""
    import pyspark.sql.functions as F

    docs = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    e = pairs.select("doc1", "doc2")  # already doc1 < doc2
    deg = (
        e.select(F.col("doc1").alias("n")).union(e.select(F.col("doc2").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    ab = e.select(F.col("doc1").alias("a"), F.col("doc2").alias("b"))
    bc = e.select(F.col("doc1").alias("b"), F.col("doc2").alias("c"))
    ac = e.select(F.col("doc1").alias("a"), F.col("doc2").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    stats_deg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
    )
    stats_e = e.agg(F.count(F.lit(1)).alias("n_edges"))
    stats_t = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return stats_deg.crossJoin(stats_e).crossJoin(stats_t).select(
        "n_nodes", "n_edges", "n_triangles", "max_degree"
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_incremental": dedup_incremental,
    "dedup_cross_source": dedup_cross_source,
    "dedup_graph_stats": dedup_graph_stats,
    "dedup_substring": dedup_substring,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_capped": dedup_ngram_capped,
    "dedup_prefix_filter": dedup_prefix_filter,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_portable": dedup_minhash_portable,
    "dedup_lsh_index_probe": dedup_lsh_index_probe,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_portable": dedup_simhash_portable,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dedup_embedding_lsh_portable": dedup_embedding_lsh_portable,
    "dedup_components": dedup_components,
    "dedup_components_twophase": dedup_components_twophase,
}


ORACLES = {
    # dedup_minhash_lsh: LSH candidates + exact-Jaccard verify. The
    # oracle is the full exact-Jaccard pair set (same SQL family as
    # dedup_ngram_jaccard); equality holds because the verify step
    # guarantees Spark ⊆ oracle and the banded recall is exhaustive on
    # the fixtures (verified at sf0.001/0.01/0.1 — see the query
    # docstring and test_minhash_lsh_matches_exact_pairs).
    "dedup_minhash_lsh": """
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        sh AS (
            SELECT doc_id AS doc,
                   unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                         for i in generate_series(1, len(words) - 2)])) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
        common AS (
            SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
            GROUP BY 1, 2
        )
        SELECT doc1, doc2,
               FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 AS jaccard
        FROM common
        JOIN sizes n1 ON common.doc1 = n1.doc
        JOIN sizes n2 ON common.doc2 = n2.doc
        WHERE FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 >= 0.5
    """,
    "dedup_minhash_portable": _minhash_portable_oracle(),
    "dedup_lsh_index_probe": _lsh_index_probe_oracle(),
    "dedup_embedding_lsh_portable": _embedding_lsh_portable_oracle(),
    "dedup_simhash_portable": _SIMHASH_PORTABLE_ORACLE,
    "dedup_incremental": """
        WITH fp AS (
            SELECT doc_id, source, md5(substr(trim(text), 1, 64)) AS fp
            FROM documents
        ),
        cut AS (
            SELECT CAST(FLOOR(COUNT(*) * 0.8) AS BIGINT) AS c FROM documents
        ),
        corpus AS (
            SELECT DISTINCT fp FROM fp WHERE doc_id < (SELECT c FROM cut)
        ),
        batch AS (SELECT * FROM fp WHERE doc_id >= (SELECT c FROM cut)),
        firsts AS (SELECT fp, MIN(doc_id) AS first_id FROM batch GROUP BY fp),
        verdicts AS (
            SELECT b.source,
                   CASE WHEN b.fp IN (SELECT fp FROM corpus) THEN 'dup_vs_corpus'
                        WHEN b.doc_id != f.first_id THEN 'dup_in_batch'
                        ELSE 'admitted' END AS verdict
            FROM batch b JOIN firsts f USING (fp)
        )
        SELECT source,
               CAST(COUNT(*) FILTER (WHERE verdict = 'admitted') AS BIGINT)
                   AS n_admitted,
               CAST(COUNT(*) FILTER (WHERE verdict = 'dup_vs_corpus') AS BIGINT)
                   AS n_dup_vs_corpus,
               CAST(COUNT(*) FILTER (WHERE verdict = 'dup_in_batch') AS BIGINT)
                   AS n_dup_in_batch
        FROM verdicts GROUP BY source
    """,
    "dedup_cross_source": """
        WITH fps AS (
            SELECT DISTINCT md5(substr(trim(text), 1, 64)) AS fp, source
            FROM documents
        )
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_shared_fps
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2
    """,
    "dedup_substring": """
        WITH g AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, length(text) - 31),
                       i -> substr(text, i, 32)))) AS g
            FROM documents
            WHERE length(text) >= 32
        )
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_shared
        FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 5
    """,
    "dedup_exact": """
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "dedup_ngram_jaccard": """
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        sh AS (
            SELECT doc_id AS doc,
                   unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                         for i in generate_series(1, len(words) - 2)])) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
        common AS (
            SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
            GROUP BY 1, 2
        )
        SELECT doc1, doc2,
               FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 AS jaccard
        FROM common
        JOIN sizes n1 ON common.doc1 = n1.doc
        JOIN sizes n2 ON common.doc2 = n2.doc
        WHERE FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 >= 0.5
    """,
    # dedup_prefix_filter is EXACT by the prefix-completeness theorem
    # (operators/dedup.py::prefix_filter_candidates docstring), so its
    # oracle of record is the same exact-pairs SQL as
    # dedup_ngram_jaccard; tests additionally pin output equality of
    # the two Spark operators at all three SFs.
    "dedup_ngram_capped": """
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        sh AS (
            SELECT doc_id AS doc,
                   unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                         for i in generate_series(1, len(words) - 2)])) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        hot AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > 50),
        kept AS (SELECT doc, sh FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM kept GROUP BY doc),
        common AS (
            SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS common
            FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc < b.doc
            GROUP BY 1, 2
        )
        SELECT doc1, doc2,
               FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 AS jaccard
        FROM common
        JOIN sizes n1 ON common.doc1 = n1.doc
        JOIN sizes n2 ON common.doc2 = n2.doc
        WHERE FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 >= 0.5
    """,
    "dedup_embedding_cosine": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS n
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               FLOOR((list_dot_product(a.v, b.v) / (a.n * b.n)) * 1e6 + 0.5) / 1e6 AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE FLOOR((list_dot_product(a.v, b.v) / (a.n * b.n)) * 1e6 + 0.5) / 1e6
              >= {COS_THRESHOLD}
    """,
    "dedup_graph_stats": """
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        sh AS (
            SELECT doc_id AS doc,
                   unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                         for i in generate_series(1, len(words) - 2)])) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
        common AS (
            SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc1, doc2
            FROM common
            JOIN sizes n1 ON common.doc1 = n1.doc
            JOIN sizes n2 ON common.doc2 = n2.doc
            WHERE FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 >= 0.5
        ),
        deg AS (
            SELECT n, COUNT(*) AS d FROM (
                SELECT doc1 AS n FROM pairs UNION ALL SELECT doc2 FROM pairs
            ) GROUP BY n
        ),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM pairs ab
            JOIN pairs bc ON ab.doc2 = bc.doc1
            JOIN pairs ac ON ac.doc1 = ab.doc1 AND ac.doc2 = bc.doc2
        )
        SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
               (SELECT COUNT(*) FROM pairs) AS n_edges,
               (SELECT n_triangles FROM tri) AS n_triangles,
               (SELECT MAX(d) FROM deg) AS max_degree
    """,
    "dedup_components": """
        WITH RECURSIVE w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        sh AS (
            SELECT doc_id AS doc,
                   unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                         for i in generate_series(1, len(words) - 2)])) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
        common AS (
            SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc1, doc2
            FROM common
            JOIN sizes n1 ON common.doc1 = n1.doc
            JOIN sizes n2 ON common.doc2 = n2.doc
            WHERE FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 >= 0.5
        ),
        und AS (
            SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION
            SELECT doc2, doc1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT DISTINCT a, a FROM und
            UNION
            SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.node
        )
        SELECT d.doc_id,
               CAST(COALESCE(MIN(reach.r), d.doc_id) AS BIGINT) AS component,
               COALESCE(MIN(reach.r), d.doc_id) = d.doc_id AS is_canonical
        FROM documents d LEFT JOIN reach ON reach.node = d.doc_id
        GROUP BY d.doc_id
    """,
    "dedup_components_twophase": """
        WITH RECURSIVE w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        sh AS (
            SELECT doc_id AS doc,
                   unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                         for i in generate_series(1, len(words) - 2)])) AS sh
            FROM w
            WHERE len(words) >= 3
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
        common AS (
            SELECT a.doc AS doc1, b.doc AS doc2, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc1, doc2
            FROM common
            JOIN sizes n1 ON common.doc1 = n1.doc
            JOIN sizes n2 ON common.doc2 = n2.doc
            WHERE FLOOR((CAST(common AS DOUBLE) / (n1.n_sh + n2.n_sh - common)) * 1e6 + 0.5) / 1e6 >= 0.5
        ),
        und AS (
            SELECT doc1 AS a, doc2 AS b FROM pairs
            UNION
            SELECT doc2, doc1 FROM pairs
        ),
        reach(node, r) AS (
            SELECT DISTINCT a, a FROM und
            UNION
            SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.node
        )
        SELECT d.doc_id,
               CAST(COALESCE(MIN(reach.r), d.doc_id) AS BIGINT) AS component,
               COALESCE(MIN(reach.r), d.doc_id) = d.doc_id AS is_canonical
        FROM documents d LEFT JOIN reach ON reach.node = d.doc_id
        GROUP BY d.doc_id
    """,
}

# exact-by-theorem: same output contract as the inverted-index exact join
ORACLES["dedup_prefix_filter"] = ORACLES["dedup_ngram_jaccard"]
