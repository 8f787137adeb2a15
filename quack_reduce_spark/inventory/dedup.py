"""Deduplication inventory over the documents table (north-star ops).

dedup_exact / dedup_ngram_jaccard have exact DuckDB oracles.
dedup_minhash_lsh / dedup_simhash are genuinely non-SQL-expressible
(banded LSH with engine-specific hash permutations) → driver rows-only
check + unit tests in tests/test_dedup.py asserting agreement with the
exact-Jaccard ground truth on the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from quack_reduce_spark.inventory._util import load
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


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8 bands) candidates verified by exact Jaccard.

    No SQL oracle (engine-specific xxhash64 permutations); unit-tested
    against dedup_ngram_jaccard for recall on the fixtures.
    """
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup candidate pairs (Hamming <= 3), banded.

    No SQL oracle (xxhash64 bit votes); unit-tested for overlap with
    the exact near-dup ground truth.
    """
    docs = load(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "text", "doc_id", max_hamming=3)


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
}


ORACLES = {
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
}
