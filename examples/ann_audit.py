"""ANN/dedup audit — the runnable form of the portable-twin claim.

Every approximate operator in this engine ships in two flavors:

- a PRODUCTION variant (xxhash64 / seeded-Gaussian hash families —
  cheapest per row, engine-specific), verified by recall floors
  against exact ground truth (docs/RECALL.md), and
- a PORTABLE twin (md5-derived hash families, integer-exact
  projections) whose every intermediate — fingerprints, bands,
  candidates, rerank scores — is replayed by a DuckDB SQL oracle and
  hash-compared (tools/check_oracle.py).

This audit runs both flavors side by side on the fixtures and prints,
per operator family: the exact-ground-truth size, each variant's pair
count, their precision against exact (1.0 by construction — both
verify candidates exactly), and the overlap between the two variants
(different hash families ⇒ different recall sets; BOTH being subsets
of exact is the invariant that matters). Exit code is non-zero if any
variant emits a pair outside the exact set — the "approximate means
unsound" failure this engine is designed to make impossible.

Run:  python examples/ann_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def audit(spark, sf_dir: str) -> list[dict]:
    from quack_reduce_spark.operators import dedup as D
    from quack_reduce_spark.operators import similarity as S
    from quack_reduce_spark.sources import read_parquet_table

    docs = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet_table(spark, f"{sf_dir}/embeddings.parquet")
    rows = []

    def pairs(df, cols=("doc1", "doc2")):
        return {tuple(r[c] for c in cols) for r in df.collect()}

    exact_j = pairs(D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5))
    prod_mh = pairs(D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5))
    port_mh = pairs(D.minhash_lsh_pairs_portable(docs, "text", "doc_id"))
    rows.append(
        {
            "family": "minhash_lsh",
            "exact": len(exact_j),
            "production": len(prod_mh),
            "portable": len(port_mh),
            "prod_sound": prod_mh <= exact_j,
            "port_sound": port_mh <= exact_j,
            "overlap": len(prod_mh & port_mh),
        }
    )

    exact_c = pairs(
        S.cosine_pairs(emb, "vec_id", "embedding", threshold=0.4),
        cols=("id_a", "id_b"),
    )
    prod_lsh = pairs(
        S.lsh_cosine_pairs(emb, dim=64, threshold=0.4), cols=("id_a", "id_b")
    )
    port_lsh = pairs(
        S.lsh_cosine_pairs_portable(emb, dim=64, threshold=0.4),
        cols=("id_a", "id_b"),
    )
    rows.append(
        {
            "family": "embedding_sign_lsh",
            "exact": len(exact_c),
            "production": len(prod_lsh),
            "portable": len(port_lsh),
            "prod_sound": prod_lsh <= exact_c,
            "port_sound": port_lsh <= exact_c,
            "overlap": len(prod_lsh & port_lsh),
        }
    )
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from quack_reduce_spark.session import get_spark

    spark = get_spark(app_name="ann-audit")
    rows = audit(spark, sf_dir)
    bad = False
    for r in rows:
        print(
            f"{r['family']:>20}: exact={r['exact']:>4} "
            f"production={r['production']:>4} (sound={r['prod_sound']}) "
            f"portable={r['portable']:>4} (sound={r['port_sound']}) "
            f"overlap={r['overlap']}"
        )
        bad = bad or not (r["prod_sound"] and r["port_sound"])
    if bad:
        raise SystemExit("UNSOUND: an approximate variant emitted a non-exact pair")
    print("all approximate variants are precision-1.0 subsets of exact")


if __name__ == "__main__":
    main()
