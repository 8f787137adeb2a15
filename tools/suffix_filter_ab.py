"""PPJoin+ SUFFIX-filter A/B (r16 verdict #8): does per-pair suffix
probing pay on a corpus whose candidate/true-pair ratio is far higher
than the registry fixture's?

The committed prefix join (operators/dedup.py::_candidates_from_prefix)
applies the r9 length + positional filters and the r16 accumulated
pair-level bounds. PPJoin+ (Xiao et al. 2008) adds a SUFFIX filter:
for a surviving pair, split doc1's unmatched suffix at its median
shingle, locate that pivot in doc2's suffix, and bound the remaining
overlap by min(left-halves) + min(right-halves) + 1 — sound because
both suffixes are sorted in the SAME global (df, sh) order, so no
element of a left half can match an element of a right half.

This script measures BOTH corpora:

- ``fixture``: the registry documents table at $SPARK_GRAFT_SF_DIR
  (balanced phases; r16 predicted no win here);
- ``skewed``: a deterministic high-collision corpus — docs drawn from
  a tiny vocabulary so nearly every prefix shingle is shared and the
  candidate set dwarfs the true-pair set (the regime the suffix
  filter targets).

It verifies output EQUALITY (the suffix filter may only drop pairs
that provably cannot reach the threshold) before timing, then times
the committed shape vs the suffix-filtered shape and reports candidate
counts at each pruning stage. Run one mode per process for clean
timing:

    python tools/suffix_filter_ab.py committed skewed
    python tools/suffix_filter_ab.py suffix skewed
    python tools/suffix_filter_ab.py equality skewed   # gate, no timing

The suffix variant lives HERE, not in the registry: the decision rule
(r16 verdict) is "keep out of the registry if it loses on the bench
fixture" — numbers go to OPTIMIZATION_r17.md either way.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, Window  # noqa: E402

from quack_reduce_spark.operators import dedup as D  # noqa: E402

THRESHOLD = 0.5
N = 3


def skewed_corpus(spark, n_docs: int = 4000, doc_len: int = 24, vocab: int = 40):
    """High-collision corpus: tokens drawn from a tiny vocabulary via a
    seeded affine hash — deterministic, no RNG state. Shingle document
    frequencies are huge, so prefixes collide massively and the
    candidate/true-pair ratio explodes (the PPJoin+ target regime)."""
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n_docs):
        toks = []
        h = d * 2654435761 % (1 << 32)
        for p in range(doc_len):
            h = (h * 1103515245 + 12345 + p) % (1 << 31)
            toks.append(words[h % vocab])
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def fixture_corpus(spark):
    from quack_reduce_spark.inventory._util import load

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return load(spark, sf, "documents")


def _struct_frames(df: DataFrame):
    """(prefix, perdoc_structs): like D._prefix_frames but the per-doc
    list KEEPS the (df_, sh) structs — the suffix filter needs the
    global-order keys to compare against the pivot."""
    toks = D._shingle_table(
        df, "text", "doc_id", N, hashed=True, distinct=False, local_distinct=True
    )
    annotated = toks.withColumn(
        "df_", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    )
    perdoc = (
        annotated.groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df_", "sh"))).alias("__lst"))
        .select("doc", F.array_size("__lst").alias("sz"), "__lst")
        .localCheckpoint(eager=False)
    )
    prefix = perdoc.select(
        "doc",
        "sz",
        F.posexplode(
            F.slice(
                F.transform("__lst", lambda s: s["sh"]),
                F.lit(1),
                (F.col("sz") - F.ceil(F.lit(THRESHOLD) * F.col("sz")) + 1).cast("int"),
            )
        ).alias("pos", "sh"),
    )
    return prefix, perdoc


def suffix_filtered_pairs(df: DataFrame, stop_at_filter: bool = False) -> DataFrame:
    """prefix_filter_pairs + the PPJoin+ H=1 suffix filter between the
    accumulated positional filter and the exact verify.
    ``stop_at_filter`` returns the post-suffix-bound candidate frame
    (pruning-rate telemetry) instead of the verified pairs."""
    prefix, perdoc = _struct_frames(df)
    left = prefix.select(
        F.col("doc").alias("doc1"), F.col("sz").alias("n1"),
        F.col("pos").alias("i"), "sh",
    )
    right = prefix.select(
        F.col("doc").alias("doc2"), F.col("sz").alias("n2"),
        F.col("pos").alias("j"), "sh",
    )
    alpha = F.ceil(
        F.lit(THRESHOLD) * (F.col("n1") + F.col("n2")) / F.lit(1.0 + THRESHOLD)
    )
    cand = (
        left.join(right, "sh")
        .filter(F.col("doc1") < F.col("doc2"))
        .filter(
            (F.col("n2") >= F.ceil(F.lit(THRESHOLD) * F.col("n1")))
            & (F.col("n1") >= F.ceil(F.lit(THRESHOLD) * F.col("n2")))
        )
        .groupBy("doc1", "doc2")
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.min("i").alias("__i0"),
            F.min("j").alias("__j0"),
            F.max("i").alias("__im"),
            F.max("j").alias("__jm"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
        .filter(
            (
                1 + F.least(
                    F.col("n1") - F.col("__i0") - 1, F.col("n2") - F.col("__j0") - 1
                )
                >= alpha
            )
            & (
                F.col("__m") + F.least(
                    F.col("n1") - F.col("__im") - 1, F.col("n2") - F.col("__jm") - 1
                )
                >= alpha
            )
        )
    )
    # suffix filter: fetch both struct lists, slice the unmatched
    # suffixes (ranks after im / jm), H=1 pivot split, sound bound
    withsets = (
        cand.join(
            perdoc.select(F.col("doc").alias("doc1"), F.col("__lst").alias("__l1")),
            "doc1",
        )
        .join(
            perdoc.select(F.col("doc").alias("doc2"), F.col("__lst").alias("__l2")),
            "doc2",
        )
    )
    sfx1 = F.slice(
        F.col("__l1"), (F.col("__im") + 2).cast("int"),
        F.greatest(F.col("n1") - F.col("__im") - 1, F.lit(0)).cast("int"),
    )
    sfx2 = F.slice(
        F.col("__l2"), (F.col("__jm") + 2).cast("int"),
        F.greatest(F.col("n2") - F.col("__jm") - 1, F.lit(0)).cast("int"),
    )
    filtered = (
        withsets.withColumn("__sfx1", sfx1)
        .withColumn("__sfx2", sfx2)
        .withColumn(
            "__p",
            F.try_element_at(  # NULL (not ANSI error) on an empty suffix
                "__sfx1",
                F.greatest(F.ceil(F.array_size("__sfx1") / 2).cast("int"), F.lit(1)),
            ),
        )
        .withColumn(
            "__l2left",
            F.when(
                F.array_size("__sfx1") == 0, F.lit(0)
            ).otherwise(
                F.array_size(
                    F.filter(
                        "__sfx2",
                        lambda e: (e["df_"] < F.col("__p")["df_"])
                        | (
                            (e["df_"] == F.col("__p")["df_"])
                            & (e["sh"] < F.col("__p")["sh"])
                        ),
                    )
                )
            ),
        )
        .withColumn("__l1left", F.greatest(F.ceil(F.array_size("__sfx1") / 2).cast("int") - 1, F.lit(0)))
        .withColumn(
            "__ub",
            F.col("__m")
            + F.when(
                F.array_size("__sfx1") == 0, F.lit(0)
            ).otherwise(
                F.least(F.col("__l1left"), F.col("__l2left"))
                + F.lit(1)  # the pivot itself may match
                + F.least(
                    F.array_size("__sfx1") - F.col("__l1left") - 1,
                    F.array_size("__sfx2") - F.col("__l2left"),
                )
            ),
        )
        .filter(F.col("__ub") >= alpha)
    )
    if stop_at_filter:
        return filtered.select("doc1", "doc2")
    verify_input = filtered.select(
        "doc1",
        "doc2",
        F.transform("__l1", lambda s: s["sh"]).alias("__s1"),
        F.transform("__l2", lambda s: s["sh"]).alias("__s2"),
    )
    return D.verified_jaccard_pairs(verify_input, THRESHOLD, "doc1", "doc2")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "equality"
    which = sys.argv[2] if len(sys.argv) > 2 else "skewed"
    from quack_reduce_spark.session import get_spark

    spark = get_spark(app_name=f"suffix-ab-{mode}")
    docs = skewed_corpus(spark) if which == "skewed" else fixture_corpus(spark)
    docs = docs.localCheckpoint(eager=True)  # corpus gen off the clock

    if mode == "equality":
        a = sorted(map(tuple, D.prefix_filter_pairs(docs, "text", "doc_id", n=N, threshold=THRESHOLD).collect()))
        b = sorted(map(tuple, suffix_filtered_pairs(docs).collect()))
        print(f"EQUALITY {which}: pairs={len(a)} equal={a == b}")
        # pruning telemetry: candidates at each stage
        prefix, perdoc = D._prefix_frames(docs, "text", "doc_id", N, THRESHOLD)
        n_committed = D._candidates_from_prefix(prefix, THRESHOLD).count()
        print(f"CANDIDATES {which}: committed={n_committed} true_pairs={len(a)}")
        return

    fn = (
        (lambda: D.prefix_filter_pairs(docs, "text", "doc_id", n=N, threshold=THRESHOLD).count())
        if mode == "committed"
        else (lambda: suffix_filtered_pairs(docs).count())
    )
    fn()  # warmup
    ts = []
    for _ in range(4):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"ABRESULT {mode} {which} min={min(ts):.3f} mean={sum(ts)/len(ts):.3f} all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
