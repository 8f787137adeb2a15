"""Focused contracts for the r16 optimization-round internals.

Each test pins an equivalence an r16 plan restructure relies on, so a
future refactor cannot silently change results while chasing speed:

- row-local shingle dedup (array_distinct before the explode) equals
  the former global ``.distinct()`` and stays shuffle-free;
- ``key_count_sample_from_counts`` over a pre-aggregated (k, cnt)
  frame equals ``key_count_sample`` over the raw rows;
- the fused MinHash per-doc aggregation (mins + verify set in one
  groupBy) leaves the emitted pair set identical to the exact-Jaccard
  ground truth (the dedup_minhash_lsh oracle contract);
- pagerank's per-iteration lineage truncation (checkpoint_every=1)
  produces the identical ranks as the untruncated plan;
- composite star slices follow group_stats_max: over-cap files are
  excluded (pushdown declines, plain plan answers identically), and a
  cap sized to the bounded key space restores the zero-scan answer —
  the inherited-build hole that failed lake_star_group_pushdown at
  sf >= 0.01 (fixed in inventory/lakeops.py this round).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from quack_reduce_spark.inventory._util import load

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_local_distinct_shingles_match_global_distinct(spark):
    from quack_reduce_spark.operators.dedup import _shingle_table
    from quack_reduce_spark.plans import formatted_plan

    docs = load(spark, SF_DIR, "documents")
    local = _shingle_table(
        docs, "text", "doc_id", 3, hashed=True, distinct=False, local_distinct=True
    )
    global_ = _shingle_table(
        docs, "text", "doc_id", 3, hashed=True, distinct=True
    )
    assert _rows(local) == _rows(global_)
    # the point of the rewrite: per-row dedup adds no shuffle
    assert "Exchange" not in formatted_plan(local)


def test_key_count_sample_from_counts_matches_raw(spark):
    from quack_reduce_spark.operators.sketches import (
        key_count_sample,
        key_count_sample_from_counts,
    )

    li = load(spark, SF_DIR, "lineitem").select(F.col("l_partkey").alias("k"))
    counts = li.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    a = key_count_sample(li, "k", 64).collect()[0]["__smp"]
    b = key_count_sample_from_counts(counts, 64).collect()[0]["__smp"]
    assert [tuple(s) for s in a] == [tuple(s) for s in b]


def test_fused_minhash_equals_exact_pairs(spark):
    from quack_reduce_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF_DIR, "documents")
    lsh = _rows(minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5))
    exact = _rows(ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5))
    assert lsh == exact  # the r7 oracle-of-record contract


def test_star_composite_slices_follow_group_stats_max(spark, tmp_path):
    """The inherited-build hole fixed in r16: a composite slice column
    whose PER-FILE distinct-combo count exceeds group_stats_max gets
    excluded wholesale, so the mixed-key star pushdown must decline at
    the default cap and answer (files_scanned == 0) once the cap is
    sized to the bounded key space."""
    import pyspark.sql.functions as F2

    from quack_reduce_spark.engine import Engine
    from quack_reduce_spark.operators import zonemaps as Z

    # 1 file x 600 rows covering 25x7 = 175 combos (> the 64 default;
    # coprime moduli so the two key parts are independent)
    fact = spark.range(600).select(
        F2.col("id").alias("k"),
        (F2.col("id") % 25).cast("int").alias("nk"),
        F2.concat(F2.lit("seg"), (F2.col("id") % 7)).alias("seg"),
    )
    dim = spark.createDataFrame(
        [(i, f"nation{i}") for i in range(25)], "n_nk int, n_name string"
    )
    dim_path = str(tmp_path / "dim")
    dim.coalesce(1).write.parquet(dim_path)
    q = (
        "SELECT seg, n_name, COUNT(*) AS n FROM {f} JOIN {d} "
        "ON nk = n_nk GROUP BY seg, n_name ORDER BY seg, n_name"
    )

    def run(cap):
        p = str(tmp_path / f"fact_{cap}")
        fact.coalesce(1).write.parquet(p)
        Z.write_zonemap(
            spark, p, ["k", "nk", "seg"],
            group_stats_cols=["nk,seg"], group_stats_max=cap,
        )
        eng = Engine(spark=spark, result_cache=False)
        eng.register(f"f_{cap}", p)
        eng.register(f"d_{cap}", dim_path)
        rows = eng.df(q.format(f=f"f_{cap}", d=f"d_{cap}")).collect()
        return rows, eng.last_star_plan

    rows_default, tele_default = run(64)
    assert tele_default is None  # over-cap: excluded, plain plan runs
    rows_sized, tele_sized = run(256)
    assert tele_sized is not None and tele_sized["files_scanned"] == 0
    assert [tuple(r) for r in rows_default] == [tuple(r) for r in rows_sized]


def test_pagerank_checkpoint_interval_does_not_change_ranks(spark):
    from quack_reduce_spark.operators.pagerank import pagerank

    edges = (
        load(spark, SF_DIR, "lineitem")
        .join(
            load(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
        )
        .distinct()
    )
    fast = pagerank(edges, iters=3, checkpoint_every=1)
    slow = pagerank(edges, iters=3, checkpoint_every=0)
    f = {r["node"]: r["rank"] for r in fast.collect()}
    s = {r["node"]: r["rank"] for r in slow.collect()}
    # r17 (r16 ADVICE): compare with a tolerance, not exact float
    # equality — the two physical plans may sum double contributions
    # in different shuffle-fetch orders; the CONTRACT is the rounded-7
    # rank the oracle hashes, so 1e-12 is far stricter than needed
    # while immune to last-ulp reassociation
    assert set(f) == set(s)
    assert all(abs(f[n] - s[n]) < 1e-12 for n in f)


def test_accumulated_positional_filter_bounds(spark):
    """The r16 pair-level PPJoin filter in _candidates_from_prefix:
    bound (2) ``m + min(n1-im-1, n2-jm-1) >= alpha`` must drop a pair
    whose every witness row passed the old per-row bound (1), while a
    genuinely reachable pair survives both bounds.  threshold=0.5:

    - docs 1,2: sz=10 -> alpha = ceil(0.5*20/1.5) = 7; matches at
      ranks (0,0) and (5,5): bound (1) = 1 + 9 = 10 >= 7 (the old
      shape kept this pair) but m=2, im=jm=5 -> 2 + 4 = 6 < 7 — the
      accumulated bound proves overlap can never reach alpha: DROP.
    - docs 3,4: sz=4 -> alpha = 3; matches at (0,0) and (1,1):
      bound (1) = 1 + 2 = 3 >= 3, bound (2) = 2 + 2 = 4 >= 3: KEEP.
    """
    from quack_reduce_spark.operators.dedup import _candidates_from_prefix

    rows = []
    for pos, sh in enumerate([101, 102, 103, 104, 105, 109]):
        rows.append((1, 10, pos, sh))
    for pos, sh in enumerate([101, 206, 207, 208, 209, 109]):
        rows.append((2, 10, pos, sh))
    for pos, sh in enumerate([301, 302, 303]):
        rows.append((3, 4, pos, sh))
    for pos, sh in enumerate([301, 302, 404]):
        rows.append((4, 4, pos, sh))
    prefix = spark.createDataFrame(rows, ["doc", "sz", "pos", "sh"])
    cands = _rows(_candidates_from_prefix(prefix, 0.5))
    assert (1, 2) not in cands
    assert (3, 4) in cands
