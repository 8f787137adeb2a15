"""Training-corpus assembly inventory: the steps between "curated
documents" and "token stream on the trainer" that every large-scale
LLM data pipeline runs, recast as pure JVM expression pipelines with
exact DuckDB oracles.

- eval-set decontamination (benchmark n-gram overlap removal — the
  GPT-3 appendix-C / PaLM §8 procedure)
- unigram-LM quality scoring (perplexity-proxy filtering; the
  CCNet/KenLM shape with the LM reduced to corpus unigrams so the
  oracle is exact)
- temperature-resampled domain mixture weights (the multilingual /
  multi-source sampling formula p_i ∝ c_i^alpha)
- concat-and-chunk sequence packing accounting (GPT-style fixed
  context windows over the concatenated per-source token stream)

The reference has no text surface (SURVEY §2 Tier C verified absence);
these extend the north-star curation family in inventory/text.py /
text2.py.

Scale notes per operator are on the functions; none of them uses
Python UDFs, driver collects, or joins wider than one
equality-keyed shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, rnd

DECON_NGRAM = 8          # benchmark-overlap n-gram width
EVAL_MOD = 25            # doc_id % EVAL_MOD == 0 -> held-out "benchmark" docs
PACK_WINDOW = 2048       # context length for sequence packing
MIX_ALPHA = 0.5          # temperature-resampling exponent
MIX_BUDGET = 1_000_000   # token budget the mixture weights allocate


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, source, pos, w) — whitespace tokens, one posexplode."""
    return docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    )


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with ``doc_id % 25 == 0`` play
    the held-out eval set; a training doc is CONTAMINATED if it shares
    any word 8-gram with any eval doc (the GPT-3/PaLM overlap rule).
    Returns per-source counts + contamination rate.

    Shape: 8-grams are assembled NARROW (split once → transform over
    an index sequence → explode — no shuffle, no window; the codegen
    rationale in operators/dedup._shingle_table). The eval side is
    distinct-aggregated and broadcast: real benchmark suites are a few
    MB of n-grams while the training corpus is the 100 TB side, so the
    contamination test is a broadcast LEFT SEMI join against the scan —
    the fact table never shuffles.
    """
    docs = load(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.col("text")), r"\s+")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size(arr) >= DECON_NGRAM,
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - DECON_NGRAM),
                    lambda i: F.array_join(F.slice(arr, i + 1, DECON_NGRAM), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("g").distinct()
    )
    train = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    contaminated = (
        train.join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    train_docs = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    per_source = train_docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    bad = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return (
        per_source.join(bad, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
            rnd(
                F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_docs"), 6
            ).alias("contamination_rate"),
        )
    )


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (perplexity-proxy filtering): build
    corpus unigram probabilities, score each doc by its mean negative
    log-likelihood, report per-source mean doc NLL. The CCNet pipeline
    scores with a KenLM 5-gram model; reducing the LM to corpus
    unigrams keeps the distributed shape identical (model build =
    one aggregation; scoring = one join + one aggregation) while the
    oracle stays exactly SQL-expressible.

    Scale: the fitted vocab for natural-language corpora is millions
    of rows — broadcast it; the token stream (the 100 TB side) is
    joined without shuffling ITS key distribution anywhere, then
    aggregated per doc and per source (two partial-agg shuffles).
    """
    docs = load(spark, sf_dir, "documents")
    tok = _tokens(docs)
    total = tok.count()  # scalar model constant (one job, like any fit step)
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "source")
        .agg(
            rnd(F.avg(-F.log(F.col("c") / F.lit(float(total)))), 4).alias("doc_nll")
        )
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("doc_nll"), 4).alias("mean_nll"),
        rnd(F.min("doc_nll"), 4).alias("best_nll"),
        rnd(F.max("doc_nll"), 4).alias("worst_nll"),
    )


def text_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled domain mixture: per-source token counts
    c_i become sampling weights p_i = c_i^alpha / Σ c_j^alpha
    (alpha = 0.5 — the multilingual-BERT / XLM-R exponent that
    up-samples small sources), plus the expected token allocation at a
    fixed training budget. One aggregation + one broadcast scalar —
    trivially 100 TB-safe.
    """
    docs = load(spark, sf_dir, "documents")
    counts = _tokens(docs).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    powed = counts.withColumn("pw", F.pow(F.col("n_tokens"), F.lit(MIX_ALPHA)))
    denom = powed.agg(F.sum("pw")).collect()[0][0]  # scalar fit constant
    return powed.select(
        "source",
        "n_tokens",
        rnd(F.col("pw") / F.lit(denom), 6).alias("weight"),
        F.floor(F.col("pw") / F.lit(denom) * MIX_BUDGET).cast("long").alias(
            "budget_tokens"
        ),
    )


def text_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing accounting: per source, docs
    are concatenated in doc_id order and split into fixed 2048-token
    context windows (GPT-style packing). Reports windows produced,
    docs straddling a window boundary, and the fill of the final
    ragged window. Pure integer math → exact oracle.

    Shape: one window cumsum per source (the packing order is a sort
    within the source partition — at 100 TB sources are further
    range-bucketed by doc_id so no single partition holds a source's
    whole stream; the cumsum then runs per bucket with bucket offsets,
    same math).
    """
    docs = load(spark, sf_dir, "documents")
    ntok = _tokens(docs).groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = ntok.select(
        "source",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("start"),
        (F.sum("n").over(w) - 1).alias("last"),
    )
    return placed.groupBy("source").agg(
        F.sum("n").alias("total_tokens"),
        F.ceil(F.sum("n") / F.lit(PACK_WINDOW)).cast("long").alias("n_windows"),
        F.count_if(
            F.floor(F.col("start") / PACK_WINDOW)
            != F.floor(F.col("last") / PACK_WINDOW)
        ).alias("n_boundary_docs"),
        (((F.sum("n") - 1) % PACK_WINDOW) + 1).alias("final_window_fill"),
    )


def text_adaptive_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality thresholds: instead of one global cutoff, each
    source is gated against its OWN distribution — docs below their
    source's p25 token count are flagged. The per-source quantile
    (exact linear interpolation, same in both engines) is a tiny
    aggregate broadcast back onto the doc stats; reports the funnel
    per source. This is how heterogeneous-corpus filtering avoids
    starving short-form sources that a global threshold would wipe out.
    """
    docs = load(spark, sf_dir, "documents")
    ntok = _tokens(docs).groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    cuts = ntok.groupBy("source").agg(
        F.percentile(F.col("n"), F.lit(0.25)).alias("p25")
    )
    gated = ntok.join(F.broadcast(cuts), "source").select(
        "source", "p25", (F.col("n") < F.col("p25")).alias("below")
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("below")).alias("n_gated"),
        rnd(F.first("p25"), 4).alias("p25_tokens"),
    )


EPOCH_SEED = 3  # epoch number = shuffle seed
EPOCH_SHARDS = 16
KNUTH = 2654435761  # 2^32 / phi, the multiplicative-hash constant


def text_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffling: every doc gets a pseudo-random
    but fully reproducible (shard, position) for a given epoch seed —
    the RNG-free global shuffle a distributed trainer needs (any
    worker can recompute any shard's order; no shuffle-state files).
    Key = Knuth multiplicative hash of (doc_id, epoch) in 32-bit
    space; shard = key mod 16; position = rank of key within the
    shard (ties impossible: key collisions fall back to doc_id
    tiebreak, which the rank includes).

    One hash shuffle into shards + one per-shard sort — at 100 TB this
    is the write path of write_sharded with a computed order column.
    """
    docs = load(spark, sf_dir, "documents")
    key = F.pmod(
        (F.col("doc_id") + EPOCH_SEED) * F.lit(KNUTH), F.lit(2**32)
    ).alias("shuffle_key")
    keyed = docs.select("doc_id", key)
    keyed = keyed.withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(EPOCH_SHARDS)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("position")
    )


def text_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED form of text_pack_windows: one row per
    (doc, window) overlap with the doc's token span inside that window
    — the actual packing map a dataloader consumes (which windows to
    build from which docs, and how many tokens each contributes).
    A doc spanning windows w_a..w_b explodes to b-a+1 rows via a
    sequence over its window range; contribution arithmetic is pure
    integer math, so the whole fan-out is exactly oracle-checkable.
    """
    docs = load(spark, sf_dir, "documents")
    ntok = _tokens(docs).groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = ntok.select(
        "source",
        "doc_id",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("start"),
        (F.sum("n").over(w) - 1).alias("last"),
    )
    W_ = PACK_WINDOW
    exploded = placed.select(
        "source",
        "doc_id",
        "start",
        "last",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / W_).cast("long"),
                F.floor(F.col("last") / W_).cast("long"),
            )
        ).alias("window_idx"),
    )
    return exploded.select(
        "source",
        "doc_id",
        "window_idx",
        (
            F.least(F.col("last"), (F.col("window_idx") + 1) * W_ - 1)
            - F.greatest(F.col("start"), F.col("window_idx") * W_)
            + 1
        ).alias("n_tokens_in_window"),
    )


QUERIES = {
    "text_decontaminate": text_decontaminate,
    "text_adaptive_gate": text_adaptive_gate,
    "text_epoch_order": text_epoch_order,
    "text_pack_assignments": text_pack_assignments,
    "text_lm_score": text_lm_score,
    "text_mixture_weights": text_mixture_weights,
    "text_pack_windows": text_pack_windows,
}

ORACLES = {
    "text_decontaminate": f"""
        WITH toks AS (
            SELECT doc_id, source,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id, source,
                   array_to_string(t[i:i+{DECON_NGRAM - 1}], ' ') AS g
            FROM toks,
                 UNNEST(range(1, len(t) - {DECON_NGRAM} + 2)) AS r(i)
            WHERE len(t) >= {DECON_NGRAM}
        ),
        eval_grams AS (
            SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0
        ),
        contaminated AS (
            SELECT DISTINCT doc_id, source
            FROM grams
            WHERE doc_id % {EVAL_MOD} != 0
              AND g IN (SELECT g FROM eval_grams)
        ),
        per_source AS (
            SELECT source, COUNT(*) AS n_docs
            FROM documents WHERE doc_id % {EVAL_MOD} != 0 GROUP BY source
        ),
        bad AS (
            SELECT source, COUNT(*) AS n_contaminated
            FROM contaminated GROUP BY source
        )
        SELECT p.source,
               p.n_docs,
               COALESCE(b.n_contaminated, 0) AS n_contaminated,
               FLOOR(COALESCE(b.n_contaminated, 0) / p.n_docs * 1e6 + 0.5) / 1e6
                   AS contamination_rate
        FROM per_source p LEFT JOIN bad b USING (source)
    """,
    "text_lm_score": """
        WITH tok AS (
            SELECT doc_id, source, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
        ),
        total AS (SELECT COUNT(*) AS n FROM tok),
        vocab AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        per_doc AS (
            SELECT t.doc_id, t.source,
                   FLOOR(AVG(-LN(v.c / (SELECT n FROM total))) * 1e4 + 0.5) / 1e4
                       AS doc_nll
            FROM tok t JOIN vocab v USING (w)
            GROUP BY t.doc_id, t.source
        )
        SELECT source,
               COUNT(*) AS n_docs,
               FLOOR(AVG(doc_nll) * 1e4 + 0.5) / 1e4 AS mean_nll,
               FLOOR(MIN(doc_nll) * 1e4 + 0.5) / 1e4 AS best_nll,
               FLOOR(MAX(doc_nll) * 1e4 + 0.5) / 1e4 AS worst_nll
        FROM per_doc GROUP BY source
    """,
    "text_mixture_weights": f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n_tokens
            FROM (
                SELECT doc_id, source,
                       UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
                FROM documents
            ) GROUP BY source
        ),
        powed AS (
            SELECT source, n_tokens, POWER(n_tokens, {MIX_ALPHA}) AS pw
            FROM counts
        )
        SELECT source,
               n_tokens,
               FLOOR(pw / (SELECT SUM(pw) FROM powed) * 1e6 + 0.5) / 1e6 AS weight,
               CAST(FLOOR(pw / (SELECT SUM(pw) FROM powed) * {MIX_BUDGET})
                    AS BIGINT) AS budget_tokens
        FROM powed
    """,
    "text_epoch_order": f"""
        WITH keyed AS (
            SELECT doc_id,
                   ((doc_id + {EPOCH_SEED}) * {KNUTH}) % 4294967296
                       AS shuffle_key
            FROM documents
        )
        SELECT doc_id,
               CAST(shuffle_key % {EPOCH_SHARDS} AS INT) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY shuffle_key % {EPOCH_SHARDS}
                   ORDER BY shuffle_key ASC, doc_id ASC
               ) AS INT) AS position
        FROM keyed
    """,
    "text_adaptive_gate": """
        WITH ntok AS (
            SELECT doc_id, source, COUNT(*) AS n
            FROM (
                SELECT doc_id, source,
                       UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
                FROM documents
            ) GROUP BY doc_id, source
        ),
        cuts AS (
            SELECT source, quantile_cont(n, 0.25) AS p25
            FROM ntok GROUP BY source
        )
        SELECT t.source,
               COUNT(*) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE t.n < c.p25) AS BIGINT) AS n_gated,
               FLOOR(c.p25 * 1e4 + 0.5) / 1e4 AS p25_tokens
        FROM ntok t JOIN cuts c USING (source)
        GROUP BY t.source, c.p25
    """,
    "text_pack_assignments": f"""
        WITH ntok AS (
            SELECT doc_id, source, COUNT(*) AS n
            FROM (
                SELECT doc_id, source,
                       UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
                FROM documents
            ) GROUP BY doc_id, source
        ),
        placed AS (
            SELECT source, doc_id, n,
                   SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n AS start,
                   SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - 1 AS last
            FROM ntok
        ),
        exploded AS (
            SELECT source, doc_id, start, last, s.w AS window_idx
            FROM placed,
                 UNNEST(range(CAST(FLOOR(start / {PACK_WINDOW}) AS BIGINT),
                              CAST(FLOOR(last / {PACK_WINDOW}) AS BIGINT) + 1))
                     AS s(w)
        )
        SELECT source, doc_id, window_idx,
               CAST(LEAST(last, (window_idx + 1) * {PACK_WINDOW} - 1)
                   - GREATEST(start, window_idx * {PACK_WINDOW}) + 1
                   AS BIGINT) AS n_tokens_in_window
        FROM exploded
    """,
    "text_pack_windows": f"""
        WITH ntok AS (
            SELECT doc_id, source, COUNT(*) AS n
            FROM (
                SELECT doc_id, source,
                       UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
                FROM documents
            ) GROUP BY doc_id, source
        ),
        placed AS (
            SELECT source, n,
                   SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n AS start,
                   SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - 1 AS last
            FROM ntok
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               CAST(CEIL(SUM(n) / {PACK_WINDOW}.0) AS BIGINT) AS n_windows,
               CAST(COUNT(*) FILTER (
                   WHERE FLOOR(start / {PACK_WINDOW}) != FLOOR(last / {PACK_WINDOW})
               ) AS BIGINT) AS n_boundary_docs,
               CAST(((SUM(n) - 1) % {PACK_WINDOW}) + 1 AS BIGINT)
                   AS final_window_fill
        FROM placed GROUP BY source
    """,
}
