"""Corpus quality-filter inventory (Gopher/C4-style heuristics).

The published rule families behind large-scale training-corpus
curation — Gopher's document-quality bounds (Rae et al. 2021, §A1.1)
and C4's cleanup heuristics (Raffel et al. 2020, §2.2) — recast as
pure JVM expression pipelines over the documents table. The reference
has no text surface at all (SURVEY §2 Tier C); these extend the
north-star curation family (BASELINE.json) alongside
``inventory/text.py``.

Every metric is relational (posexplode + window + hash aggregates —
no Python in the hot path) and every query has an exact DuckDB
oracle. Scale shape: everything keys on doc_id, so the whole module
is ordinary partial/final aggregation — no self-joins, no windows
wider than one document.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.inventory._util import load, rnd

# Gopher-style acceptance bounds (document-level quality gate).
MIN_WORDS = 40
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_TOP_BIGRAM_FRAC = 0.20


def _doc_token_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(token stats, bigram stats) keyed by doc_id.

    One posexplode feeds both: per-token aggregates directly, and
    adjacent-pair (bigram) counts via a lead() window — the same
    window-assembly shape as operators/dedup._shingle_table, chosen
    over array expressions for the codegen reasons documented there.
    """
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    )
    tstats = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        rnd(F.avg(F.length("w")), 4).alias("mean_word_len"),
        F.count_distinct(F.col("w")).alias("n_distinct"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            "doc_id",
            F.col("w"),
            F.lead("w", 1).over(win).alias("__nx"),
        )
        .filter(F.col("__nx").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "__nx").alias("bg"))
    )
    bstats = (
        big.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    return tstats, bstats


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher-style quality metrics + accept flag.

    Metrics: word count, mean word length, type-token ratio (lexical
    diversity), and the fraction of bigram slots taken by the single
    most frequent bigram (the repetition signal behind Gopher's
    'fraction of characters in most common n-gram' rules). ``accept``
    applies the published-bounds gate.
    """
    docs = load(spark, sf_dir, "documents")
    tstats, bstats = _doc_token_frames(docs)
    ttr = rnd(F.col("n_distinct") / F.col("n_words"), 4)
    top_frac = rnd(F.col("top_c") / F.col("n_bigrams"), 4)
    return (
        tstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "mean_word_len",
            ttr.alias("type_token_ratio"),
            top_frac.alias("top_bigram_frac"),
            (
                (F.col("n_words") >= MIN_WORDS)
                & (F.col("n_words") <= MAX_WORDS)
                & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
                & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
                & (F.coalesce(top_frac <= MAX_TOP_BIGRAM_FRAC, F.lit(False)))
            ).alias("accept"),
        )
    )


def text_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel: per source, how many docs survive each quality
    gate and the whole pipeline — the standard 'docs removed per rule'
    report every corpus-cleaning paper publishes (C4 §2.2, Gopher A1).
    Gates: word-count bounds, mean-word-length band, stopword evidence
    (>= 2 stopword hits, C4's English heuristic), bigram repetition.
    """
    docs = load(spark, sf_dir, "documents")
    tstats, bstats = _doc_token_frames(docs)
    sw = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: x.isin("the", "a", "and", "of", "to"),
            )
        ).alias("n_sw"),
    )
    per_doc = (
        sw.join(tstats, "doc_id")
        .join(bstats, "doc_id", "left")
        .select(
            "source",
            (F.col("n_words").between(MIN_WORDS, MAX_WORDS)).alias("g_len"),
            (
                F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
            ).alias("g_wordlen"),
            (F.col("n_sw") >= 2).alias("g_stopword"),
            F.coalesce(
                rnd(F.col("top_c") / F.col("n_bigrams"), 4) <= MAX_TOP_BIGRAM_FRAC,
                F.lit(False),
            ).alias("g_repetition"),
        )
    )
    cnt = lambda c: F.count_if(F.col(c)).alias(f"n_{c}")  # noqa: E731
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("g_len"),
            cnt("g_wordlen"),
            cnt("g_stopword"),
            cnt("g_repetition"),
            F.count_if(
                F.col("g_len")
                & F.col("g_wordlen")
                & F.col("g_stopword")
                & F.col("g_repetition")
            ).alias("n_accept"),
        )
        .orderBy("source")
    )


VOCAB_TOP_N = 5


def text_vocab_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-5 bigrams per source by
    document frequency (the n-gram table every dataset card reports).
    Shape: narrow bigram assembly → one (source, bigram) distinct-doc
    aggregate → per-source top-k via WindowGroupLimit — no joins over
    raw text after the explode."""
    from quack_reduce_spark.operators.dedup import _shingle_table

    docs = load(spark, sf_dir, "documents")
    bg = _shingle_table(docs, "text", "doc_id", 2, hashed=False, distinct=True)
    dfreq = (
        bg.join(docs.select(F.col("doc_id").alias("doc"), "source"), "doc")
        .groupBy("source", F.col("sh").alias("bigram"))
        .agg(F.count_distinct("doc").alias("df_docs"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("df_docs").desc(), F.col("bigram").asc()
    )
    return (
        dfreq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= VOCAB_TOP_N)
        .select("source", "bigram", "df_docs", "rank")
    )


BUDGET_TOKENS = 2000


def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation flow as ONE differential-checked query:
    Gopher gate → exact dedup (keep min doc_id per fingerprint) →
    deterministic stratified sample → per-source token budget →
    per-source report. Every stage is the inventory operator it names;
    chaining them proves the stages compose without driver-side
    materialization (one job: three keyed shuffles — metrics, dedup
    window, budget window — and a final small aggregate)."""
    docs = load(spark, sf_dir, "documents")
    tstats, bstats = _doc_token_frames(docs)
    top_frac = rnd(F.col("top_c") / F.col("n_bigrams"), 4)
    gated = (
        docs.join(tstats, "doc_id")
        .join(bstats, "doc_id", "left")
        .filter(
            (F.col("n_words") >= MIN_WORDS)
            & (F.col("n_words") <= MAX_WORDS)
            & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
            & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
            & F.coalesce(top_frac <= MAX_TOP_BIGRAM_FRAC, F.lit(False))
        )
    )
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    deduped = (
        gated.withColumn("__fp", fp)
        .withColumn("__keep", F.min("doc_id").over(Window.partitionBy("__fp")))
        .filter(F.col("doc_id") == F.col("__keep"))
    )
    permille = (
        F.when(F.col("source") == "src0", 100)
        .when(F.col("source") == "src1", 500)
        .otherwise(250)
    )
    sampled = deduped.filter(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000)) < permille
    )
    budget_win = Window.partitionBy("source").orderBy("doc_id")
    budgeted = sampled.withColumn(
        "__cum", F.sum("n_words").over(budget_win)
    ).filter(F.col("__cum") <= BUDGET_TOKENS)
    return (
        budgeted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source")
    )


def text_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report per source: document duplication rate and
    the token volume that exact dedup removes (the dataset-card
    numbers). One fingerprint window + one aggregate — keep-min-id
    duplicates are the removed set."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = Window.partitionBy("__fp")
    flagged = docs.select(
        "source",
        ntok.alias("n_tok"),
        fp.alias("__fp"),
        "doc_id",
    ).withColumn("__keep", F.col("doc_id") == F.min("doc_id").over(w))
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("__keep")).alias("n_kept"),
            rnd(1 - F.count_if(F.col("__keep")) / F.count(F.lit(1)), 6).alias("dup_rate"),
            F.sum("n_tok").alias("tokens_total"),
            F.sum(F.when(~F.col("__keep"), F.col("n_tok")).otherwise(0)).alias(
                "tokens_removed"
            ),
        )
        .orderBy("source")
    )


QUERIES = {
    "text_dedup_impact": text_dedup_impact,
    "text_gopher_quality": text_gopher_quality,
    "text_filter_funnel": text_filter_funnel,
    "text_curation_pipeline": text_curation_pipeline,
    "text_vocab_ngrams": text_vocab_ngrams,
}

_METRICS_CTE = """
        w AS (
            SELECT doc_id, source,
                   string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        t AS (
            SELECT doc_id, source,
                   CAST(len(words) AS BIGINT) AS n_words,
                   FLOOR((list_aggregate(list_transform(words, x -> CAST(length(x) AS DOUBLE)), 'sum')
                          / len(words)) * 1e4 + 0.5) / 1e4 AS mean_word_len,
                   CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
                   CAST(len(list_filter(words, x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS BIGINT) AS n_sw
            FROM w
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])) AS bg
            FROM w
        ),
        bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
        bs AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams FROM bc GROUP BY doc_id)
"""

ORACLES = {
    "text_dedup_impact": """
        WITH f AS (
            SELECT source, doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tok,
                   doc_id = MIN(doc_id) OVER (
                       PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   ) AS keep
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(count_if(keep) AS BIGINT) AS n_kept,
               FLOOR((1 - CAST(count_if(keep) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS dup_rate,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
               CAST(SUM(CASE WHEN NOT keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_removed
        FROM f
        GROUP BY source
        ORDER BY source
    """,
    "text_vocab_ngrams": """
        WITH w AS (
            SELECT doc_id, source,
                   string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        bg AS (
            SELECT doc_id, source,
                   unnest(list_distinct(list_transform(range(1, len(words)),
                                                       i -> words[i] || ' ' || words[i+1]))) AS bigram
            FROM w
            WHERE len(words) >= 2
        ),
        dfreq AS (
            SELECT source, bigram, COUNT(DISTINCT doc_id) AS df_docs
            FROM bg GROUP BY source, bigram
        )
        SELECT source, bigram, df_docs,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY df_docs DESC, bigram ASC) AS INT) AS rank
        FROM dfreq
        QUALIFY rank <= 5
    """,
    "text_gopher_quality": f"""
        WITH {_METRICS_CTE}
        SELECT t.doc_id, n_words, mean_word_len,
               FLOOR((CAST(n_distinct AS DOUBLE) / n_words) * 1e4 + 0.5) / 1e4 AS type_token_ratio,
               FLOOR((CAST(top_c AS DOUBLE) / n_bigrams) * 1e4 + 0.5) / 1e4 AS top_bigram_frac,
               (n_words >= 40 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND COALESCE(FLOOR((CAST(top_c AS DOUBLE) / n_bigrams) * 1e4 + 0.5) / 1e4 <= 0.20, FALSE)) AS accept
        FROM t LEFT JOIN bs ON t.doc_id = bs.doc_id
    """,
    "text_curation_pipeline": f"""
        WITH {_METRICS_CTE},
        gated AS (
            SELECT d.doc_id, d.source, d.text, t.n_words
            FROM documents d
            JOIN t ON d.doc_id = t.doc_id
            LEFT JOIN bs ON d.doc_id = bs.doc_id
            WHERE t.n_words >= 40 AND t.n_words <= 100000
              AND t.mean_word_len >= 3.0 AND t.mean_word_len <= 10.0
              AND COALESCE(FLOOR((CAST(bs.top_c AS DOUBLE) / bs.n_bigrams) * 1e4 + 0.5) / 1e4 <= 0.20, FALSE)
        ),
        deduped AS (
            SELECT doc_id, source, n_words
            FROM gated
            QUALIFY doc_id = MIN(doc_id) OVER (
                PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
        ),
        sampled AS (
            SELECT doc_id, source, n_words
            FROM deduped
            WHERE (doc_id * 2654435761) % 1000 <
                  CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 500 ELSE 250 END
        ),
        budgeted AS (
            SELECT doc_id, source, n_words
            FROM sampled
            QUALIFY SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 2000
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM budgeted
        GROUP BY source
        ORDER BY source
    """,
    "text_filter_funnel": f"""
        WITH {_METRICS_CTE},
        flags AS (
            SELECT t.source,
                   (n_words BETWEEN 40 AND 100000) AS g_len,
                   (mean_word_len BETWEEN 3.0 AND 10.0) AS g_wordlen,
                   (n_sw >= 2) AS g_stopword,
                   COALESCE(FLOOR((CAST(top_c AS DOUBLE) / n_bigrams) * 1e4 + 0.5) / 1e4 <= 0.20, FALSE) AS g_repetition
            FROM t LEFT JOIN bs ON t.doc_id = bs.doc_id
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(count_if(g_len) AS BIGINT) AS n_g_len,
               CAST(count_if(g_wordlen) AS BIGINT) AS n_g_wordlen,
               CAST(count_if(g_stopword) AS BIGINT) AS n_g_stopword,
               CAST(count_if(g_repetition) AS BIGINT) AS n_g_repetition,
               CAST(count_if(g_len AND g_wordlen AND g_stopword AND g_repetition) AS BIGINT) AS n_accept
        FROM flags
        GROUP BY source
        ORDER BY source
    """,
}
