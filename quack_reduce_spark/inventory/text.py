"""Text-analysis inventory over the documents table (north-star ops).

Each query is a JVM-side expression pipeline (functions/text.py) with an
exact DuckDB-SQL oracle. The shared STOPWORDS list is inlined into the
SQL so both engines compute the identical closed form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from quack_reduce_spark.functions import text as T
from quack_reduce_spark.functions.numeric import rnd
from quack_reduce_spark.inventory._util import load

_SW_SQL = "('the', 'a', 'and', 'of', 'to')"  # == functions.text.STOPWORDS


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + mean token length per doc."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.mean_token_len(F.col("text")).alias("mean_token_len"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + heuristic quality in [0,1]."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.stopword_count(F.col("text")).alias("n_stopwords"),
        T.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column, aggregated."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text; duplicate-group
    sizes per fingerprint."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n_copies"))
    )


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer count per doc (GPT-2 split regex,
    lookahead-free so Java regex and RE2 tokenize identically),
    plus the whitespace count for comparison."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_ws_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprint per doc (fold over code
    points, JVM-side F.aggregate) with duplicate-group sizes."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.rolling_hash(F.col("text")).alias("rh"))
        .groupBy("rh")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n_copies"))
    )



def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sample: per-source keep rates
    (a training-mix recipe) applied with a Knuth-multiplicative-hash
    bucket on doc_id, so the SAME docs are kept on any cluster size or
    partition layout — unlike df.sampleBy's per-partition RNG. The
    predicate is a plain filter, so it pushes to the scan."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000))
    permille = (
        F.when(F.col("source") == "src0", 100)
        .when(F.col("source") == "src1", 500)
        .otherwise(250)
    )
    return (
        docs.filter(bucket < permille)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            rnd(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("source")
    )


def text_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus cut: per source, admit docs in deterministic
    order (doc_id) until a cumulative whitespace-token budget is
    reached (700 here, sized to bite on the fixtures) — the window
    cumsum runs distributed per source partition,
    the canonical 'fill each data-mix slice to N tokens' curation op."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    win = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("doc_id", "source", ntok.alias("n_tok"))
        .withColumn("cum_tok", F.sum("n_tok").over(win))
        .filter(F.col("cum_tok") <= 700)
        .select("doc_id", "source", "n_tok", "cum_tok")
        .orderBy("source", "doc_id")
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for LLM training/embedding pipelines: split
    each doc into overlapping token windows (32 tokens, stride 24 —
    8-token overlap) with deterministic chunk ids. Pure array ops —
    split once, slice per chunk start — so the whole thing is one
    narrow projection + explode, no shuffle at all until a downstream
    op needs one; at 100 TB chunking is scan-shaped and embarrassingly
    parallel."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(CHUNK_STRIDE))
    chunked = docs.select(
        "doc_id",
        words.alias("__w"),
        F.explode(starts).alias("__start"),
    )
    return chunked.select(
        "doc_id",
        ((F.col("__start") - 1) / F.lit(CHUNK_STRIDE)).cast("int").alias("chunk_idx"),
        F.array_join(F.slice("__w", F.col("__start"), CHUNK_TOKENS), " ").alias("chunk_text"),
        F.size(F.slice("__w", F.col("__start"), CHUNK_TOKENS)).alias("n_chunk_tokens"),
    )


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per doc (a standard
    gibberish/boilerplate quality signal): H = log2(T) - Σ c·log2(c) / T
    over per-char counts — ONE explode + two hash aggregates, all
    partial-aggregated map-side, no window."""
    docs = load(spark, sf_dir, "documents")
    chars = docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    ln2 = 0.6931471805599453
    return (
        counts.groupBy("doc_id")
        .agg(F.sum("c").alias("__t"), F.sum(F.col("c") * F.log("c")).alias("__s"))
        .select(
            "doc_id",
            rnd(
                (F.log("__t") - F.col("__s") / F.col("__t")) / F.lit(ln2), 4
            ).alias("char_entropy"),
        )
    )


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_DIGITRUN_RE = "[0-9]{6,}"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (training-corpus hygiene): redact email
    addresses and long digit runs with typed placeholders, and report
    per-doc redaction counts. Pure regexp_replace/regexp_count — JVM
    expressions in codegen; the identical POSIX-ish patterns run in the
    oracle. The fixture corpus is PII-free, so deterministic PII is
    first injected into a derived column (every 7th doc an email, every
    11th a long digit run) — the scrubber must redact exactly those and
    pass every other doc through byte-identical (the unchanged flag)."""
    docs = load(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" ref 123456789")).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(dirty, _EMAIL_RE, "<EMAIL>"), _DIGITRUN_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(dirty, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(dirty, F.lit(_DIGITRUN_RE)).alias("n_digit_runs"),
        F.length(scrubbed).alias("scrubbed_len"),
        (scrubbed == F.col("text")).alias("unchanged"),
    )


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_chunk_windows": text_chunk_windows,
    "text_char_entropy": text_char_entropy,
    "text_pii_scrub": text_pii_scrub,
    "text_quality": text_quality,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_bpe_tokens": text_bpe_tokens,
    "text_rolling_hash": text_rolling_hash,
    "text_stratified_sample": text_stratified_sample,
    "text_token_budget": text_token_budget,
}


ORACLES = {
    "text_pii_scrub": """
        WITH d AS (
            SELECT doc_id, text,
                   text
                   || CASE WHEN doc_id % 7 = 0
                           THEN ' contact user' || doc_id || '@example.com now'
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0 THEN ' ref 123456789' ELSE '' END
                   AS dirty
            FROM documents
        ),
        s AS (
            SELECT doc_id, text, dirty,
                   regexp_replace(
                       regexp_replace(dirty, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                       '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
            FROM d
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(dirty, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(dirty, '[0-9]{6,}')) AS INT) AS n_digit_runs,
               CAST(length(scrubbed) AS INT) AS scrubbed_len,
               scrubbed = text AS unchanged
        FROM s
    """,
    "text_chunk_windows": """
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
            FROM documents
        ),
        c AS (
            SELECT doc_id, words,
                   unnest(generate_series(1, CAST(greatest(len(words), 1) AS BIGINT), 24)) AS start
            FROM w
        )
        SELECT doc_id,
               CAST((start - 1) / 24 AS INT) AS chunk_idx,
               array_to_string(words[start : start + 31], ' ') AS chunk_text,
               CAST(len(words[start : start + 31]) AS INT) AS n_chunk_tokens
        FROM c
    """,
    "text_char_entropy": """
        WITH ch AS (
            SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
        ),
        cnt AS (
            SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
        ),
        agg AS (
            SELECT doc_id, SUM(c) AS t, SUM(c * ln(c)) AS s FROM cnt GROUP BY doc_id
        )
        SELECT doc_id,
               FLOOR(((ln(t) - s / t) / 0.6931471805599453) * 1e4 + 0.5) / 1e4 AS char_entropy
        FROM agg
    """,
    "text_token_stats": """
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
               FLOOR((
                   CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'), t -> CAST(length(t) AS INT)), 'sum') AS DOUBLE)
                   / len(string_split_regex(trim(text), '\\s+'))) * 1e4 + 0.5) / 1e4 AS mean_token_len
        FROM documents
    """,
    "text_quality": """
        WITH t AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                   len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> x IN ('the', 'a', 'and', 'of', 'to'))) AS n_sw
            FROM documents
        )
        SELECT doc_id,
               CAST(n_sw AS INT) AS n_stopwords,
               FLOOR((CAST(n_sw AS DOUBLE) / n_tok) * 1e6 + 0.5) / 1e6 AS stopword_ratio,
               FLOOR(((LEAST(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
                      + (1.0 - LEAST(ABS(FLOOR((CAST(n_sw AS DOUBLE) / n_tok) * 1e6 + 0.5) / 1e6 - 0.4) * 2.0, 1.0))) / 2.0) * 1e6 + 0.5) / 1e6 AS quality
        FROM t
    """,
    "text_lang_id": """
        WITH t AS (
            SELECT lang,
                   CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                                             x -> x IN ('the', 'a', 'and', 'of', 'to'))) >= 2
                        THEN 'en' ELSE 'unk' END AS pred_lang
            FROM documents
        )
        SELECT lang, pred_lang, COUNT(*) AS n FROM t GROUP BY lang, pred_lang
    """,
    "text_fingerprint": """
        SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
               MIN(doc_id) AS first_doc,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "text_bpe_tokens": """
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS INT) AS n_bpe_tokens
        FROM documents
    """,
    "text_rolling_hash": """
        SELECT list_reduce(
                   list_prepend(CAST(7 AS BIGINT),
                                list_transform(string_split(text, ''),
                                               c -> CAST(unicode(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007
               ) AS rh,
               MIN(doc_id) AS first_doc,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "text_stratified_sample": """
        SELECT source, COUNT(*) AS n_kept,
               FLOOR((AVG(n_chars)) * 1e4 + 0.5) / 1e4 AS avg_chars
        FROM documents
        WHERE (doc_id * 2654435761) % 1000 <
              CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 500 ELSE 250 END
        GROUP BY source
        ORDER BY source
    """,
    "text_token_budget": """
        SELECT doc_id, source, n_tok, cum_tok FROM (
            SELECT doc_id, source,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tok,
                   CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
                        OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_tok
            FROM documents
        )
        WHERE cum_tok <= 700
        ORDER BY source, doc_id
    """,
}
