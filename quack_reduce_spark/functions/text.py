"""Text-analysis column expressions (north-star LLM-pipeline operators).

All pure ``pyspark.sql.functions`` compositions — JVM-side, inside
whole-stage codegen, no Python in the hot path. Each has an exact
ANSI-SQL equivalent so the DuckDB oracle can verify it (see
inventory/text.py).

Reference context: the reference engine has no text operators of its
own (its surface is SQL passthrough, ``app.py:51``); these are the
BASELINE.json north-star additions for training-data pipelines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from quack_reduce_spark.functions.numeric import rnd

# A tiny deterministic stopword list shared with the SQL oracles.
STOPWORDS = ["the", "a", "and", "of", "to"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Number of whitespace tokens."""
    return F.size(tokens(text))


def stopword_count(text: Column) -> Column:
    """Count of tokens in the STOPWORDS list."""
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def stopword_ratio(text: Column) -> Column:
    """stopword tokens / all tokens, 6-decimal rounded."""
    return rnd(stopword_count(text) / token_count(text), 6)


def mean_token_len(text: Column) -> Column:
    """Mean token length in characters, 4-decimal rounded."""
    toks = tokens(text)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return rnd(total_chars.cast("double") / F.size(toks), 4)


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0, 1]: rewards natural stopword
    density (~0.2-0.6) and moderate token length; penalizes very short
    docs. Deterministic closed form → SQL-oracle-checkable."""
    n = token_count(text).cast("double")
    sw = stopword_ratio(text)
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_term = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.4)) * 2.0, F.lit(1.0))
    return rnd((length_term + sw_term) / 2.0, 6)


def lang_id(text: Column) -> Column:
    """Stopword-hit language heuristic: 'en' when >= 2 English stopword
    tokens, else 'unk'. (A real n-gram model plugs in the same way.)"""
    return F.when(stopword_count(text) >= 2, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased trimmed text,
    collapsing runs of whitespace (rolling-hash document id)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the subset
# both Java regex and RE2 support — no lookahead): a token is an
# optionally-space-prefixed letter run, digit run, or punctuation run.
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007
ROLLING_SEED = 7


def bpe_token_count(text: Column) -> Column:
    """BPE-style subword-ish token count via the pre-tokenizer regex
    (the GPT-2 split step — the part of BPE that is pure regex; merge
    ranks would need a vocab file)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash (Rabin-Karp) over the code points:
    h = fold(h * 31 + cp) mod 1e9+7, seed 7. A content fingerprint
    that incremental re-chunkers can maintain in O(1) per edit —
    cheaper than md5 for dedup keys and SQL-portable (DuckDB
    list_reduce oracle). Max intermediate: 31 * (1e9+6) + cp, safely
    inside int64 under ANSI mode."""
    # split("", "") yields [""] (ascii 0) — filter empties so the fold
    # over an empty string is the bare seed, matching DuckDB's
    # string_split and the plain-Python definition
    codepoints = F.transform(
        F.filter(F.split(text, ""), lambda c: c != F.lit("")),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codepoints,
        F.lit(ROLLING_SEED).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )
