"""Text-analysis column expressions for the LLM-data-pipeline surface:
token counting, quality ratios, fingerprinting, n-gram generation.

All JVM-side (split/regexp/md5/transform) — at 100 TB these run inside
whole-stage codegen over the parquet scan with zero Python transfer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English stopword list for quality scoring (public domain set).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization; trims and collapses runs of whitespace."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    stripped = F.regexp_replace(F.lower(text), r"[a-z0-9 ]", "")
    return F.when(
        F.length(text) > 0, F.length(stripped) / F.length(text)
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords — a cheap fluency signal."""
    toks = tokens(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def fingerprint_md5(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical digest.
    """
    return F.md5(F.lower(F.trim(text)))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Array of character n-grams (shingles) — input to MinHash/Jaccard.

    Pure higher-order-function implementation: sequence over start
    offsets + transform to substrings; stays in codegen.
    """
    t = F.lower(text)
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array(t))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined) for document-level MinHash."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
