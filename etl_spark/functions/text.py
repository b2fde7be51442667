"""Text-analysis scalar functions for training-data pipelines.

All pure Column expressions (array/lambda higher-order functions — JVM-side),
designed to be replicable in ANSI SQL so the DuckDB oracle can verify them.

Capabilities: tokenization/token counts, word shingles, char n-grams,
quality ratios (punct/digit/stopword), heuristic language ID, and a
deterministic document fingerprint (min-hash of shingles — a rolling-hash
stand-in that is engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_spark.functions.hashing import portable_hash60

__all__ = [
    "tokens", "token_count", "token_count_bpe", "word_shingles",
    "char_ngrams", "punct_ratio", "digit_ratio", "stopword_ratio",
    "doc_fingerprint", "STOPWORDS_EN", "BPE_PRETOKEN_RE",
]

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


# GPT-2-style pre-tokenizer, simplified to the portable common core of
# Java regex (Spark) and RE2 (DuckDB): contraction suffixes, letter runs,
# single digits (BPE vocabularies split numbers digit-wise), punctuation
# runs. Both engines use leftmost-first alternation, so the match sets are
# identical.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches — the cheap
    JVM-side stand-in for a real BPE vocab count a curation pipeline uses
    to budget training tokens (whitespace counting under-counts punctuation
    and numbers; this tracks a GPT-2-style pre-tokenizer instead)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_PRETOKEN_RE), F.lit(0))).cast("long")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array of strings: the unit of MinHash /
    Jaccard near-dup detection.

    Built by zipping the token array with its own k-1 shifted slices
    (``zip_with`` pads the tail with NULLs; ``concat`` nulls them out and a
    final filter drops them). Crucially there is NO ``element_at(ts, i)``
    inside a lambda — that form re-evaluates the tokenization per element,
    turning the expression quadratic in document length."""
    ts = tokens(col)
    n = F.size(ts)
    parts = [ts] + [
        F.slice(ts, j + 1, F.greatest(n - F.lit(j), F.lit(0))) for j in range(1, k)
    ]
    z = parts[-1]
    for p in reversed(parts[:-1]):
        z = F.zip_with(p, z, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(z, lambda x: x.isNotNull()))


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the string; empty array when the
    string is shorter than ``n`` (``F.sequence(1, 0)`` counts DOWN —
    without the guard a short string emits itself as a phantom n-gram)."""
    c = _c(col)
    ln = F.length(c)
    idx = F.sequence(F.lit(1), ln - F.lit(n - 1))
    grams = F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))
    return (
        F.when(c.isNull(), F.lit(None).cast("array<string>"))
        .when(ln >= n, grams)
        .otherwise(F.array().cast("array<string>"))
    )


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alnum/whitespace."""
    c = _c(col)
    total = F.length(c)
    kept = F.length(F.regexp_replace(c, r"[^0-9A-Za-z\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise((total - kept) / total)


def digit_ratio(col: Column | str) -> Column:
    c = _c(col)
    total = F.length(c)
    digits = total - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(digits / total)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (quality-score feature)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    ts = tokens(col)
    n = F.size(ts)
    hits = F.size(F.filter(ts, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def doc_fingerprint(col: Column | str, k: int = 3) -> Column:
    """Deterministic 60-bit fingerprint: min portable hash over k-word
    shingles (winnowing-style document signature; engine-portable)."""
    sh = word_shingles(col, k)
    hashed = F.transform(sh, lambda s: portable_hash60(s))
    return F.array_min(hashed)
