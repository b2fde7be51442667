"""PII redaction for training-data curation.

A large-scale corpus pipeline scrubs personally-identifying strings before
training; this is the canonical "regex residue" transform that must stay
JVM-side (one pass of ``regexp_replace``/``regexp_count`` per pattern —
never per-row Python). The reference's analogue is its row-cleaning regex
stage (/root/reference/src/impulsoetl/sim/do.py:463-475 strips coded
characters; utilitarios/textos.py:15-28 folds special characters) — here
the same mechanism targets PII tokens instead of SUS code noise.

Patterns are deliberately written in the regex intersection of Java
(`java.util.regex`, what Spark executes) and RE2 (what DuckDB executes):
character classes, bounded repetition and ``\\b`` word boundaries only —
no lookarounds, no backreferences — so the DuckDB oracle replays the scrub
bit-for-bit.

Scale shape: per-row only (zero shuffles, whole-stage codegen'd); counts
are emitted next to the cleaned text so a curation gate can filter or
audit without a second pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii"]

#: (name, pattern, replacement token) — applied IN ORDER, each pattern
#: counted against the text as left by the previous scrub (emails first:
#: their local parts contain digit runs that must not double-count as
#: phone/card numbers).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("longnum", r"\b\d{9,16}\b", "<NUM>"),
)


def scrub_pii(col: Column | str) -> Column:
    """Redact PII from a text column; returns a struct column
    ``(clean: string, n_email: int, n_ipv4: int, n_longnum: int)``.

    Each pattern in :data:`PII_PATTERNS` is counted (non-overlapping,
    left-to-right — identical semantics in Java regex and RE2) and then
    replaced with its token before the next pattern runs, so e.g. an IP
    already rewritten to ``<IP>`` can never merge with neighbouring
    digits into a false "long number" hit.
    """
    cur = F.col(col) if isinstance(col, str) else col
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("int").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return F.struct(cur.alias("clean"), *counts)
