"""Deterministic, engine-portable hashing.

The reference mints a random ``uuid7().hex`` per row
(/root/reference/src/impulsoetl/siasus/procedimentos.py:387-389), which makes
replay non-reproducible. We replace it with content-derived keys so a full
replay is byte-identical (BASELINE.json per-row invariant).

``portable_hash60`` is the cross-engine workhorse: the first 15 hex chars of
md5 as a non-negative 60-bit int. It evaluates to the *same value* in Spark
(`conv(substring(md5(x),1,15),16,10)`) and in DuckDB
(`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), so every MinHash / SimHash /
LSH operator built on it can be verified by a pure-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["content_key", "portable_hash60", "portable_hash60_sql", "stable_bucket"]


def portable_hash60(col: Column | str, salt: int | None = None) -> Column:
    """60-bit non-negative hash of a string column, identical in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str, salt: int | None = None) -> str:
    """DuckDB SQL text computing the same value as :func:`portable_hash60`."""
    if salt is not None:
        expr = f"concat('{salt}|', {expr})"
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def content_key(*cols: Column | str) -> Column:
    """Deterministic surrogate key: sha256 over '|'-joined columns
    (replaces the reference's uuid7 row ids; replay-stable)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws("|", *cs), 256)


def stable_bucket(n: int, *cols: Column | str) -> Column:
    """Engine-portable bucket id in [0, n): portable_hash60 % n."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(portable_hash60(F.concat_ws("|", *cs)), F.lit(n)).cast("int")
