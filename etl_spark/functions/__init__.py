"""Scalar function library (SURVEY.md §2.7) — all pure Column expressions.

Everything here stays JVM-side inside whole-stage codegen; no Python UDFs.
"""

from etl_spark.functions.hashing import content_key, portable_hash60, stable_bucket
from etl_spark.functions.cleaning import (
    decode_bool,
    month_pt_to_num,
    roman_to_int,
    valid_code_array,
    money_brl_to_double,
    normalize_text,
    null_if_all_nines,
    null_if_all_zeros,
    null_if_blank,
    null_if_in,
    strip_non_digits,
    zfill,
)
from etl_spark.functions.dates import (
    parse_aaaamm,
    parse_aaaammdd,
    parse_dmy,
    pinned_audit_ts,
)
from etl_spark.functions.text import (
    char_ngrams,
    digit_ratio,
    doc_fingerprint,
    punct_ratio,
    stopword_ratio,
    token_count,
    word_shingles,
)

__all__ = [
    "content_key", "portable_hash60", "stable_bucket",
    "decode_bool", "money_brl_to_double", "normalize_text",
    "null_if_all_nines", "null_if_all_zeros", "null_if_blank", "null_if_in",
    "month_pt_to_num", "roman_to_int", "valid_code_array",
    "strip_non_digits", "zfill",
    "parse_aaaamm", "parse_aaaammdd", "parse_dmy", "pinned_audit_ts",
    "char_ngrams", "digit_ratio", "doc_fingerprint", "punct_ratio",
    "stopword_ratio", "token_count", "word_shingles",
]
