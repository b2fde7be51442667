"""Row-cleaning scalar functions (SURVEY.md §2.7).

Each maps a hand-rolled pandas idiom from the reference onto a native Spark
Column expression (JVM-side, codegen'd — never per-row Python):

- null sentinels: empty string / all-zeros / all-nines / coded values → NULL
  (/root/reference/src/impulsoetl/siasus/procedimentos.py:302-346)
- boolean decoders for "0/1", "1/2", "S/N", "M" flags
  (procedimentos.py:177-184,348-363; sinan/violencia.py:414-421)
- zero-fill codes, strip non-digits
  (scnes/habilitacoes.py:251-268; sim/do.py:463-475)
- money parse "R$ 1.234,56" → double
  (egestor/relatorio_financiamento/tratamento.py:477-488)
- text normalization: special chars → '_', collapse repeats, lower-case
  (utilitarios/textos.py:15-28)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "null_if_blank", "null_if_all_zeros", "null_if_all_nines", "null_if_in",
    "decode_bool", "zfill", "strip_non_digits", "money_brl_to_double",
    "normalize_text",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def null_if_blank(col: Column | str) -> Column:
    """'' or whitespace-only → NULL (procedimentos.py:302)."""
    c = _c(col)
    return F.when(F.trim(c) == F.lit(""), F.lit(None)).otherwise(c)


def null_if_all_zeros(col: Column | str) -> Column:
    """'0', '00', '000000' → NULL (procedimentos.py:303-327)."""
    c = _c(col)
    return F.when(c.rlike(r"^0+$"), F.lit(None)).otherwise(c)


def null_if_all_nines(col: Column | str) -> Column:
    """'9', '999' sentinel codes → NULL (procedimentos.py:328-346)."""
    c = _c(col)
    return F.when(c.rlike(r"^9+$"), F.lit(None)).otherwise(c)


def null_if_in(col: Column | str, sentinels: list[str]) -> Column:
    """Explicit sentinel list → NULL."""
    c = _c(col)
    return F.when(c.isin(sentinels), F.lit(None)).otherwise(c)


def decode_bool(
    col: Column | str,
    true_values: list[str],
    false_values: list[str],
) -> Column:
    """Coded flag → nullable boolean; unknown codes → NULL
    (procedimentos.py:177-184, violencia.py:414-421)."""
    c = _c(col)
    return (
        F.when(c.isin(true_values), F.lit(True))
        .when(c.isin(false_values), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def zfill(col: Column | str, width: int) -> Column:
    """Zero-pad codes to fixed width (habilitacoes.py:257-268)."""
    return F.lpad(_c(col).cast("string"), width, "0")


def strip_non_digits(col: Column | str) -> Column:
    """Keep digits only (sim/do.py:463-475)."""
    return F.regexp_replace(_c(col).cast("string"), r"[^0-9]", "")


def money_brl_to_double(col: Column | str) -> Column:
    """'R$ 1.234,56' → 1234.56 (egestor tratamento.py:477-488)."""
    c = _c(col)
    cleaned = F.regexp_replace(c, r"[R$\s.]", "")
    return F.regexp_replace(cleaned, ",", ".").try_cast("double")


def normalize_text(col: Column | str) -> Column:
    """Lower-case, non-alnum runs → '_', trim leading/trailing '_'
    (utilitarios/textos.py:15-28; full unidecode is out of scope for
    JVM-side — accent folding uses `translate` for the PT-BR alphabet)."""
    c = F.lower(_c(col))
    c = F.translate(c, "áàâãäéèêëíìîïóòôõöúùûüç", "aaaaaeeeeiiiiooooouuuuc")
    c = F.regexp_replace(c, r"[^a-z0-9]+", "_")
    return F.regexp_replace(c, r"^_+|_+$", "")
