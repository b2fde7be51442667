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


_ROMAN_VALUES = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}


def _int_to_roman(n: int) -> str:
    out = []
    for v, sym in [(1000, "M"), (900, "CM"), (500, "D"), (400, "CD"),
                   (100, "C"), (90, "XC"), (50, "L"), (40, "XL"),
                   (10, "X"), (9, "IX"), (5, "V"), (4, "IV"), (1, "I")]:
        while n >= v:
            out.append(sym)
            n -= v
    return "".join(out)


def roman_to_int(col: Column | str, max_value: int = 50) -> Column:
    """Roman-numeral health-region codes → int over a bounded domain
    (scnes/habilitacoes.py:17,135,246-250 uses the `roman` lib; the domain
    is small, so a literal when-chain stays JVM-side). Unknown → NULL."""
    c = F.upper(F.trim(_c(col)))
    expr = F.lit(None).cast("int")
    for n in range(max_value, 0, -1):
        expr = F.when(c == _int_to_roman(n), F.lit(n)).otherwise(expr)
    return expr


MESES_PT = {
    "janeiro": 1, "fevereiro": 2, "marco": 3, "março": 3, "abril": 4,
    "maio": 5, "junho": 6, "julho": 7, "agosto": 8, "setembro": 9,
    "outubro": 10, "novembro": 11, "dezembro": 12,
}


def month_pt_to_num(col: Column | str) -> Column:
    """PT-BR month name → month number (utilitarios_sisab_relatorio_
    producao.py:314-321, modelo_sisab_producao.py:31-44)."""
    c = F.lower(F.trim(_c(col)))
    expr = F.lit(None).cast("int")
    for name, num in MESES_PT.items():
        expr = F.when(c == name, F.lit(num)).otherwise(expr)
    return expr


def valid_code_array(col: Column | str, pattern: str = r"^[A-Z][0-9]{2,3}$") -> Column:
    """Tokenize a free-text code field on non-alphanumerics, drop dots,
    upper-case, keep tokens matching ``pattern``, and serialize as the
    reference's Postgres array literal '{A123,B45}'
    (comum/condicoes_saude.py:13-26, sim/do.py:486-507)."""
    c = F.upper(F.regexp_replace(_c(col).cast("string"), r"\.", ""))
    toks = F.filter(
        F.split(c, r"[^0-9A-Z]+"),
        lambda t: (t != F.lit("")) & t.rlike(pattern),
    )
    return F.concat(F.lit("{"), F.array_join(F.array_distinct(toks), ","), F.lit("}"))


def _build_fold_table() -> tuple[str, str]:
    """1:1 Latin fold pairs for `translate`, generated ONCE at import from
    Unicode NFD decomposition: every lowercase codepoint in Latin-1
    Supplement, Latin Extended-A/B, and Latin Extended Additional
    (U+00C0–U+024F, U+1E00–U+1EFF — Vietnamese, Romanian comma-below,
    pinyin tone vowels, Welsh, ...) whose decomposition strips to a single
    ASCII letter. Deterministic (a fixed function of the unicodedata
    tables), so the oracle literal gate in queries.py pins the result.
    Stroked letters that do NOT decompose (ø ł đ ħ ŧ ð ı ĸ ơ-siblings in
    Extended-B without NFD forms, etc.) ride an explicit list."""
    import unicodedata

    manual = {
        "ø": "o", "đ": "d", "ħ": "h", "ı": "i", "ĸ": "k", "ł": "l",
        "ŋ": "n", "ŧ": "t", "ð": "d", "ɨ": "i", "ɉ": "j", "ƀ": "b",
        "ɵ": "o", "ǥ": "g", "ȥ": "z", "ɇ": "e", "ʉ": "u", "ɍ": "r",
        "ɏ": "y", "ƚ": "l", "ŉ": "n", "ŀ": "l",
    }
    src, dst = list(manual), list(manual.values())
    for lo, hi in ((0x00C0, 0x024F), (0x1E00, 0x1EFF)):
        for cp in range(lo, hi + 1):
            ch = chr(cp).lower()
            if ch in manual or not ch.isalpha() or len(ch) != 1:
                continue
            base = [c for c in unicodedata.normalize("NFD", ch)
                    if not unicodedata.combining(c)]
            if len(base) == 1 and "a" <= base[0] <= "z" and ch not in src:
                src.append(ch)
                dst.append(base[0])
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _build_fold_table()


def normalize_text(col: Column | str) -> Column:
    """Lower-case, non-alnum runs → '_', trim leading/trailing '_'
    (utilitarios/textos.py:15-28). Accent folding covers Latin-1
    Supplement + Latin Extended-A/B + Latin Extended Additional via a
    decomposition-generated 1:1 `translate` table (see
    :func:`_build_fold_table`), with the multi-char ligatures (ß→ss,
    æ/ǣ/ǽ→ae, œ→oe, þ→th, ĳ→ij, ǳ/ǆ→dz, ǉ→lj, ǌ→nj) via `replace` —
    all JVM-side, codegen'd. That is a strict superset of what the
    reference's unidecode call encounters in its ISO-8859-1 sources.
    Non-Latin scripts fold to '_' like any other non-alnum rune."""
    c = F.lower(_c(col))
    for lig, out in (("ß", "ss"), ("æ", "ae"), ("ǣ", "ae"), ("ǽ", "ae"),
                     ("œ", "oe"), ("þ", "th"), ("ĳ", "ij"), ("ǳ", "dz"),
                     ("ǆ", "dz"), ("ǉ", "lj"), ("ǌ", "nj")):
        c = F.replace(c, F.lit(lig), F.lit(out))
    c = F.translate(c, _FOLD_SRC, _FOLD_DST)
    c = F.regexp_replace(c, r"[^a-z0-9]+", "_")
    return F.regexp_replace(c, r"^_+|_+$", "")
