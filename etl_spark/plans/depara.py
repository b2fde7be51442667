"""DE-PARA schema mapping: rename maps, type imposition, additive evolution.

Reference (SURVEY.md §1.3): frozen rename dicts per loader
(/root/reference/src/impulsoetl/siasus/procedimentos.py:29-92), type dicts
imposed with ``astype`` (:94-163), and ``*_ADICIONAIS`` back-fill of columns
absent from old source vintages (sihsus/aih_rd.py:103,362-377;
sim/do.py:387-400). Contract tests assert a bijection between source
columns, DE-PARA keys, and destination columns
(tests/siasus/teste_procedimentos.py:67-98) — :func:`check_contract` is the
engine-side equivalent.

All of this is *plan generation*: the output is one ``select`` projection,
so Catalyst sees a plain column-pruning + cast plan (no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

__all__ = [
    "apply_de_para", "impose_types", "with_additive_columns",
    "check_contract", "SchemaContractError",
]


class SchemaContractError(ValueError):
    """Source schema and DE-PARA map disagree (contract-test failure)."""


def apply_de_para(
    df: DataFrame,
    de_para: dict[str, str],
    strict: bool = True,
    keep_extra: bool = False,
) -> DataFrame:
    """Project ``df`` through a source→destination rename map.

    ``strict`` asserts every DE-PARA key exists in the source (the
    reference's bijection contract); ``keep_extra`` appends source columns
    not covered by the map (dynamic-report path, sisab/producao.py).
    Output column order follows the map (destination order is load-bearing
    for the reference's COPY CSV loader).
    """
    missing = [k for k in de_para if k not in df.columns]
    if strict and missing:
        raise SchemaContractError(f"DE-PARA keys missing from source: {missing}")
    cols = [F.col(src).alias(dst) for src, dst in de_para.items() if src in df.columns]
    if keep_extra:
        covered = set(de_para)
        cols += [F.col(c) for c in df.columns if c not in covered]
    return df.select(*cols)


def impose_types(df: DataFrame, types: dict[str, DataType | str]) -> DataFrame:
    """Cast mapped columns (the reference's frozen ``TIPOS_*`` astype dicts,
    including its NA-safe two-step int casts — Spark casts are NULL-safe by
    default so the hack disappears)."""
    unknown = [c for c in types if c not in df.columns]
    if unknown:
        raise SchemaContractError(f"type map refers to absent columns: {unknown}")
    return df.select(
        *[
            (F.col(c).cast(types[c]).alias(c) if c in types else F.col(c))
            for c in df.columns
        ]
    )


def with_additive_columns(df: DataFrame, additions: dict[str, DataType | str]) -> DataFrame:
    """ADICIONAIS back-fill: declare columns that only exist in newer source
    vintages; absent ones are appended as typed NULLs so every vintage lands
    with one schema (aih_rd.py:362-377)."""
    out = df
    for name, dtype in additions.items():
        if name not in out.columns:
            out = out.withColumn(name, F.lit(None).cast(dtype))
    return out


def check_contract(
    source_schema: StructType,
    de_para: dict[str, str],
    dest_schema: StructType,
    ignore_dest: tuple[str, ...] = (),
) -> None:
    """Bijection contract (teste_procedimentos.py:67-98):
    every DE-PARA key ∈ source, every DE-PARA value ∈ destination, and the
    destination (minus engine-owned columns) is fully covered."""
    src = set(source_schema.fieldNames())
    dst = set(dest_schema.fieldNames()) - set(ignore_dest)
    bad_keys = sorted(set(de_para) - src)
    bad_vals = sorted(set(de_para.values()) - dst)
    uncovered = sorted(dst - set(de_para.values()))
    problems = []
    if bad_keys:
        problems.append(f"DE-PARA keys not in source: {bad_keys}")
    if bad_vals:
        problems.append(f"DE-PARA values not in destination: {bad_vals}")
    if uncovered:
        problems.append(f"destination columns not produced: {uncovered}")
    if problems:
        raise SchemaContractError("; ".join(problems))
