"""Date parsers + deterministic audit timestamps (SURVEY.md §2.7).

Reference: ``comum/datas.py:28-62`` (AAAAMMDD with raise/ignore/coerce),
``procedimentos.py:293-300`` (%Y%m), ``scnes/habilitacoes.py:229-245``
(%d/%m/%Y), ``comum/datas.py:23-25`` (now() in GMT-3 audit columns —
replaced by a *pinned* per-batch constant so replay is deterministic).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["parse_aaaammdd", "parse_aaaamm", "parse_dmy", "pinned_audit_ts"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_aaaammdd(col: Column | str) -> Column:
    """'20240131' → date; unparseable → NULL (errors='coerce' semantics —
    try_to_date returns NULL on mismatch even under ANSI mode (Spark 4 default))."""
    return F.try_to_date(_c(col), "yyyyMMdd")


def parse_aaaamm(col: Column | str) -> Column:
    """'202401' → date 2024-01-01 (competência month)."""
    return F.try_to_date(_c(col), "yyyyMM")


def parse_dmy(col: Column | str) -> Column:
    """'31/01/2024' → date."""
    return F.try_to_date(_c(col), "dd/MM/yyyy")


def pinned_audit_ts(batch_ts: dt.datetime | str) -> Column:
    """Audit column value pinned per batch (NOT now()): the reference stamps
    ``criacao_data``/``atualizacao_data`` with wall-clock now (datas.py:23-25),
    which breaks byte-identical replay; we pin the batch's logical timestamp."""
    if isinstance(batch_ts, str):
        batch_ts = dt.datetime.fromisoformat(batch_ts)
    return F.lit(batch_ts).cast("timestamp")
