"""Capture orchestration: validation gates, dry-run mode, error ledger.

Reference parity (SURVEY.md §2.2, §3.1):

- **validation gates** that abort a batch before load — ``validar_pa``'s
  assertion task (/root/reference/src/impulsoetl/siasus/procedimentos.py:
  436-449, abort at :522-529) and the raw-vs-transformed QA comparisons
  (sisab/relatorio_validacao_producao/verificacao.py:15-98);
- **test mode** (``teste=True``) that runs the full pipeline but rolls the
  load back (procedimentos.py:549-552, utilitarios/bd.py:185-188) — here a
  dry run validates + counts without committing a snapshot;
- **error ledger** rows on failure (sisab/excecoes.py:14-40) — here the
  MetricsSink JSONL ledger;
- **pending-work discovery** from a schedule minus the applied-manifest
  history (scripts/geral.py:61-65 + capturas_historico) — see also
  etl_spark.cdc.replay.pending_epochs.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.lake import LakeTable, MergeStats

__all__ = [
    "ValidationError", "expect", "expect_nonempty", "expect_no_nulls",
    "expect_unique_keys", "run_capture", "pending_from_schedule",
    "pending_scan",
]


class ValidationError(RuntimeError):
    """A validation gate rejected the batch (reference: AssertionError in
    the validar_* tasks, aborting the capture)."""


GateFn = Callable[[DataFrame], None]


def expect(predicate_sql: str, description: str | None = None) -> GateFn:
    """Gate: no row may violate ``predicate_sql`` (evaluated as a filter on
    the negation — one combinable count job)."""

    def gate(df: DataFrame) -> None:
        bad = df.filter(~F.expr(predicate_sql)).limit(1).count()
        if bad:
            raise ValidationError(description or f"rows violate: {predicate_sql}")

    return gate


def expect_nonempty(df: DataFrame) -> None:
    if df.limit(1).count() == 0:
        raise ValidationError("batch is empty")


def expect_no_nulls(*cols: str) -> GateFn:
    def gate(df: DataFrame) -> None:
        cond = None
        for c in cols:
            e = F.col(c).isNull()
            cond = e if cond is None else cond | e
        n = df.filter(cond).limit(1).count()
        if n:
            raise ValidationError(f"NULLs in required columns {list(cols)}")

    return gate


def expect_unique_keys(*cols: str) -> GateFn:
    """Post-dedup batches must be key-unique (pre-dedup batches are not)."""

    def gate(df: DataFrame) -> None:
        dup = (
            df.groupBy(*cols).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValidationError(f"duplicate keys on {list(cols)}")

    return gate


@dataclass
class CaptureResult:
    manifest_key: str
    status: str                 # "applied" | "noop" | "rejected" | "dry_run"
    stats: MergeStats | None = None
    error: str | None = None


def run_capture(
    table: LakeTable,
    batch: DataFrame,
    manifest_key: str,
    gates: list[GateFn] | None = None,
    dry_run: bool = False,
    metrics_sink=None,
) -> CaptureResult:
    """One capture = gates → (merge | dry-run). Gate failure aborts before
    any write and is recorded in the ledger; dry-run validates and counts
    but commits nothing (the reference's ``teste=True`` rollback)."""
    t0 = time.monotonic()
    try:
        for gate in gates or []:
            gate(batch)
    except ValidationError as exc:
        if metrics_sink is not None:
            metrics_sink.record(
                {"manifest_key": manifest_key, "applied": False,
                 "status": "rejected"},
                wall_sec=time.monotonic() - t0, error=str(exc),
            )
        return CaptureResult(manifest_key, "rejected", error=str(exc))

    if dry_run:
        n = batch.count()
        if metrics_sink is not None:
            metrics_sink.record(
                {"manifest_key": manifest_key, "applied": False,
                 "status": "dry_run", "batch_rows": n},
                wall_sec=time.monotonic() - t0,
            )
        return CaptureResult(manifest_key, "dry_run")

    stats = table.merge(batch, manifest_key=manifest_key)
    if metrics_sink is not None:
        metrics_sink.record(stats, wall_sec=time.monotonic() - t0)
    return CaptureResult(
        manifest_key, "applied" if stats.applied else "noop", stats=stats
    )


def pending_from_schedule(schedule: list[str], table: LakeTable) -> list[str]:
    """Schedule entries (manifest keys) not yet in the applied history —
    the reference's ``capturas_agendamentos`` minus ``capturas_historico``
    (scripts/geral.py:61-65, 92-109). Driver-side list form; for a
    lake-scale schedule use :func:`pending_scan`."""
    snap = table.current_snapshot()
    return [k for k in schedule if not snap.has_applied(k)]


# Split at the LAST colon exactly like str.rpartition (greedy `.*` +
# colon-free suffix class); the suffix only counts as sequence-shaped when
# it is CANONICAL decimal (no leading zeros, ASCII digits) — the
# distributed twin of etl_spark.lake.table._is_canonical_seq, so
# 'epoch:04' stays a distinct key from 'epoch:4' here too. (A digit-class
# suffix in ONE regex would let greedy `.*` steal leading digits —
# 'a:1:02' must parse as prefix 'a:1', not 'a:1:0'.)
_KEY_SPLIT_RE = r"^(.*):([^:]*)$"
_CANONICAL_SEQ_RE = r"^(0|[1-9][0-9]*)$"


def pending_scan(
    schedule: DataFrame, table: LakeTable, key_col: str = "manifest_key"
) -> DataFrame:
    """Distributed pending-work discovery: rows of ``schedule`` whose
    ``key_col`` is not applied yet — the reference's
    ``capturas_agendamentos`` minus ``capturas_historico``
    (scripts/geral.py:61-65, 92-109) as relational algebra, so a
    lake-scale schedule (millions of (table, partition, period) entries)
    never collects to the driver.

    The applied history is control-plane-sized BY CONSTRUCTION — the
    bounded recent manifest window plus the per-prefix folded watermark
    ranges (see ``lake.table.Snapshot``) — so both lookup sides broadcast:

    1. left-anti broadcast join against the recent window keys;
    2. left-anti broadcast join against the watermark ranges for
       sequence-shaped keys (``prefix:seq`` with ``lo <= seq <= hi``).
    """
    spark = schedule.sparkSession
    snap = table.current_snapshot()
    out = schedule
    if snap.applied:
        window_df = spark.createDataFrame(
            [(k,) for k in snap.applied], f"{key_col} string"
        )
        out = out.join(F.broadcast(window_df), key_col, "left_anti")
    if snap.applied_watermarks:
        cursor_pfx = snap.cursor_prefixes()
        # collision-proof helper names: the schedule carries arbitrary
        # user payload columns, which must never be clobbered or dropped
        pc, sc = "__p", "__s"
        while pc in out.columns:
            pc += "_"
        while sc in out.columns:
            sc += "_"
        wm_names = ["__prefix", "__lo", "__hi", "__cursor"]
        clash = [c for c in wm_names if c in out.columns]
        if clash:
            raise ValueError(
                f"schedule columns collide with pending_scan internals: "
                f"{clash}; rename them"
            )
        wm_df = spark.createDataFrame(
            [(p, int(lo), int(hi), p in cursor_pfx)
             for p, (lo, hi) in snap.applied_watermarks.items()],
            "__prefix string, __lo bigint, __hi bigint, __cursor boolean",
        )
        key = F.col(key_col)
        suffix = F.regexp_extract(key, _KEY_SPLIT_RE, 2)
        out = (
            out.withColumn(pc, F.regexp_extract(key, _KEY_SPLIT_RE, 1))
            .withColumn(
                sc,
                # try_cast: a canonical decimal can still overflow bigint
                # under ANSI mode — such a key is simply not watermark-
                # covered (has_applied's Python bigints agree: it can never
                # fold into an int-ranged watermark), never a scan crash
                F.when(suffix.rlike(_CANONICAL_SEQ_RE),
                       suffix.try_cast("long")),
            )
            .join(
                F.broadcast(wm_df),
                (F.col(pc) == F.col("__prefix"))
                & F.col(sc).isNotNull()
                # cursor prefixes (monotone positions): applied ⇔ seq ≤ hi,
                # mirroring Snapshot.has_applied; work-unit prefixes need
                # the full contiguous range
                & (F.col("__cursor") | (F.col(sc) >= F.col("__lo")))
                & (F.col(sc) <= F.col("__hi")),
                "left_anti",
            )
            .drop(pc, sc)
        )
    return out
