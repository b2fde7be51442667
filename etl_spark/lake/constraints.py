"""Table-level CHECK constraints, enforced by every merge — Delta Lake
``ADD CONSTRAINT`` / Iceberg-spec write-validation parity.

The engine already has two data-quality layers: pipeline GATES
(pipeline.py ``expect``) that a caller composes per capture, and
write-audit-publish (lake/wap.py) that audits a staged post-merge state.
Both are opt-in per call site. A CHECK constraint is the third,
strictest layer: declared ONCE on the table, enforced on EVERY write
path that goes through merge — replay, sync replicas, DML, reconcile
corrections, bootstrap chunks, routed envelope fan-out — so a malformed
batch cannot land through a code path that forgot to gate. The
reference's analogue is its per-loader pandera/validation step
(e.g. impulsoetl validation modules run before every Postgres load);
declaring the rule on the table moves it from "every loader must
remember" to "the table refuses".

Semantics (standard SQL CHECK):

- a row VIOLATES a constraint iff the expression evaluates to FALSE;
  NULL passes (unknown is not a violation). This composes with patch
  tables (``update_semantics="patch"``), where NULL payload means
  "keep the previous value" — a patch row only checks the columns it
  actually sets.
- tombstones (``op = 'D'``) are exempt: a delete row's payload is
  nulled/meaningless by contract; the KEY disappearing cannot violate a
  payload rule.
- enforcement is batch-wide, pre-LWW: every non-delete row of the
  batch must satisfy every constraint, even rows that would lose the
  LWW race (a violating stale duplicate is upstream garbage worth
  failing loudly on, and checking winners-only would make enforcement
  depend on merge internals).

Scale shape — the part that matters at 100 TB: enforcement adds ZERO
extra passes over the batch. The constraint expressions are folded into
the merge's own alignment projection as a ``raise_error`` guard
(exactly Delta's mechanism): the first violating row aborts the write
job with the constraint's name, so a clean batch pays one codegen'd
boolean per constraint per row inside the existing scan, and there is
no separate validation job, no second evaluation of a possibly-
expensive batch plan. The failed merge publishes nothing (the snapshot
commit never runs) and claims no manifest key — the batch re-ingests
under the SAME key after repair; the aborted write's ``.stage`` tree is
reclaimed by ``vacuum(reclaim_staging=True)`` like any crashed writer's.

``add_constraint(validate=True)`` is the one deliberately O(table)
operation (same posture as Delta): declaring a rule over existing data
means proving the data satisfies it, with one loud scan.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ConstraintViolation", "parse_constraints", "guard_del_flag",
           "violation_counts", "add_constraint", "drop_constraint",
           "PROP_KEY", "MARKER"]

PROP_KEY = "check_constraints"
#: marker embedded in the raise_error message so merge can translate the
#: executor-side SparkRuntimeException into a typed ConstraintViolation
MARKER = "[etl_spark CHECK"


class ConstraintViolation(ValueError):
    """A merge batch (or existing data, for add_constraint) violates a
    declared CHECK constraint."""


def parse_constraints(props: dict) -> dict[str, str]:
    """``check_constraints`` table prop (JSON object name → boolean SQL
    expression) → dict. Absent/empty = no constraints, zero overhead."""
    raw = (props or {}).get(PROP_KEY, "")
    if not raw:
        return {}
    out = json.loads(raw)
    if not isinstance(out, dict) or \
            not all(isinstance(v, str) for v in out.values()):
        raise ValueError(
            f"{PROP_KEY} must be a JSON object of name -> SQL expression, "
            f"got {raw!r}"
        )
    return out


def guard_del_flag(del_flag_col, constraints: dict[str, str]):
    """Wrap the merge's tombstone-flag column with the enforcement
    guard: evaluating the returned column raises (executor-side, first
    violating row) iff a NON-delete row makes any constraint FALSE.
    Folding the guard into a column the write already materializes is
    what keeps enforcement zero-extra-pass — Catalyst cannot prune it,
    and no separate action re-evaluates the batch."""
    chain = None
    for name, expr in sorted(constraints.items()):
        viol = (~del_flag_col) & (F.expr(expr).cast("boolean") == F.lit(False))
        err = F.raise_error(F.concat(
            F.lit(f"{MARKER} constraint {name!r} violated: ({expr}) "
                  f"is FALSE for row "),
            F.to_json(F.struct("*")),
        )).cast("boolean")
        chain = F.when(viol, err) if chain is None else chain.when(viol, err)
    return chain.otherwise(del_flag_col)


def violation_counts(df: DataFrame, constraints: dict[str, str]) -> dict:
    """Per-constraint violation counts over ``df`` (FALSE-only, NULL
    passes) in ONE aggregate — the dry-run/audit face, and what
    ``add_constraint(validate=True)`` runs over existing data."""
    if not constraints:
        return {}
    aggs = [
        F.count_if(F.expr(expr).cast("boolean") == F.lit(False)).alias(name)
        for name, expr in sorted(constraints.items())
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: row[name] for name in sorted(constraints)}


def add_constraint(table, name: str, expr: str, validate: bool = True) -> dict:
    """Declare a CHECK constraint on the table (atomic props commit).
    With ``validate=True`` (default, Delta posture) the existing LIVE
    state must already satisfy it — one loud O(table) scan; pass False
    only when the data is known-clean (e.g. an empty table). Returns
    the new constraint dict."""
    if not name or not isinstance(expr, str) or not expr.strip():
        raise ValueError("constraint needs a name and a SQL expression")
    cons = parse_constraints(table.current_snapshot().props)
    if name in cons:
        raise ValueError(
            f"constraint {name!r} already declared as "
            f"({cons[name]}); drop_constraint first"
        )
    # fail on an unanalyzable expression BEFORE committing the prop
    probe = dict(cons)
    probe[name] = expr
    if validate:
        bad = violation_counts(table.read(), {name: expr})[name]
        if bad:
            raise ConstraintViolation(
                f"cannot add constraint {name!r}: {bad} existing live "
                f"row(s) violate ({expr})"
            )
    else:
        # still analysis-check the expression against the schema
        table.read().limit(0).filter(F.expr(expr).cast("boolean")).collect()
    table.alter_props({PROP_KEY: json.dumps(probe, sort_keys=True)})
    return probe


def merge_quarantine(
    table,
    batch: DataFrame,
    manifest_key: str,
    dlq_dir: str,
    op_col: str = "op",
    delete_op: str = "D",
):
    """Dead-letter posture for CHECK constraints: instead of refusing
    the whole batch (``merge``'s default — right for batch loads, wrong
    for a stream one poison row must not stall), SPLIT it — violating
    non-delete rows land as parquet under
    ``<dlq_dir>/<manifest_key>/`` with a ``_violation`` reason column
    (the first failing constraint's name, mirroring the envelope
    router's reasoned dead-letter, cdc/router.py), and the clean
    remainder merges under the SAME manifest key. Returns
    ``(MergeStats, quarantined_row_count)``.

    This is the documented TWO-PASS path (filter + merge both evaluate
    the batch) — the price of not stalling; the zero-extra-pass refusal
    stays the default. Crash shape: the DLQ write happens BEFORE the
    merge and is idempotent per manifest key (overwrite of the key's own
    directory), so a crash between the two re-runs both, and a re-run
    after the merge committed is a metadata no-op that leaves the DLQ
    in place — exactly-once on the table, at-least-once on the DLQ
    directory, never a lost row on either side."""
    snap = table.current_snapshot()
    if snap.has_applied(manifest_key):
        from etl_spark.lake.table import MergeStats

        return MergeStats(manifest_key, False, snap.version), 0
    cons = parse_constraints(snap.props)
    if not cons:
        return table.merge(batch, manifest_key, op_col=op_col,
                           delete_op=delete_op), 0
    import os

    not_del = F.col(op_col) != F.lit(delete_op)
    viol_any = F.lit(False)
    reason = None
    for name, expr in sorted(cons.items()):
        # eqNullSafe: a NULL-evaluating constraint PASSES (SQL CHECK) —
        # a plain == would make the row NULL in BOTH filters below and
        # silently drop it from table and DLQ alike
        this = F.expr(expr).cast("boolean").eqNullSafe(F.lit(False))
        viol_any = viol_any | this
        reason = F.when(this, F.lit(name)) if reason is None \
            else reason.when(this, F.lit(name))
    viol_any = not_del & viol_any
    key_dir = os.path.join(
        dlq_dir, "".join(c if c.isalnum() or c in "-_." else "_"
                         for c in manifest_key))
    bad = batch.filter(viol_any).withColumn("_violation", reason)
    bad.write.mode("overwrite").parquet(key_dir)
    n_bad = table.spark.read.parquet(key_dir).count()
    stats = table.merge(batch.filter(~viol_any), manifest_key,
                        op_col=op_col, delete_op=delete_op)
    return stats, n_bad


def drop_constraint(table, name: str) -> dict:
    cons = parse_constraints(table.current_snapshot().props)
    if name not in cons:
        raise ValueError(f"no constraint named {name!r}; have "
                         f"{sorted(cons)}")
    cons.pop(name)
    table.alter_props(
        {PROP_KEY: json.dumps(cons, sort_keys=True) if cons else None})
    return cons
