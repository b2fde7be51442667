"""Debezium/binlog-style CDC envelope adapter.

Real CDC pipelines rarely hand the consumer a flat WAL: Debezium, AWS
DMS and Maxwell all emit a JSON *envelope* per change —
``{"op": "c|u|d|r", "before": {...}, "after": {...}, "ts_ms": ...,
"source": {"table": ..., "lsn": ...}, "transaction": {...}}`` — while
this engine's internal schema (cdc/events.py) is flat ``I/U/D`` + key +
payload + version. This module normalizes an envelope stream into that
flat schema so the entire replay / merge / sync / SCD2 stack applies
unchanged, the same way the reference normalizes each upstream's
transport quirks into one tratamento shape before loading
(/root/reference/src/impulsoetl/scripts/geral.py:36-116 — every capture
funnels through the same per-period idempotent apply regardless of
whether it arrived via FTP, REST or Selenium).

Semantics (documented, test-pinned):

- ``op`` mapping: ``c`` (create) and ``r`` (snapshot read) → ``I``;
  ``u`` → ``U``; ``d`` → ``D``. Snapshot reads are inserts because the
  engine's MERGE upsert is idempotent per key/version.
- Payload comes from ``after``, except deletes, which take ``before``
  (Debezium deletes carry ``after = null`` and at least the key in
  ``before``).
- Version: ``op_ts = timestamp_millis(ts_ms)`` with ``seq =
  coalesce(source.lsn, transaction.total_order, 0)`` as the tiebreak —
  feed ``version_cols=["op_ts", "seq"]`` to replay/merge.
- Kafka *tombstones* (NULL value) are dropped, not quarantined: the
  Debezium ``d`` envelope precedes them and carries the delete; the
  tombstone exists only for topic compaction.
- Key-changing updates need no special case: Debezium emits them as a
  ``d`` + ``c`` pair, never as a ``u`` whose before/after keys differ.
- Malformed rows (unparseable JSON, unknown ``op``, missing ``ts_ms``)
  are quarantined with a reason — a poison message must never abort a
  10^10-event replay, and silently dropping it would corrupt downstream
  state invisibly. Debezium's rare ``t`` (truncate) op lands in the
  quarantine too, deliberately: a truncate's "all rows, as of this
  stream position" semantics cannot be expressed as a LWW merge (rows
  arriving later with older versions must still lose), so it needs an
  operator decision — surface it, don't guess.

Scale notes: parsing is one codegen'd projection (``from_json`` +
conditional struct flatten) — no shuffle, no Python, streams through
whole-stage codegen at WAL-scan speed. The good/quarantine split is two
filters over the same projection; in batch each triggers its own scan
of the (columnar, pruned) source, in streaming split once per
micro-batch inside ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "envelope_schema",
    "infer_payload_schema",
    "make_envelope",
    "parse_envelopes",
    "quarantine_reason",
    "suggest_promotions",
]

#: Debezium source-block fields the adapter understands. Extra fields in
#: the payload JSON are ignored by from_json (PERMISSIVE), so richer
#: connectors parse fine.
SOURCE_SCHEMA = StructType(
    [
        StructField("connector", StringType(), True),
        StructField("db", StringType(), True),
        StructField("table", StringType(), True),
        StructField("lsn", LongType(), True),
    ]
)

TRANSACTION_SCHEMA = StructType(
    [
        StructField("id", StringType(), True),
        StructField("total_order", LongType(), True),
    ]
)

_OPS = ("c", "u", "d", "r")


def envelope_schema(payload_schema: StructType) -> StructType:
    """The full envelope struct for a given row-payload schema."""
    return StructType(
        [
            StructField("op", StringType(), True),
            StructField("before", payload_schema, True),
            StructField("after", payload_schema, True),
            StructField("ts_ms", LongType(), True),
            StructField("source", SOURCE_SCHEMA, True),
            StructField("transaction", TRANSACTION_SCHEMA, True),
        ]
    )


def make_envelope(
    op: Column,
    before: Column | None,
    after: Column | None,
    ts_ms: Column,
    source: Column | None = None,
    transaction: Column | None = None,
) -> Column:
    """Serialize envelope parts to the JSON wire form (the inverse of
    :func:`parse_envelopes`; used by tests and fixtures — a real deploy
    receives these bytes from the connector). NULL fields are omitted,
    matching Debezium's serialization of absent before/after blocks."""
    parts = [F.lit("op"), op, F.lit("ts_ms"), ts_ms]
    if before is not None:
        parts += [F.lit("before"), before]
    if after is not None:
        parts += [F.lit("after"), after]
    if source is not None:
        parts += [F.lit("source"), source]
    if transaction is not None:
        parts += [F.lit("transaction"), transaction]
    return F.to_json(F.named_struct(*parts))


def quarantine_reason(env: Column) -> Column:
    """Why a parsed envelope struct is unusable (NULL = it's fine):
    ``null_envelope`` (unparseable JSON), ``bad_op``, ``null_ts``."""
    return (
        F.when(env.isNull(), F.lit("null_envelope"))
        .when(env["op"].isNull() | ~env["op"].isin(*_OPS), F.lit("bad_op"))
        .when(env["ts_ms"].isNull(), F.lit("null_ts"))
    )


def infer_payload_schema(
    df: DataFrame,
    base: StructType,
    value_col: str = "value",
) -> StructType:
    """Additive wire-schema drift discovery: scan a batch of envelopes for
    payload keys absent from ``base`` and return ``base`` extended with
    them (sorted by name, appended — existing fields never change, so the
    downstream lake evolution stays additive, the way the reference folds
    late-vintage ADICIONAIS columns onto earlier captures).

    Types are inferred per new key from the values actually present, by
    consensus over the whole batch: BIGINT if every non-null occurrence
    casts, else DOUBLE, else BOOLEAN, else STRING. The payload objects are
    read as ``map<string,string>`` — a JSON *string* that happens to look
    numeric is indistinguishable from a number at that point (same caveat
    as CSV inference); pin the real type in ``base`` when it matters.

    One distributed pass: both payload sides exploded to ``(key, value)``,
    map-side-combinable consensus aggregate over the (tiny) new-key set,
    then a driver collect of #new-keys rows — the usual control-plane
    schema job. Deterministic given the batch.
    """
    from pyspark.sql.types import BooleanType, DoubleType

    known = set(base.fieldNames())
    raw = F.col(value_col)
    sides = [
        F.from_json(F.get_json_object(raw, f"$.{side}"), "map<string,string>")
        for side in ("after", "before")
    ]
    nonnull = df.filter(raw.isNotNull())
    kv = nonnull.select(F.explode(sides[0]).alias("k", "v")).unionAll(
        nonnull.select(F.explode(sides[1]).alias("k", "v"))
    )
    consensus = (
        kv.filter(~F.col("k").isin(*known) if known else F.lit(True))
        .filter(F.col("v").isNotNull())
        .groupBy("k")
        .agg(
            F.min(F.col("v").try_cast("bigint").isNotNull()).alias("is_long"),
            F.min(F.col("v").try_cast("double").isNotNull()).alias("is_dbl"),
            F.min(F.col("v").isin("true", "false")).alias("is_bool"),
        )
        .collect()
    )
    new_fields = []
    for r in sorted(consensus, key=lambda r: r["k"]):
        if r["is_long"]:
            t = LongType()
        elif r["is_dbl"]:
            t = DoubleType()
        elif r["is_bool"]:
            t = BooleanType()
        else:
            t = StringType()
        new_fields.append(StructField(r["k"], t, True))
    return StructType(list(base.fields) + new_fields)


def suggest_promotions(
    df: DataFrame,
    base: StructType,
    value_col: str = "value",
) -> dict[str, tuple[str, str]]:
    """Detect EXISTING payload columns a batch has outgrown: the other
    half of wire drift beside :func:`infer_payload_schema`'s new keys.
    A field that sent ``1`` for months and starts sending ``1.5`` can't
    evolve additively — and ANSI casts would TRUNCATE the fraction
    silently (they are loud only for overflow/garbage), which is why
    the merge refuses fractional-into-integral casts outright. This
    tells the operator exactly which column to widen and to what, i.e.
    the input to :meth:`etl_spark.lake.LakeTable.alter_column_type`.

    Returns ``{column: (declared, needed)}`` in simpleString form for
    every declared payload column whose batch-consensus type outranks
    its declared type on the value-preserving lattice int < bigint <
    double < string (float → double; a non-boolean value in a BOOLEAN
    column needs string). Empty dict = the batch fits. Same one-pass
    distributed consensus job as the inference; no data moves twice."""
    known = {f.name: f.dataType.simpleString() for f in base.fields}
    if not known:
        return {}
    raw = F.col(value_col)
    sides = [
        F.from_json(F.get_json_object(raw, f"$.{side}"), "map<string,string>")
        for side in ("after", "before")
    ]
    nonnull = df.filter(raw.isNotNull())
    kv = nonnull.select(F.explode(sides[0]).alias("k", "v")).unionAll(
        nonnull.select(F.explode(sides[1]).alias("k", "v"))
    )
    consensus = (
        kv.filter(F.col("k").isin(*known))
        .filter(F.col("v").isNotNull())
        .groupBy("k")
        .agg(
            F.min(F.col("v").try_cast("bigint").isNotNull()).alias("is_long"),
            F.min(F.col("v").try_cast("double").isNotNull()).alias("is_dbl"),
            F.min(F.col("v").isin("true", "false")).alias("is_bool"),
        )
        .collect()
    )
    rank = {"int": 0, "bigint": 1, "float": 2, "double": 2, "string": 3}
    out: dict[str, tuple[str, str]] = {}
    for r in sorted(consensus, key=lambda r: r["k"]):
        inferred = ("bigint" if r["is_long"]
                    else "double" if r["is_dbl"]
                    else "boolean" if r["is_bool"]
                    else "string")
        declared = known[r["k"]]
        if declared == "boolean":
            if inferred != "boolean":
                out[r["k"]] = (declared, "string")
            continue
        if inferred == "boolean":
            inferred = "string"  # true/false landing in a numeric column
        if declared not in rank:
            continue  # timestamps etc.: parse-level concerns, not lattice
        if rank[inferred] > rank[declared]:
            # float declared + double inferred is NOT drift (same rank)
            out[r["k"]] = (declared, inferred)
    return out


def parse_envelopes(
    df: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    table: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Normalize a JSON envelope stream to the engine's flat event shape.

    Returns ``(events, quarantine)``:

    - ``events``: ``op`` (I/U/D), ``op_ts`` (timestamp), ``seq`` (long
      version tiebreak), ``_table`` (source table name, for fan-out
      routing of multi-table streams), then the payload columns in
      ``payload_schema`` order. Pass ``table=`` to keep only one
      table's events (the filter lands before the flatten, so Catalyst
      prunes the rest at the scan when the source is columnar).
    - ``quarantine``: the raw ``value`` plus a ``reason`` column
      (``null_envelope`` / ``bad_op`` / ``null_ts``; with ``table=``
      also ``null_table`` — a well-formed envelope whose
      ``source.table`` is NULL can't be attributed to any table, so it
      dead-letters rather than silently vanishing between the two
      outputs) for dead-letter landing; replaying the quarantine after
      a connector fix is just ``parse_envelopes`` again.

    Kafka tombstones (NULL ``value_col``) appear in neither output.
    """
    raw = F.col(value_col)
    parsed = F.from_json(raw, envelope_schema(payload_schema))
    # The explode(array(...)) is a deliberate barrier: projected directly,
    # every downstream field access is rewritten by Catalyst's
    # OptimizeJsonExprs into its OWN schema-pruned from_json (measured 12
    # parses per row on this shape — ~6x the whole operator's cost); a
    # Generate materializes the struct once and field accesses bind to
    # the attribute. A NULL parse survives as a one-element NULL array,
    # so quarantine classification is unaffected.
    base = df.filter(raw.isNotNull()).select(
        raw.alias("__raw"),
        F.explode(F.array(parsed)).alias("__env"),
    )
    env = F.col("__env")

    reason = quarantine_reason(env)
    if table is not None:
        # single-table mode: an otherwise-good envelope with NULL
        # source.table would fail the equality filter below and land in
        # NEITHER output — quarantine it instead (never silently drop)
        reason = F.coalesce(
            reason,
            F.when(env["source"]["table"].isNull(), F.lit("null_table")),
        )
    quarantine = base.select(
        F.col("__raw").alias("value"), reason.alias("reason")
    ).filter(F.col("reason").isNotNull())

    payload = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    good = base.filter(reason.isNull())
    if table is not None:
        good = good.filter(env["source"]["table"] == F.lit(table))
    events = good.select(
        F.when(env["op"] == "u", F.lit("U"))
        .when(env["op"] == "d", F.lit("D"))
        .otherwise(F.lit("I"))  # c and r
        .alias("op"),
        F.timestamp_millis(env["ts_ms"]).alias("op_ts"),
        F.coalesce(
            env["source"]["lsn"],
            env["transaction"]["total_order"],
            F.lit(0),
        ).alias("seq"),
        env["source"]["table"].alias("_table"),
        *[payload[f.name].alias(f.name) for f in payload_schema.fields],
    )
    return events, quarantine
