"""Transaction-boundary gating: never apply half an upstream transaction.

Debezium-style connectors emit, besides the per-row envelopes (whose
``transaction`` block names the source transaction and the row's
``total_order`` within it), a transaction *metadata* stream of
BEGIN/END markers — the END marker carrying the transaction's total
``event_count``. A consumer that applies rows as they arrive can expose
a state no upstream transaction ever produced (order row landed, its
order-lines still in flight). This module withholds rows until their
transaction's END marker has arrived AND the arrived-row count equals
the marker's ``event_count``, releasing whole transactions only —
the read-committed contract, batched.

Semantics (test-pinned):

- Rows with no ``transaction`` block are autocommit — released
  immediately (that is what the connector means by omitting it).
- A transaction is *complete* when an END marker for its id exists and
  the number of buffered rows with that id equals the marker's
  ``event_count``. Completeness can be reached in any arrival order
  (marker before rows, rows before marker, interleaved across waves).
- Released rows leave the buffer; markers for released transactions
  leave the marker state. An abandoned transaction (connector died
  mid-emit; END never comes) stays buffered — ``pending()`` exposes it
  for ops to reconcile or discard by id (``discard``).
- Crash contract: release is at-least-once, apply is idempotent (the
  destination MERGE is LWW + manifest-keyed), so the composed effect is
  exactly-once — the same discipline as the rest of the engine. The
  buffer mutations themselves are manifest-keyed by wave.
- Connector redelivery: a redelivered WHOLE transaction (rows + END)
  re-completes, re-releases and re-evicts — idempotent downstream. A
  PARTIAL redelivery after eviction (rows without their marker)
  re-buffers and, with the marker gone, surfaces in ``pending()`` like
  any abandoned transaction rather than double-applying.

Scale notes: the buffer is an ordinary LakeTable keyed
``(txn_id, total_order)`` — bucketed, mergeable, vacuumable — and the
marker state another keyed ``txn_id``; completeness is one combinable
count aggregate over the buffer joined to the (small) marker table.
Rows buffer as raw wire strings, so the gate composes in FRONT of
:func:`etl_spark.cdc.router.route_envelopes` unchanged.

Wire forms understood::

    row:    {"op": ..., "transaction": {"id": "tx7", "total_order": 2}, ...}
    marker: {"status": "END", "id": "tx7", "event_count": 3}

(BEGIN markers are accepted and ignored — only END carries information
the gate needs.)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable

__all__ = ["TxnGate", "TxnWaveStats", "create_txn_gate"]

_BUFFER_DDL = (
    "txn_id string, total_order bigint, wave bigint, value string"
)
_MARKER_DDL = "txn_id string, wave bigint, event_count bigint"


@dataclass(frozen=True)
class TxnWaveStats:
    released_rows: int
    released_txns: int
    autocommit_rows: int
    buffered_rows: int


def create_txn_gate(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> "TxnGate":
    """Create the gate's two state tables under ``path``."""
    buffer = LakeTable.create(
        spark,
        os.path.join(path, "buffer"),
        StructType.fromDDL(_BUFFER_DDL),
        key_cols=["txn_id", "total_order"],
        version_cols=["wave"],
        n_buckets=n_buckets,
    )
    markers = LakeTable.create(
        spark,
        os.path.join(path, "markers"),
        StructType.fromDDL(_MARKER_DDL),
        key_cols=["txn_id"],
        version_cols=["wave"],
        n_buckets=max(2, n_buckets // 4),
    )
    return TxnGate(buffer, markers)


class TxnGate:
    """See module docstring. Load with ``TxnGate.load(spark, path)``.

    ``manifest_prefix`` namespaces the wave manifest keys — required
    when waves are streaming batch ids, which are only unique per
    checkpoint incarnation (pass the ``stream_identity``); without it a
    rebuilt checkpoint's batch 0 would no-op against the old batch 0's
    manifest and silently drop data. Transaction ids themselves are
    assumed globally unique (they are LSN/XID-derived at the source), so
    buffer keys never collide across incarnations."""

    def __init__(
        self,
        buffer: LakeTable,
        markers: LakeTable,
        manifest_prefix: str = "",
    ):
        self.buffer = buffer
        self.markers = markers
        self._p = f"{manifest_prefix}:" if manifest_prefix else ""

    @staticmethod
    def load(
        spark: SparkSession, path: str, manifest_prefix: str = ""
    ) -> "TxnGate":
        return TxnGate(
            LakeTable.load(spark, os.path.join(path, "buffer")),
            LakeTable.load(spark, os.path.join(path, "markers")),
            manifest_prefix=manifest_prefix,
        )

    # ---------------------------------------------------------- wave

    def apply_wave(
        self,
        batch: DataFrame,
        wave: int,
        value_col: str = "value",
    ) -> tuple[DataFrame, TxnWaveStats]:
        """Feed one wave of raw wire lines through the gate.

        Returns ``(releasable, stats)``: every line whose transaction is
        now complete (plus all autocommit lines of this wave), as a
        ``value``-column DataFrame ready for
        :func:`~etl_spark.cdc.router.route_envelopes` /
        ``parse_envelopes``; and the wave's counts. State mutations are
        manifest-keyed by ``wave`` — re-running a wave after a crash
        re-releases the same rows (idempotent downstream) without
        double-buffering.

        Release protocol (crash-safe): ``apply_wave`` does NOT evict.
        The caller applies the releasable rows downstream, then calls
        :meth:`confirm_released` to drop them from the buffer. A crash
        between the two re-releases the same transactions next wave
        (they are still buffered and still complete) — at-least-once
        release, idempotent downstream apply, exactly-once effect. The
        releasable frame is localCheckpointed (eager) so it stays valid
        across the confirmation's state rewrite.
        """
        raw = F.col(value_col)
        probed = batch.filter(raw.isNotNull()).select(
            raw.alias("value"),
            F.get_json_object(raw, "$.status").alias("__status"),
            F.get_json_object(raw, "$.id").alias("__mid"),
            F.get_json_object(raw, "$.event_count")
            .cast("bigint")
            .alias("__count"),
            F.get_json_object(raw, "$.transaction.id").alias("__tid"),
            F.get_json_object(raw, "$.transaction.total_order")
            .cast("bigint")
            .alias("__ord"),
        )
        is_marker = F.col("__status").isNotNull() & F.col("__mid").isNotNull()
        is_txn_row = F.col("__tid").isNotNull()

        autocommit = probed.filter(~is_marker & ~is_txn_row).select("value")

        # A transactional row missing total_order (malformed wire —
        # Debezium always emits it) gets a synthesized NEGATIVE tiebreak:
        # the hash of its raw line. Coalescing to a constant would make
        # two such rows collide on the (txn_id, total_order) buffer key —
        # one silently overwritten, the buffered count never reaching
        # event_count, the transaction stuck pending forever with a row
        # lost on discard. Negative keeps it disjoint from the
        # connector's own nonnegative orders; hashing the raw line keeps
        # it idempotent across redelivery (the duplicate LWW-collapses,
        # exactly as a redelivered well-formed row does).
        new_rows = probed.filter(is_txn_row).select(
            F.col("__tid").alias("txn_id"),
            F.coalesce(
                F.col("__ord"),
                -(F.pmod(F.xxhash64(F.col("value")), F.lit(2**62))
                  + F.lit(1)),
            ).alias("total_order"),
            F.lit(wave).cast("long").alias("wave"),
            "value",
        ).withColumn("op", F.lit("I"))
        new_markers = probed.filter(
            is_marker & (F.col("__status") == "END")
        ).select(
            F.col("__mid").alias("txn_id"),
            F.lit(wave).cast("long").alias("wave"),
            F.col("__count").alias("event_count"),
        ).withColumn("op", F.lit("I"))

        self.buffer.merge(new_rows, manifest_key=f"txn:{self._p}buf:{wave}")
        self.markers.merge(new_markers, manifest_key=f"txn:{self._p}mark:{wave}")

        # Complete transactions: buffered count == marker's event_count.
        # One combinable count over the buffer; the marker side is small
        # (open transactions only) — broadcast it.
        buf = self.buffer.read()
        counts = buf.groupBy("txn_id").agg(F.count("*").alias("n"))
        complete = counts.join(
            F.broadcast(self.markers.read()), on="txn_id", how="inner"
        ).filter(F.col("n") == F.col("event_count")).select("txn_id")

        released = buf.join(
            F.broadcast(complete), on="txn_id", how="left_semi"
        ).localCheckpoint(eager=True)

        n_released = released.count()
        n_auto = autocommit.count()
        n_txns = released.select("txn_id").distinct().count()
        self._last_released = released  # for confirm_released(wave)

        out = autocommit.unionAll(released.select("value"))
        return out, TxnWaveStats(
            released_rows=n_released,
            released_txns=n_txns,
            autocommit_rows=n_auto,
            buffered_rows=buf.count() - n_released,
        )

    def confirm_released(self, wave: int) -> None:
        """Drop the transactions :meth:`apply_wave` just released from
        the buffer/marker state. Call AFTER the downstream apply
        committed; manifest-keyed by ``wave``, so a replayed wave's
        confirmation is a metadata no-op."""
        released = getattr(self, "_last_released", None)
        if released is None:
            raise RuntimeError("confirm_released before apply_wave")
        self._evict(released, wave)
        self._last_released = None

    def _evict(
        self, released: DataFrame, wave: int, kind: str = "evict"
    ) -> None:
        # Tombstone released rows + their markers. Version bumps past the
        # insert wave so the delete always wins.
        gone_rows = released.select(
            "txn_id", "total_order",
            (F.col("wave") + F.lit(1)).alias("wave"),
            F.lit(None).cast("string").alias("value"),
            F.lit("D").alias("op"),
        )
        self.buffer.merge(gone_rows, manifest_key=f"txn:{self._p}{kind}:{wave}")
        gone_marks = (
            released.select("txn_id").distinct()
            .join(self.markers.read(), on="txn_id", how="inner")
            .select(
                "txn_id", (F.col("wave") + F.lit(1)).alias("wave"),
                F.lit(None).cast("long").alias("event_count"),
                F.lit("D").alias("op"),
            )
        )
        self.markers.merge(gone_marks, manifest_key=f"txn:{self._p}un{kind}:{wave}")

    # ------------------------------------------------------ operations

    def pending(self) -> DataFrame:
        """Open transactions: ``txn_id, rows_buffered, expected (NULL
        until the END marker arrives), oldest_wave`` — the ops surface
        for spotting abandoned transactions. Full outer: a marker whose
        rows never arrived (rows_buffered = 0, oldest_wave NULL) is just
        as abandoned as rows without their marker."""
        buf = self.buffer.read().groupBy("txn_id").agg(
            F.count("*").alias("rows_buffered"),
            F.min("wave").alias("oldest_wave"),
        )
        marks = self.markers.read().select(
            "txn_id", F.col("event_count").alias("expected")
        )
        return buf.join(marks, on="txn_id", how="full_outer").select(
            "txn_id",
            F.coalesce(F.col("rows_buffered"), F.lit(0))
            .alias("rows_buffered"),
            "expected",
            "oldest_wave",
        )

    def discard(self, txn_id: str, wave: int) -> int:
        """Drop an abandoned transaction's buffered rows (and marker, if
        any). Returns how many rows were discarded."""
        doomed = self.buffer.read().filter(F.col("txn_id") == txn_id)
        n = doomed.count()
        self._evict(doomed.localCheckpoint(eager=True), wave, kind="discard")
        # a marker whose rows never arrived has nothing buffered, so the
        # row-derived eviction above misses it — tombstone it directly
        mark = self.markers.read().filter(F.col("txn_id") == txn_id).select(
            "txn_id", (F.col("wave") + F.lit(1)).alias("wave"),
            F.lit(None).cast("long").alias("event_count"),
            F.lit("D").alias("op"),
        )
        self.markers.merge(
            mark, manifest_key=f"txn:{self._p}discardmark:{wave}"
        )
        return n
