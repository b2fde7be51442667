"""TablePort: the minimal table contract the consumer tier stands on.

The engine targets ``MERGE INTO`` an Iceberg/Delta table (SURVEY §1.1;
the reference's reflected-table sink, bd.py:62-74) but ships LakeTable
because this sandbox has no catalog jar or network (rationale: README
"Why a custom LakeTable"). The claim "swapping the sink is mechanical"
deserves an interface, not prose — this Protocol IS that seam: every
consumer in etl_spark/cdc, etl_spark/streaming and etl_spark/pipeline
drives its destination through exactly these members (verified by
grep + the conformance test in tests/test_port.py), so a real-catalog
binding only has to implement this surface.

Iceberg mapping (Spark SQL syntax, per the public Iceberg docs):

================  ====================================================
member            Iceberg realization
================  ====================================================
merge             ``MERGE INTO t USING batch ON keys WHEN MATCHED AND
                  batch outranks THEN UPDATE/DELETE WHEN NOT MATCHED
                  THEN INSERT`` inside a transaction that also inserts
                  ``manifest_key`` into a ledger table (exactly-once =
                  ledger PK conflict aborts the transaction; Iceberg
                  multi-table transactions or a WAP branch give the
                  atomicity)
read              ``SELECT * FROM t [VERSION AS OF v]`` minus
                  tombstones; ``where`` → ordinary pushed predicates
changes           ``SELECT * FROM t.changes BETWEEN v1 AND v2`` (the
                  changelog read) or incremental snapshot scan
folded_state      snapshot read WITH tombstones (replica bootstrap
                  copies winners + deletes: ``SELECT *, _deleted FROM
                  t VERSION AS OF v`` where deletes are modeled, or a
                  changelog fold from origin)
snapshot /        ``t.snapshots`` / ``t.history`` metadata tables;
versions /        ``current_snapshot_id``
current_version
current_snapshot  snapshot metadata object: schema, key/version
                  columns (table properties), applied-manifest ledger
has_applied       membership probe of the ledger (LakeTable folds it
                  into snapshot metadata; a catalog binding queries
                  the ledger table)
================  ====================================================

Intentionally NOT in the port: compaction/rebucket/vacuum (engine
maintenance — a catalog's own OPTIMIZE/expire procedures), bucket_expr
and scan_counts (layout introspection), purge/DML/WAP faces (built ON
the port members plus the write path they already share). Consumers
that genuinely need those import LakeTable and say so.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame

__all__ = ["TablePort"]


@runtime_checkable
class TablePort(Protocol):
    """Structural protocol — LakeTable conforms without inheriting.
    A replacement binding implements these and the consumer tier
    (sync / agg_sync / join_sync / scd2 / reconcile / bootstrap /
    streaming faces) runs unchanged."""

    def merge(
        self,
        batch: DataFrame,
        manifest_key: str,
        op_col: str = "op",
        delete_op: str = "D",
        max_retries: int = 3,
    ):
        """LWW-upsert a change batch exactly once under ``manifest_key``;
        returns MergeStats-shaped object with ``applied``/``version``."""
        ...

    def read(
        self,
        version: int | None = None,
        with_meta: bool = False,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
        where: list | None = None,
    ) -> DataFrame:
        """Live rows at a snapshot (tombstones filtered unless asked)."""
        ...

    def changes(self, from_version: int,
                to_version: int | None = None) -> DataFrame:
        """The change feed between two snapshot versions."""
        ...

    def folded_state(self, version: int | None = None) -> DataFrame:
        """The semantic fold at a snapshot INCLUDING tombstones (user
        schema + a deleted flag) — the replica-bootstrap copy surface
        (a new replica must inherit deletes so late events keep
        losing)."""
        ...

    def current_version(self) -> int: ...

    def versions(self) -> list[int]:
        """All retained snapshot versions, ascending."""
        ...

    def snapshot(self, version: int | None = None):
        """Snapshot metadata at a version (``None`` = current): must
        expose ``version``, ``schema``, ``key_cols``, ``version_cols``,
        ``props`` and ``has_applied(manifest_key)``."""
        ...

    def current_snapshot(self): ...
