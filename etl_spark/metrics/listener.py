"""StreamingQueryListener → metrics ledger bridge (SURVEY §2.9).

The reference logs per-batch row counts and memory to loguru
(/root/reference/src/impulsoetl/siasus/procedimentos.py:269-277,416-421);
the streaming-native equivalent is query-progress events captured off the
listener bus into the same JSONL ledger the merge path uses.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["LedgerQueryListener"]


class LedgerQueryListener(StreamingQueryListener):
    """Records one ledger row per micro-batch progress event."""

    def __init__(self, sink):
        self.sink = sink

    def onQueryStarted(self, event) -> None:
        self.sink.record({"stream_event": "started", "query_id": str(event.id)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.sink.record(
            {
                "stream_event": "progress",
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "process_rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.sink.record(
            {"stream_event": "terminated", "query_id": str(event.id),
             "error": event.exception}
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass
