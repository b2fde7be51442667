"""Custom stateful streaming operator: in-flight LWW change-log compaction.

``applyInPandasWithState`` keyed by the CDC key keeps the current winner
version per key across micro-batches and emits only events that *advance*
it — upstream change-log compaction that shrinks what the sink must merge
(duplicates and stale out-of-order events drop in flight).

This is the engine's ``applyInPandasWithState`` surface (the SURVEY §2.9
"custom stateful operator" slot). It is an optimization stage, not a
correctness stage: the LakeTable merge downstream is idempotent and
LWW-correct with or without it. State is (op_ts_micros, event_id) per key
— bounded by the live key count; a production deployment adds a state TTL
at the event-time watermark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

__all__ = ["lww_compact_stream"]


def lww_compact_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "op_ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Stateful filter: per key, pass only events newer than the best
    (ts, id) seen so far; state carries that watermark pair."""
    out_schema: StructType = stream.schema
    state_schema = "ts_us long, eid long"

    def compact(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best_ts, best_id = state.get if state.exists else (-1, -1)
        for pdf in batches:
            ts_us = (pdf[ts_col].astype("datetime64[us]").astype("int64")).to_numpy()
            eid = pdf[id_col].to_numpy()
            keep = (ts_us > best_ts) | ((ts_us == best_ts) & (eid > best_id))
            if keep.any():
                # events within one batch may themselves be out of order:
                # emit all advancing rows, track the max
                sel = pdf[keep]
                best_ts = int(ts_us[keep].max())
                best_id = int(eid[(ts_us == best_ts) & keep].max()) if (
                    (ts_us == best_ts) & keep).any() else best_id
                yield sel
        state.update((best_ts, best_id))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        compact,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
