from etl_spark.streaming.change_feed import (
    follow_changes,
    stream_agg_sync,
    stream_join_sync,
    stream_sync,
)
from etl_spark.streaming.dedup_stream import stream_dedup_ingest
from etl_spark.streaming.envelope_stream import stream_envelope_ingest
from etl_spark.streaming.scd2_stream import stream_scd2
from etl_spark.streaming.stateful import lww_compact_stream
from etl_spark.streaming.stream_replay import stream_replay
from etl_spark.streaming.txn_stream import stream_txn_ingest

__all__ = ["follow_changes", "lww_compact_stream", "stream_agg_sync",
           "stream_dedup_ingest", "stream_envelope_ingest",
           "stream_join_sync", "stream_replay", "stream_scd2",
           "stream_sync", "stream_txn_ingest"]
