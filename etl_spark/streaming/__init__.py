from etl_spark.streaming.stateful import lww_compact_stream
from etl_spark.streaming.stream_replay import stream_replay

__all__ = ["lww_compact_stream", "stream_replay"]
