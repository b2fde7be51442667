from etl_spark.streaming.stream_replay import stream_replay

__all__ = ["stream_replay"]
