from etl_spark.metrics.lineage import MetricsSink

__all__ = ["MetricsSink"]
