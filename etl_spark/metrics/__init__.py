from etl_spark.metrics.freshness import consumer_lag
from etl_spark.metrics.lineage import MetricsSink
from etl_spark.metrics.listener import LedgerQueryListener

__all__ = ["MetricsSink", "LedgerQueryListener", "consumer_lag"]
