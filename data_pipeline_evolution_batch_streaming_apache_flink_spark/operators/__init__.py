from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.joins import (
    asof_join,
    interval_join,
    lookup_join,
    unnest_join,
)
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.changelog import latest_per_key

__all__ = ["asof_join", "interval_join", "lookup_join", "unnest_join", "latest_per_key"]
