from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.debezium import (
    debezium_envelope_schema,
    decode_debezium,
    decode_logical_message,
)

__all__ = ["debezium_envelope_schema", "decode_debezium", "decode_logical_message", "read_parquet"]
