"""PySpark-native analytics engine with the query/data-processing
capabilities of Aiven-Labs/data-pipeline-evolution-batch-streaming-apache-flink.

The reference evolves one order-enrichment pipeline through six scenarios
(batch JDBC -> view pushdown -> CDC lookup join -> outbox -> logical-decoding
outbox -> all-tables CDC with temporal joins). This package re-expresses that
entire surface Spark-first:

- ``tables``     declarative table specs (computed columns, watermarks, PKs)
- ``functions``  scalar/aggregate gap-fillers (ceil_to_hour, json_arrayagg, ...)
- ``operators``  joins (as-of, lookup, interval), changelog compaction,
                 dedup, similarity search, text analysis, multimodal plumbing
- ``sources``    batch/streaming sources incl. the Debezium envelope reader
- ``sinks``      upsert sink (keyed latest + tombstones) for Kafka/memory/parquet
- ``streaming``  stateful streaming operators (streaming as-of, txid gating)
- ``plans``      the application-spec runner ({sources, sinks, statement})

Everything is DataFrame/Spark-SQL declarative so Catalyst handles pushdown,
pruning, join selection, and AQE; Python only orchestrates.
"""

from data_pipeline_evolution_batch_streaming_apache_flink_spark.session import configure_streaming, get_spark, tune_for_oracle

__all__ = ["configure_streaming", "get_spark", "tune_for_oracle"]

__version__ = "0.1.0"
