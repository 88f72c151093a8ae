"""Streaming source helpers.

Kafka is the reference's transport (debezium-json / plain json topics);
the decode layer (sources/debezium.py) is transport-agnostic — it takes
any DataFrame with a JSON string column. These helpers provide the two
transports used here:

- :func:`kafka_json_stream` — the production path (needs Kafka jars).
- :func:`json_file_stream` — file-fed replay of the same envelopes for
  tests and backfills (SURVEY §5: streaming tests run availableNow over
  file fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def json_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Stream a directory of JSON-lines files; one file per micro-batch by
    default so multi-batch behavior (watermark advancement, state
    timeouts) is exercised deterministically."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def kafka_json_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Raw Kafka stream (value as string) — reference S4/S5/S6 surface:
    ``scan.startup.mode = earliest-offset`` maps to startingOffsets."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value", "timestamp")
    )
