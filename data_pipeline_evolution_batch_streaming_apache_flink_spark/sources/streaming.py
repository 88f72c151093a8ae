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


def startup_offsets(
    mode: str,
    topic: str,
    timestamp_ms: int | None = None,
    specific: dict[int, int] | None = None,
) -> dict[str, str]:
    """Translate Flink's ``scan.startup.mode`` values (reference S6,
    flink-applications/06-flink-cdc-temporal-join.json:8 uses
    ``earliest-offset``) to Spark Kafka source options:

    - ``earliest-offset`` / ``latest-offset`` → ``startingOffsets``
    - ``timestamp`` (+ ``timestamp_ms``) → ``startingOffsetsByTimestamp``
    - ``specific-offsets`` (+ ``specific`` {partition: offset}) →
      ``startingOffsets`` JSON
    - ``group-offsets`` has no Spark equivalent by design: Spark tracks
      progress in the CHECKPOINT, not the broker consumer group — resume
      by reusing the checkpointLocation. Raises ValueError to force the
      caller to choose.
    """
    import json

    if mode == "earliest-offset":
        return {"startingOffsets": "earliest"}
    if mode == "latest-offset":
        return {"startingOffsets": "latest"}
    if mode == "timestamp":
        if timestamp_ms is None:
            raise ValueError("timestamp mode needs timestamp_ms")
        return {"startingOffsetsByTimestamp": json.dumps({topic: {"*": timestamp_ms}})}
    if mode == "specific-offsets":
        if not specific:
            raise ValueError("specific-offsets mode needs {partition: offset}")
        return {"startingOffsets": json.dumps({topic: {str(p): o for p, o in specific.items()}})}
    if mode == "group-offsets":
        raise ValueError(
            "group-offsets: Spark resumes from the checkpoint, not the "
            "consumer group — reuse checkpointLocation instead"
        )
    raise ValueError(f"unknown scan.startup.mode {mode!r}")


def kafka_json_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    startup_mode: str | None = None,
    timestamp_ms: int | None = None,
    specific: dict[int, int] | None = None,
) -> DataFrame:
    """Raw Kafka stream (value as string) — reference S4/S5/S6 surface.
    Pass either ``starting_offsets`` directly (Spark option value) or a
    Flink-style ``startup_mode`` (translated via :func:`startup_offsets`)."""
    opts = (
        startup_offsets(startup_mode, topic, timestamp_ms, specific)
        if startup_mode is not None
        else {"startingOffsets": starting_offsets}
    )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load().selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value", "timestamp"
    )
