"""Debezium change-event envelope reader — the engine's CDC ingestion
(SURVEY §2.1 S3/S4/S5).

The reference consumes Debezium JSON two ways:

- ``debezium-json`` Kafka format: Flink auto-extracts the ``after`` image
  and changelog op (reference flink-applications/03-kafka-cdc-flink-jdbc.json:8,
  06-flink-cdc-temporal-join.json:4-22). ``decode_debezium`` replicates
  that: ``from_json`` against the full envelope schema, then
  after-image (before-image for deletes) + ``op`` + ``source.ts_ms`` as
  the event-time metadata column.
- scenario 5's logical-decoding message envelope
  (flink-applications/05-kafka-logical-msg-flink.json:4): nested
  ``message.content`` carrying base64 JSON. ``decode_logical_message``
  handles the FROM_BASE64 + JSON_VALUE extraction chain (README.md:400-411).

Both work identically on batch and streaming DataFrames — the input is
just a string column of JSON (from Kafka ``value``, files, or a test
fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import from_base64_str, json_value

#: Debezium ``source`` block (reference 05-kafka-logical-msg-flink.json:4).
SOURCE_SCHEMA = T.StructType([
    T.StructField("version", T.StringType()),
    T.StructField("connector", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("snapshot", T.StringType()),
    T.StructField("db", T.StringType()),
    T.StructField("sequence", T.StringType()),
    T.StructField("schema", T.StringType()),
    T.StructField("table", T.StringType()),
    T.StructField("txId", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("xmin", T.LongType()),
])


def debezium_envelope_schema(row_schema: T.StructType | str) -> T.StructType:
    """Full change-event envelope for a table with the given row schema."""
    if isinstance(row_schema, str):
        row_schema = T.StructType.fromDDL(row_schema)
    return T.StructType([
        T.StructField("before", row_schema),
        T.StructField("after", row_schema),
        T.StructField("source", SOURCE_SCHEMA),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ])


def decode_debezium(
    df: DataFrame,
    row_schema: T.StructType | str,
    value_col: str = "value",
    event_time_col: str | None = "event_time",
    schema_include: bool | None = None,
    drop_tombstones: bool = True,
    lenient: bool = False,
) -> DataFrame:
    """Decode a column of Debezium-JSON change events into changelog rows.

    Output: the row image (``after`` for c/u/r, ``before`` for d — possible
    because of REPLICA IDENTITY FULL, reference scripts/load_dims.sql:59-63),
    plus ``op``, ``ts_ms``, ``txId``, ``lsn`` and the event-time metadata
    column (``value.source.timestamp`` in Flink DDL terms, reference
    06-flink-cdc-temporal-join.json:8).

    ``schema_include``: Kafka Connect's JsonConverter with
    ``schemas.enable=true`` wraps every event as
    ``{"schema": …, "payload": <envelope>}`` (Flink's
    ``debezium-json.schema-include`` option covers the same split).
    True = always unwrap, False = never, None (default) = auto-detect per
    row, so mixed topics replay correctly. Auto-detection costs one extra
    ``get_json_object`` scan per record — on a high-volume topic whose
    framing is known, pass the explicit flag to halve the parse work.

    The decoded row image is emitted alongside the envelope metadata
    columns ``op``/``ts_ms``/``txId``/``lsn``/``event_time_col``; a row
    schema reusing one of those names would produce ambiguous duplicate
    columns, so it is rejected up front (review r7).

    ``drop_tombstones``: a compacted Debezium topic carries post-delete
    tombstone records (null value); they carry no row data and are
    filtered out rather than decoded into all-null rows.

    ``lenient``: dead-letter channel for undecodable records (broken
    JSON, truncated envelopes, foreign payloads on the topic). Default
    False preserves FAIL-SILENT ``from_json`` semantics (malformed
    rows surface as all-null images). True appends a
    ``_corrupt_record`` column — the raw value for any non-tombstone
    record that did not produce a changelog op, NULL for good rows —
    the same contract as ``read_csv(lenient=True)``, so
    ``sources.batch.quarantine_split`` routes them to a quarantine
    sink while the pipeline keeps running (works on streaming
    DataFrames too; split inside ``foreachBatch`` to write both sinks
    from one pass).
    """
    schema = debezium_envelope_schema(row_schema)
    meta_names = {"op", "ts_ms", "txId", "lsn"} | ({event_time_col} if event_time_col else set())
    row_fields = (
        T.StructType.fromDDL(row_schema) if isinstance(row_schema, str) else row_schema
    )
    clash = sorted(meta_names & {f.name for f in row_fields.fields})
    if clash:
        raise ValueError(
            f"row_schema column(s) {clash} collide with the decoder's envelope "
            "metadata output; rename them in the row schema (or pass a "
            "different event_time_col)"
        )
    raw = F.col(value_col).cast("string")
    if drop_tombstones:
        df = df.filter(raw.isNotNull())
    if schema_include is None:
        env_str = F.when(
            F.get_json_object(raw, "$.payload.op").isNotNull(),
            F.get_json_object(raw, "$.payload"),
        ).otherwise(raw)
    elif schema_include:
        env_str = F.get_json_object(raw, "$.payload")
    else:
        env_str = raw
    parsed = df.withColumn("__env", F.from_json(env_str, schema))
    image = F.when(F.col("__env.op") == "d", F.col("__env.before")).otherwise(F.col("__env.after"))
    out = parsed.withColumn("__img", image).select(
        "__img.*",
        F.col("__env.op").alias("op"),
        F.col("__env.ts_ms").alias("ts_ms"),
        F.col("__env.source.txId").alias("txId"),
        F.col("__env.source.lsn").alias("lsn"),
        *(
            [F.timestamp_millis(F.col("__env.source.ts_ms")).alias(event_time_col)]
            if event_time_col
            else []
        ),
        *(
            # a real Debezium envelope always carries an op; a
            # non-tombstone value that decoded to no op is undecodable
            [
                F.when(
                    F.col("__env.op").isNull() & raw.isNotNull(), raw
                ).alias("_corrupt_record")
            ]
            if lenient
            else []
        ),
    )
    return out


#: scenario-5 message envelope (flink-applications/05-kafka-logical-msg-flink.json:4)
LOGICAL_MSG_SCHEMA = T.StructType([
    T.StructField("op", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("source", SOURCE_SCHEMA),
    T.StructField(
        "message",
        T.StructType([
            T.StructField("prefix", T.StringType()),
            T.StructField("content", T.StringType()),
        ]),
    ),
])


def decode_logical_message(
    df: DataFrame,
    value_col: str = "value",
    fields: dict[str, tuple[str, str | None]] | None = None,
    lenient: bool = False,
    drop_tombstones: bool | None = None,
) -> DataFrame:
    """Scenario-5 pipeline: parse the logical-decoding envelope, base64-
    decode ``message.content`` and JSON-path-extract the payload fields
    (reference statement flink-applications/05-kafka-logical-msg-flink.json:14,
    README.md:404-411).

    ``fields`` maps output column -> (json path, cast type or None); default
    mirrors the reference's order-document extraction.

    ``lenient``: same dead-letter contract as :func:`decode_debezium` —
    appends ``_corrupt_record`` carrying the raw value for records whose
    envelope yielded no ``message.content`` OR whose content did not
    base64-decode to parseable JSON (broken JSON, wrong topic, truncated
    payload — ``unbase64`` decodes garbage best-effort without erroring,
    so the decoded document itself is validated; review r7); route with
    ``quarantine_split``.

    ``drop_tombstones``: compacted-topic null values carry no document.
    True filters them out; False keeps them — null values decode to
    all-null rows, or are quarantined via ``_corrupt_record`` under
    ``lenient``. PASS IT EXPLICITLY: the default flipped in r7 and
    back in r8, so leaving it unset now behaves as False but emits a
    plan-time ``UserWarning`` naming the choice being made (ADVICE r9
    — a caller written against either historical default finds out
    immediately instead of via silently-kept or silently-dropped
    tombstone rows).
    """
    if drop_tombstones is None:
        import warnings

        warnings.warn(
            "decode_logical_message: drop_tombstones not specified; "
            "defaulting to False (tombstones decode to all-null rows, or "
            "_corrupt_record under lenient). This default has changed "
            "across releases — pass drop_tombstones explicitly.",
            UserWarning,
            stacklevel=2,
        )
        drop_tombstones = False
    fields = fields or {
        "order_id": ("$.order_id", "int"),
        "client_name": ("$.client_name", None),
        "table_name": ("$.table_name", None),
        "pizzas": ("$.pizzas", None),
    }
    raw = F.col(value_col).cast("string")
    if drop_tombstones:
        df = df.filter(raw.isNotNull())
    parsed = df.withColumn("__env", F.from_json(raw, LOGICAL_MSG_SCHEMA))
    doc = from_base64_str(F.col("__env.message.content"))
    # a good record's content decodes to parseable JSON: get_json_object
    # of the root returns non-null exactly then
    undecodable = F.col("__env.message.content").isNull() | F.get_json_object(
        doc, "$"
    ).isNull()
    return parsed.select(
        F.col("__env.op").alias("op"),
        F.col("__env.ts_ms").alias("ts_ms"),
        F.col("__env.source.txId").alias("txId"),
        *[json_value(doc, path, cast).alias(name) for name, (path, cast) in fields.items()],
        *(
            [F.when(undecodable & raw.isNotNull(), raw).alias("_corrupt_record")]
            if lenient
            else []
        ),
    )
