"""Application-spec runner — the engine's query lifecycle (SURVEY §3.1).

The reference packages every scenario as a JSON spec: ``sources[]`` DDL,
``sinks[]`` DDL, and one INSERT-SELECT ``statement``
(e.g. reference ``flink-applications/01-basic-jdbc.json:2-30``). Here a spec
is a plain Python object: sources become registered temp views, the
statement runs through ``spark.sql`` (Catalyst: parse -> analyze ->
optimize -> physical plan), and the sink writer handles materialization.
Batch mode only here; streaming specs go through ``streaming``/``sinks``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_evolution_batch_streaming_apache_flink_spark.tables import TableSpec


@dataclass
class ApplicationSpec:
    """{sources, sinks, statement} — mirror of the reference's app JSON."""

    sources: list[TableSpec] = field(default_factory=list)
    statement: str = ""
    sink: TableSpec | None = None


def run_application(
    spark: SparkSession,
    spec: ApplicationSpec,
    dataframes: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Register sources, run the statement, return the result DataFrame.

    ``dataframes`` lets callers inject pre-built DataFrames (tests, CDC
    decode results) instead of file-backed specs.
    """
    dataframes = dataframes or {}
    for src in spec.sources:
        if src.name in dataframes:
            src.register(spark, src.apply(dataframes[src.name], streaming=False))
        else:
            src.register(spark)
    out = spark.sql(spec.statement)
    if spec.sink is not None and spec.sink.path is not None:
        out.write.format(spec.sink.fmt).mode("overwrite").save(spec.sink.path)
    return out


def run_streaming_application(
    spark: SparkSession,
    spec: ApplicationSpec,
    dataframes: dict[str, DataFrame],
    sink_keys: str | list[str],
    sink_order_by: str | list[str],
    op_col: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """The streaming lifecycle (SURVEY §3.2 — reference scenarios 3-5):
    the same ``{sources, statement, sink}`` spec, but sources are
    streaming DataFrames (Kafka/file/CDC-decoded), the statement runs
    through Catalyst's IncrementalExecution per micro-batch, and the sink
    is the keyed upsert materialization (reference upsert-kafka, S7).

    Streaming sources register as temp views (watermarks and computed
    columns applied from their TableSpec); static lookup tables may be
    mixed in — ``spark.sql`` over a stream view and a static view is the
    stream-static lookup join (J4). Returns ``(sink, query)``; await the
    query, then read ``sink.current_state(spark)``.
    """
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sinks import ParquetUpsertSink

    import os
    import uuid

    for src in spec.sources:
        if src.name in dataframes:
            df = dataframes[src.name]
            src.register(spark, src.apply(df, streaming=df.isStreaming))
        else:
            src.register(spark)
    out = spark.sql(spec.statement)
    base = checkpoint_dir or os.path.join("/tmp", f"dpe_app_{uuid.uuid4().hex}")
    sink = ParquetUpsertSink(
        (spec.sink.path if spec.sink and spec.sink.path else os.path.join(base, "data")),
        sink_keys,
        sink_order_by,
        op_col=op_col,
    )
    writer = out.writeStream.foreachBatch(sink.foreach_batch).option(
        "checkpointLocation", os.path.join(base, "ckpt")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return sink, query
