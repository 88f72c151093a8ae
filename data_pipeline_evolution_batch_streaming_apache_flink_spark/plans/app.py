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
