"""Batch parquet source with type normalization.

Spark (through 4.x) refuses parquet INT64 TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL) that other engines (DuckDB, pyarrow) read fine.
``read_parquet`` reads them as raw nanos (legacy conf) and converts to
microsecond timestamps, so downstream plans see ordinary TIMESTAMP
columns. Detection uses one driver-side footer read (pyarrow), which is
O(schema) — independent of data volume, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nano_timestamp_cols(path: str) -> list[str]:
    import pyarrow as pa
    import pyarrow.dataset as ds

    schema = ds.dataset(path, format="parquet").schema
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns,
    converting them to micros (truncation — same as DuckDB's ns->us)."""
    try:
        nano_cols = _nano_timestamp_cols(path)
    except Exception:
        nano_cols = []
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    lenient: bool = False,
) -> DataFrame:
    """JSON-lines corpus reader — the interchange format most raw text
    dumps arrive in. With ``schema`` (DDL string) the scan skips
    Spark's inference pass (one full extra read of the data — never
    acceptable at 100 TB) and malformed lines FAIL the job by default;
    ``lenient=True`` switches to PERMISSIVE with a ``_corrupt_record``
    column so bad lines can be quarantined instead. Compressed inputs
    (.gz/.zst per-file) decode transparently; gzip is not splittable,
    so shard corpora into many files upstream.
    """
    reader = spark.read
    if schema is not None:
        mode = "PERMISSIVE" if lenient else "FAILFAST"
        if lenient:
            schema = schema + ", _corrupt_record string"
        reader = reader.schema(schema).option("mode", mode)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partitions: int | None = None,
) -> None:
    """JSON-lines writer for corpus interchange: one object per line,
    optionally gzip-compressed, ``partitions`` output shards (coalesce
    when shrinking — no shuffle)."""
    if partitions is not None:
        df = df.coalesce(partitions) if partitions <= (df.rdd.getNumPartitions()) else df.repartition(partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
    lenient: bool = False,
) -> DataFrame:
    """CSV corpus reader with the same contract as :func:`read_jsonl`:
    schema is REQUIRED (inference is a full extra pass over the data —
    never acceptable at 100 TB), malformed rows FAIL the job by default,
    and ``lenient=True`` switches to PERMISSIVE with a
    ``_corrupt_record`` column for quarantine routing. Quoted fields,
    embedded delimiters/newlines (``multiLine`` stays off — it makes
    files unsplittable; pre-clean instead), and .gz inputs decode
    transparently."""
    mode = "PERMISSIVE" if lenient else "FAILFAST"
    if lenient:
        schema = schema + ", _corrupt_record string"
    return (
        spark.read.schema(schema)
        .option("header", "true" if header else "false")
        .option("sep", delimiter)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a lenient read into (clean, quarantined) — clean rows with
    the corrupt column dropped, bad rows as their raw text for repair.
    Works for read_csv / read_jsonl lenient modes and the streaming
    decoders' dead-letter channel (``decode_debezium(lenient=True)``).
    Streaming DataFrames are split lazily (no localCheckpoint — call
    inside ``foreachBatch`` to write both halves from one scan)."""
    from pyspark.sql import functions as F

    if "_corrupt_record" not in df.columns:
        raise ValueError("quarantine_split needs a lenient read (PERMISSIVE with _corrupt_record)")
    if not df.isStreaming:
        df = df.localCheckpoint(eager=False)  # both halves share one scan
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    return clean, bad
