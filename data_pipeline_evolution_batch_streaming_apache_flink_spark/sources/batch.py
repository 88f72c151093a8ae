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
