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
