"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least cluster-default parallelism for compute-heavy
    per-row stages (hashing, signature folds, pair scoring).

    Small parquet inputs arrive as one partition per row group, which
    serializes expensive projections onto one core. The repartition is a
    narrow-data shuffle (ids + payload column) that unlocks N-way
    compute — worth it whenever downstream work is >> shuffle cost. At
    real scale (partitions >= cores) this is a no-op, so operators can
    call it unconditionally.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
