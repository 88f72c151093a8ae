"""Changelog / upsert-stream semantics (SURVEY §2.8 W5, §2.1 S7).

The reference's single sink everywhere is ``upsert-kafka`` keyed by a
primary key (``flink-applications/01-basic-jdbc.json:26``): a keyed
changelog materialized as latest-row-per-key, with deletes as tombstones.
Spark has no retraction machinery, so the engine compacts explicitly:
``latest_per_key`` is the batch/foreachBatch building block the upsert
sink uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: str | list[str],
    order_by: str | list[str | Column],
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("d", "delete", "D"),
) -> DataFrame:
    """Compact a changelog to its current state: latest row per key.

    ``order_by`` columns define event order (e.g. event ts, LSN, kafka
    offset). If ``op_col`` is given, keys whose *latest* op is a delete are
    dropped (tombstone application, reference
    flink-applications/04-flink-cdc-outbox.json + REPLICA IDENTITY FULL,
    scripts/load_dims.sql:59-63).

    Implemented as ``max_by(struct(payload), struct(order))`` — a hash
    aggregation with map-side partial combine, so at 100 TB the shuffle
    carries one pre-combined row per key per map task, not the raw
    changelog. (A window/row_number formulation would shuffle every row.)
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    payload = [c for c in df.columns if c not in keys]
    ord_struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    compacted = (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("__latest"))
        .select(*keys, *[F.col(f"__latest.{c}").alias(c) for c in payload])
    )
    if op_col is not None:
        compacted = compacted.filter(~F.col(op_col).isin(*delete_ops))
    return compacted
