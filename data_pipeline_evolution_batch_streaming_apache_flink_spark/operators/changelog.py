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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Derive a changelog from two table snapshots: the inverse of
    :func:`latest_per_key`. Emits one row per changed key with
    ``op`` = ``'I'`` (key only in ``new``), ``'U'`` (key in both, any
    compared column differs), ``'D'`` (key only in ``old``); unchanged
    keys are dropped. Non-key output columns carry the NEW values for
    I/U and the OLD values for D (the delete before-image, mirroring
    REPLICA IDENTITY FULL — reference scripts/load_dims.sql:59-63).

    This is snapshot-based CDC for sources with no WAL access: diff
    yesterday's ingest against today's and feed the result to the same
    upsert sinks a live Debezium stream feeds.

    ``compare`` defaults to all shared non-key columns. Column equality
    is NULL-safe (``IS DISTINCT FROM``) per column — no row-hash, so an
    external engine classifies identically (and at scale Spark prunes
    the unread columns instead of hashing whole rows).

    One full-outer sort-merge join on the key — both sides shuffle once
    on the same key, nothing else moves. Keys must be unique per
    snapshot (it is a state diff, not a multiset diff).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    shared = [c for c in old.columns if c in set(new.columns) and c not in keys]
    compare = shared if compare is None else list(compare)
    missing = [c for c in compare if c not in shared]
    if missing:
        raise ValueError(f"compare columns not in both snapshots: {missing}")

    # presence flags: full_outer coalesces the key columns, so detect
    # which side a row came from via a constant marker column per side.
    o = old.select(*keys, F.lit(1).alias("__in_o"),
                   *[F.col(c).alias(f"__o_{c}") for c in shared])
    n = new.select(*keys, F.lit(1).alias("__in_n"),
                   *[F.col(c).alias(f"__n_{c}") for c in shared])
    joined = o.join(n, keys, "full_outer")
    in_old = F.col("__in_o").isNotNull()
    in_new = F.col("__in_n").isNotNull()

    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))

    op = (
        F.when(in_new & ~in_old, F.lit("I"))
        .when(in_old & ~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_cols = [
        F.when(F.col("__op") == "D", F.col(f"__o_{c}")).otherwise(F.col(f"__n_{c}")).alias(c)
        for c in shared
    ]
    return (
        joined.withColumn("__op", op)
        .filter(F.col("__op").isNotNull())
        .select(*keys, *out_cols, F.col("__op").alias("op"))
    )
