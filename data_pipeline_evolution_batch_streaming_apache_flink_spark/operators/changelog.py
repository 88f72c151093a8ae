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

    A NULL ``op_col`` value is NOT a delete — rows whose latest op is
    NULL (e.g. snapshot/backfill rows mixed into a CDC feed) are KEPT as
    upserts (review r7: the bare ``~isin`` filter evaluated to NULL and
    silently dropped them). Ties on ``order_by``: ``max_by`` picks an
    arbitrary payload among equal ordering structs — make the ordering
    total (append an LSN / kafka offset / epoch column, as the in-repo
    sinks do) when same-ordering duplicates are possible; the compaction
    is only as deterministic as its ordering.
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
        compacted = compacted.filter(
            F.col(op_col).isNull() | ~F.col(op_col).isin(*delete_ops)
        )
    return compacted


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    compare: list[str] | None = None,
    include_before: bool = False,
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

    ``include_before`` additionally emits every shared column's OLD value
    as ``<col>_before`` (NULL for inserts) — the retraction half a
    downstream incremental-aggregation consumer needs
    (:func:`incremental_sum_count`), mirroring a Flink retract stream /
    Debezium ``before`` block.

    One full-outer sort-merge join on the key — both sides shuffle once
    on the same key, nothing else moves. Keys must be unique per
    snapshot (it is a state diff, not a multiset diff). Key matching is
    NULL-SAFE (review r7): a NULL-keyed row present in both snapshots
    classifies as U/unchanged like any other key, instead of splitting
    into a spurious D + I pair whose replay order is nondeterministic.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    shared = [c for c in old.columns if c in set(new.columns) and c not in keys]
    compare = shared if compare is None else list(compare)
    missing = [c for c in compare if c not in shared]
    if missing:
        raise ValueError(f"compare columns not in both snapshots: {missing}")

    # presence flags: a constant marker column per side says which side a
    # row came from. The join condition is eqNullSafe per key so NULL
    # keys match each other (a USING-columns join would never match
    # them); the output key is the coalesce of the two sides.
    o = old.select(*[F.col(c).alias(f"__ok_{c}") for c in keys],
                   F.lit(1).alias("__in_o"),
                   *[F.col(c).alias(f"__o_{c}") for c in shared])
    n = new.select(*[F.col(c).alias(f"__nk_{c}") for c in keys],
                   F.lit(1).alias("__in_n"),
                   *[F.col(c).alias(f"__n_{c}") for c in shared])
    cond = F.lit(True)
    for c in keys:
        cond = cond & F.col(f"__ok_{c}").eqNullSafe(F.col(f"__nk_{c}"))
    joined = o.join(n, cond, "full_outer").select(
        "*",
        *[F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).alias(c) for c in keys],
    )
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
    before_cols = (
        [F.col(f"__o_{c}").alias(f"{c}_before") for c in shared] if include_before else []
    )
    return (
        joined.withColumn("__op", op)
        .filter(F.col("__op").isNotNull())
        .select(*keys, *out_cols, *before_cols, F.col("__op").alias("op"))
    )


def incremental_sum_count(
    prev: DataFrame,
    diff: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    sum_col: str,
    count_col: str,
) -> DataFrame:
    """Maintain ``groupBy(group_cols).agg(sum(value), count(*))`` from a
    changelog instead of a full rescan: yesterday's 100 TB aggregate plus
    today's (small) :func:`snapshot_diff` output — computed with
    ``include_before=True`` — yields today's aggregate exactly.

    SUM and COUNT are self-maintainable under insert/update/delete:
    inserts and update-after images contribute ``(+value, +1)`` to their
    (new) group, deletes and update-before images contribute
    ``(-value, -1)`` to their (old) group — so a row that MOVES between
    groups settles both sides. MIN/MAX are not maintainable under
    deletes without re-scanning the affected group; they are
    deliberately absent.

    Groups whose maintained count reaches 0 are dropped (the group
    disappeared). Cost: one aggregation of the diff (proportional to the
    CHANGE volume, not the table) + one outer join against the previous
    aggregate on the group key. ``value_col`` must be exact-additive for
    cross-engine reproducibility — integers/cents, not raw doubles
    (sums of doubles are order-dependent).

    Equality with the full recompute over the new snapshot is the
    oracle-checked ``incremental_agg`` suite query and
    ``tests/test_snapshot_diff.py``.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    plus = diff.filter(F.col("op").isin("I", "U")).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.lit(1).cast("long").alias("__n"),
    )
    minus = diff.filter(F.col("op").isin("D", "U")).select(
        *[
            F.when(F.col("op") == "U", F.col(f"{c}_before")).otherwise(F.col(c)).alias(c)
            for c in group_cols
        ],
        (
            -F.when(F.col("op") == "U", F.col(f"{value_col}_before")).otherwise(F.col(value_col))
        ).alias("__v"),
        F.lit(-1).cast("long").alias("__n"),
    )
    delta = (
        plus.unionByName(minus)
        .groupBy(*group_cols)
        .agg(F.sum("__v").alias("__dv"), F.sum("__n").alias("__dn"))
    )
    merged = prev.join(delta, group_cols, "full_outer")
    zero = F.lit(0).cast("long")
    return (
        merged.select(
            *group_cols,
            (F.coalesce(sum_col, zero) + F.coalesce("__dv", zero)).alias(sum_col),
            (F.coalesce(count_col, zero) + F.coalesce("__dn", zero)).alias(count_col),
        )
        .filter(F.col(count_col) > 0)
    )
