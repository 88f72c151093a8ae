"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def explode_noinfer(arr: Column | str, min_size: int = 1) -> Column:
    """``explode()`` that keeps Catalyst from re-evaluating an expensive
    array expression serially below :func:`fan_out`.

    Exploding a bare attribute lets InferFiltersFromGenerate add
    ``size(arr) > 0`` above the Generate; alias substitution then pushes
    that conjunct through fan_out's round-robin exchange into the (often
    1-partition) parquet scan stage, so the ENTIRE array-building
    expression (shingles, tokens, ...) runs a second time — serially
    (measured 7x on sf0.1 documents). The rule only infers for
    bare-attribute generator children, so a non-foldable CASE WHEN
    wrapper keeps exactly one parallel evaluation and no junk filter.

    ``min_size`` doubles as a per-row length gate for free:
    ``explode(NULL)`` emits no rows, and expressing the gate INSIDE the
    generator (instead of ``.filter(size(arr) >= k)``) is what keeps it
    from being alias-substituted below the exchange too.
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.explode(F.when(F.size(c) >= F.lit(max(int(min_size), 1)), c))


def cap_buckets(df: DataFrame, bucket_cols: tuple[str, ...], max_bucket: int | None) -> DataFrame:
    """Drop rows belonging to buckets larger than ``max_bucket`` BEFORE
    any collect_list aggregation — the adversarial-bucket guard shared by
    the LSH candidate generators. The window count runs while bucket
    members are still individual (spillable) rows, and its hash
    partitioning on ``bucket_cols`` satisfies the downstream groupBy's
    distribution requirement, so the guard costs an in-partition sort but
    never a second exchange (plan-pinned in tests/test_scale.py).
    No-op when ``max_bucket`` is None."""
    if max_bucket is None:
        return df
    w = Window.partitionBy(*bucket_cols)
    return (
        df.withColumn("__bn", F.count("*").over(w))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least cluster-default parallelism for compute-heavy
    per-row stages (hashing, signature folds, pair scoring).

    Small parquet inputs arrive as one partition per row group, which
    serializes expensive projections onto one core. The repartition is a
    narrow-data shuffle (ids + payload column) that unlocks N-way
    compute — worth it whenever downstream work is >> shuffle cost. At
    real scale (partitions >= cores) this is a no-op, so operators can
    call it unconditionally.

    CALLER CONTRACT (r13): pass a scan-shaped or checkpointed frame.
    The partition probe below is ``DataFrame.rdd``, which on a
    shuffle-CONTAINING frame executes every upstream query stage under
    AQE just to learn the post-coalesce width — one full extra
    execution of the subtree (measured: a 3M-row aggregate ran twice).
    Materialize such frames first (eager ``localCheckpoint``), which
    also gives the probe the true width for free.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def is_exact_integral(dt) -> bool:
    """True for types whose ``cast('long')`` can neither truncate nor
    overflow: byte/short/int/long, plus DecimalType with scale 0 AND
    precision <= 18 (an exact int64-representable integral — ADVICE
    r10: rejecting decimal(p, 0) token counts was a false positive).
    decimal(p > 18, 0) stays rejected (review r11): its values can
    exceed int64, where cast('long') crashes under ANSI or yields a
    silent NULL without it — the same silent-wrongness class the guard
    exists to prevent. Fractional decimals and floats stay rejected:
    their per-row truncation before an exact prefix/grouped sum
    silently changes the result."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return True
    return isinstance(dt, T.DecimalType) and dt.scale == 0 and dt.precision <= 18


def unpersist_local_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind an EAGER ``localCheckpoint``
    DataFrame that will never be read again — the iterative-operator
    storage discipline (ADVICE r11, first applied to ``kcenter_select``
    and worth ~1.5x at 256k rows; the graph family's per-round
    checkpoints leak the same way). ``DataFrame.unpersist()`` cannot do
    this — a local checkpoint persists its RDD outside the cache
    manager — so this reaches the ``LogicalRDD`` plan node's RDD and
    unpersists it directly. Best-effort: on Spark Connect (no
    ``_jdf``) or an unexpected plan shape it silently leaves the
    blocks to the ContextCleaner, the pre-fix behavior. Only call on a
    frame whose every consumer has ALREADY materialized: a local
    checkpoint cannot be recomputed once its blocks are dropped."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass
