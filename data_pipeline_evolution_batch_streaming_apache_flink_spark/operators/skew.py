"""Skew mitigation utilities (SURVEY §4: "skewed keys → salting or AQE").

AQE's skew-join splitting handles most hot-key joins at runtime. Two
cases it cannot fix, both solved here by deterministic salting:

- :func:`two_phase_collect` — a non-algebraic aggregation
  (``collect_list``/``collect_set``) on a hot key lands every row of
  that key in ONE task regardless of AQE (a group cannot be split).
  Salting the group key fans the collection over ``n_salt`` tasks and a
  second, tiny aggregation flattens the per-salt partials.
- :func:`salted_join` — a shuffle join where one side's hot keys
  overwhelm single tasks and stats mislead AQE (e.g. freshly-derived
  intermediates with no statistics). The small side replicates
  ``n_salt`` ways; the big side salts deterministically by payload hash,
  so the same inputs always produce the same partitioning (replayable —
  no ``rand()``, which would break retried-task determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salt: int) -> Column:
    """Deterministic per-row salt in [0, n_salt) from the payload hash mixed
    with the row's partition-relative position. The position mix matters when
    the payload has few distinct values (e.g. a hot key whose rows all carry
    the same constant): a pure value hash would map them all to one salt and
    defeat the mitigation. ``monotonically_increasing_id`` encodes
    (partition_id, row-offset-within-partition), so a retried task re-derives
    the same ids as long as the upstream partitioning is deterministic — the
    same replayability contract xxhash64 already relies on (no ``rand()``)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.monotonically_increasing_id()),
        F.lit(n_salt),
    ).cast("int")


def two_phase_collect(
    df: DataFrame,
    keys: str | list[str],
    value: str,
    n_salt: int = 16,
    distinct: bool = False,
    sort: bool = True,
) -> DataFrame:
    """``collect_list``/``collect_set`` that survives hot keys.

    Phase 1 groups by (keys, salt) — the hot key's rows split across
    ``n_salt`` tasks; phase 2 groups by keys alone over ``n_salt`` small
    partial arrays and flattens. Output column ``collected``; ``sort``
    makes the array deterministic (multiset semantics preserved).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("__salt", _salt([value], n_salt))
    phase1 = salted.groupBy(*keys, "__salt").agg(F.collect_list(value).alias("__part"))
    merged = phase1.groupBy(*keys).agg(F.flatten(F.collect_list("__part")).alias("collected"))
    col = F.col("collected")
    if distinct:
        col = F.array_distinct(col)
    if sort:
        col = F.array_sort(col)
    return merged.withColumn("collected", col)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe shuffle join: the big side gets a deterministic salt,
    the small side is replicated once per salt value, and the join runs on
    (keys..., salt) — a hot key spreads over ``n_salt`` tasks.

    Row-for-row equivalent to ``big.join(small, on, how)`` for inner and
    left joins (the replication side must be the one whose rows may
    duplicate — hence `small`). Cost: small side × n_salt, the standard
    trade.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in big.columns if c not in keys] or keys
    b = big.withColumn("__salt", _salt(payload, n_salt))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def key_skew_stats(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Join/groupBy key-distribution diagnostics — the numbers that
    decide whether a shuffle needs salting or AQE skew handling BEFORE
    burning a cluster on it: key cardinality, max single-key share,
    and count quantiles.

    One counted shuffle on the key (map-side combine), then one tiny
    aggregate over the per-key counts. Returns a single row:
    ``n_rows, n_keys, max_count, top_share_micro`` (floor of
    max_count/n_rows * 1e6 — exact integer, engine-stable),
    ``p50_count, p99_count`` (interpolated, 6dp). Rule of thumb: a
    top_share_micro above ~1e4 (1%) on a large shuffle is where one
    task starts dominating a 1000-executor stage."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    return counts.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_count"),
        F.floor(F.max("__c") * F.lit(1_000_000) / F.sum("__c")).cast("bigint").alias("top_share_micro"),
        F.round(F.expr("percentile(__c, 0.5)"), 6).alias("p50_count"),
        F.round(F.expr("percentile(__c, 0.99)"), 6).alias("p99_count"),
    )
