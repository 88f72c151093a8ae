"""Deterministic users/sessions data generator (SURVEY §2.1 S9).

The reference feeds its secondary clickstream pipeline with a
Python/Faker generator (reference ``scripts/datagen.py:21-96``): a bulk
backfill (10k-row batches) plus a live trickle (~10 rows/s). This is the
engine-side equivalent, built distributed-first:

- :func:`users` / :func:`sessions` — ``spark.range``-based generation:
  partitioned on the cluster, no driver-side row building, fully
  deterministic (hash-derived attributes, no RNG state), so any two runs
  — and any test oracle — agree exactly.
- :func:`live_sessions_stream` — the live mode as a ``rate`` source
  mapped through the same row-synthesis expressions, matching the
  reference's ~rows/s trickle semantics.

The schemas mirror ``scripts/datagen.py:39,64``: ``users(id, username)``
and ``sessions(user_id, session_time, ip_address, browser)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BROWSERS = ("chrome", "firefox", "safari", "edge", "opera")


def _browser(col: F.Column) -> F.Column:
    arr = F.array(*[F.lit(b) for b in BROWSERS])
    return arr[F.pmod(F.xxhash64(col, F.lit("browser")), F.lit(len(BROWSERS))).cast("int")]


def _ip(col: F.Column) -> F.Column:
    h = F.xxhash64(col, F.lit("ip"))
    return F.concat_ws(
        ".",
        F.pmod(h, F.lit(223)).cast("int") + F.lit(1),
        F.pmod(F.shiftright(h, 8), F.lit(256)).cast("int"),
        F.pmod(F.shiftright(h, 16), F.lit(256)).cast("int"),
        F.pmod(F.shiftright(h, 24), F.lit(254)).cast("int") + F.lit(1),
    )


def users(spark: SparkSession, n: int = 1_000, partitions: int | None = None) -> DataFrame:
    """``users(id, username)`` — reference default 1,000 distinct users
    (``scripts/datagen.py:49``)."""
    rng = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    return rng.select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("user_"), F.format_string("%06d", F.col("id"))).alias("username"),
    )


def sessions(
    spark: SparkSession,
    n: int = 10_000_000,
    n_users: int = 1_000,
    start: str = "2024-01-01 00:00:00",
    span_hours: int = 24 * 30,
    partitions: int | None = None,
) -> DataFrame:
    """``sessions(user_id, session_time, ip_address, browser)`` backfill —
    reference default 10M rows (``scripts/datagen.py:48``). Rows spread
    deterministically over ``span_hours``; generation is embarrassingly
    parallel (one ``spark.range`` partition per task, no shuffle)."""
    rng = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    sid = F.col("id")
    ts = F.lit(start).cast("timestamp") + F.make_interval(
        secs=F.pmod(F.xxhash64(sid, F.lit("t")), F.lit(span_hours * 3600)).cast("double")
    )
    return rng.select(
        F.pmod(F.xxhash64(sid, F.lit("u")), F.lit(n_users)).cast("int").alias("user_id"),
        ts.alias("session_time"),
        _ip(sid).alias("ip_address"),
        _browser(sid).alias("browser"),
    )


def live_sessions_stream(
    spark: SparkSession,
    rows_per_second: int = 10,
    n_users: int = 1_000,
) -> DataFrame:
    """Live trickle (reference ``scripts/datagen.py:76-96``, ~10 rows/s)
    as a Structured Streaming ``rate`` source with the same deterministic
    row synthesis — feed it to the hourly-count pipeline or any sink."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    sid = F.col("value")
    return rate.select(
        F.pmod(F.xxhash64(sid, F.lit("u")), F.lit(n_users)).cast("int").alias("user_id"),
        F.col("timestamp").alias("session_time"),
        _ip(sid).alias("ip_address"),
        _browser(sid).alias("browser"),
    )
