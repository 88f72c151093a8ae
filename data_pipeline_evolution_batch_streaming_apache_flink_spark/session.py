"""SparkSession construction and per-session tuning.

Local tests run on ``local[N]`` but every knob here is chosen for the
multi-executor case too: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), shuffle partitions sized to cores, Arrow enabled
for the Pandas-UDF slow path, UTC session timezone so timestamp values
hash identically against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settings that are safe (and wanted) at any scale. Cluster-size-dependent
# knobs (shuffle partitions, memory) are parameterized below.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # generous broadcast threshold: every dim table in the reference's
    # star schema is tiny relative to the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "dpe-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in _BASE_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_streaming(
    spark: SparkSession,
    multiple_watermark_policy: str = "min",
    state_store_provider: str | None = None,
) -> SparkSession:
    """Streaming-session knobs for the reference's multi-input semantics
    (SURVEY §2.8 W3).

    ``multiple_watermark_policy``: Spark's global watermark across several
    watermarked inputs is the ``min`` by default — the same idle-source
    stall Flink documents (reference README.md:526-541). ``"max"`` is the
    engine-level analogue of Flink's ``table.exec.source.idle-timeout``
    mitigation: an idle input no longer holds emission back (at the cost
    of treating its late rows as late data). The heartbeat-row pattern
    (reference README.md:540-544) works unchanged with ``"min"``.

    ``state_store_provider``: at cluster scale pass the RocksDB provider
    class to keep as-of/txid state off-heap and incrementally
    checkpointed; the default HDFS-backed store is fine for tests.
    """
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", multiple_watermark_policy)
    if state_store_provider is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", state_store_provider)
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Runtime-settable conf for deterministic comparison against an
    external SQL oracle (DuckDB): UTC timestamps, AQE on, Arrow on.

    Called at the top of every ``queries()`` callable because the driver
    owns the session and we only get to adjust runtime-mutable conf.
    """
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
    ):
        try:
            spark.conf.set(k, _BASE_CONF.get(k, "true"))
        except Exception:
            pass  # non-runtime-settable in this build: keep going
    return spark
