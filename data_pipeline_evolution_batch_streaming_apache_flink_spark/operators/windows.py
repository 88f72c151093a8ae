"""Flink-style window table-valued functions beyond TUMBLE.

The reference's surface stops at tumbling windows (SURVEY §2.8 —
"No sliding/session windows"); these are the standard Flink TVFs a
user migrating real pipelines expects next:

- :func:`hop_window` — HOP (sliding) windows. Native Spark
  ``window(ts, size, slide)``: each event lands in size/slide
  overlapping windows, JVM-side, no explode.
- :func:`cumulate_window` — CUMULATE windows (early-firing partials of
  a tumble: [start, start+step), [start, start+2*step), … up to
  size). Spark has no built-in; composed as a codegen'd
  ``explode(sequence(...))`` over epoch-millis arithmetic — map-side
  only, the aggregation after it is the usual one counted shuffle.

Streaming: :func:`hop_window` aggregations are append-mode-native
(Spark's sliding ``window()`` is watermark-tracked). A
:func:`cumulate_window` aggregation groups by DERIVED epoch columns
Spark cannot track as event time, so stream it in update mode into a
keyed upsert sink (the A6 pattern, ``sinks.ParquetUpsertSink``) —
partials then update in place exactly like Flink's early-fire output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _interval_ms(spec: str | int) -> int:
    if isinstance(spec, int):
        return spec
    qty, unit = spec.split()
    return int(qty) * _UNITS_MS[unit.lower()]


def hop_window(
    df: DataFrame,
    ts_col: str,
    size: str = "1 hour",
    slide: str = "15 minutes",
    start_out: str = "window_start",
    end_out: str = "window_end",
) -> DataFrame:
    """Assign each row to its HOP (sliding) windows via Spark's native
    ``window(ts, size, slide)`` — one output row per covering window
    (size/slide of them), generated JVM-side."""
    w = F.window(F.col(ts_col).cast("timestamp"), size, slide)
    return (
        df.withColumn("__w", w)
        .withColumn(start_out, F.col("__w.start"))
        .withColumn(end_out, F.col("__w.end"))
        .drop("__w")
    )


def cumulate_window(
    df: DataFrame,
    ts_col: str,
    step: str = "15 minutes",
    size: str = "1 hour",
    start_out: str = "window_start",
    end_out: str = "window_end",
) -> DataFrame:
    """Assign each row to its CUMULATE windows (Flink's CUMULATE TVF):
    within each ``size`` bucket, the growing prefixes ``[start,
    start + k*step)`` for every k whose window end lies strictly after
    the event (events live in ``[start, end)``).

    An event at offset d into its bucket lands in windows
    ``k = floor(d/step)+1 … size/step`` — exact epoch-millis integer
    arithmetic, reproducible in any engine. Map-side explode only;
    ``size`` must be a multiple of ``step``.
    """
    step_ms = _interval_ms(step)
    size_ms = _interval_ms(size)
    if step_ms <= 0 or size_ms % step_ms != 0:
        raise ValueError(
            f"size ({size!r}) must be a positive multiple of step ({step!r})"
        )
    n = size_ms // step_ms
    epoch = F.unix_millis(F.col(ts_col).cast("timestamp"))
    base = F.floor(epoch / size_ms).cast("long") * size_ms
    k_min = (F.floor((epoch - base) / step_ms).cast("long") + 1)
    return (
        df.withColumn("__base", base)
        .withColumn("__k", F.explode(F.sequence(k_min, F.lit(n).cast("long"))))
        .withColumn(start_out, F.timestamp_millis(F.col("__base")))
        .withColumn(end_out, F.timestamp_millis(F.col("__base") + F.col("__k") * step_ms))
        .drop("__base", "__k")
    )
