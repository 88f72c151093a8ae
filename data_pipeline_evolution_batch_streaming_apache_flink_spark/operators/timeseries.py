"""Time-series repair operators.

``interpolate_linear`` fills null gaps in a per-key series by linear
interpolation between the nearest non-null neighbors — the standard
sensor/metric repair step before feature extraction (the gap-fill twin
of the engine's ``hourly_spine_gapfill``, which fills MISSING rows;
this fills NULL values on existing rows).

Scale shape: one shuffle on the key; the backward- and forward-looking
neighbor windows share the same in-partition sort (Spark reuses the
sort — no extra exchange). No Python, no self-join: neighbor lookup is
``last(..., ignorenulls)`` / ``first(..., ignorenulls)`` over offset
row frames.

Edge semantics (pinned by tests, mirrored by the SQL oracle): a null
with neighbors on both sides interpolates; a null before the first
observation takes the next value (back-fill); a null after the last
observation takes the previous value (forward-fill); an all-null key
stays null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    out_col: str | None = None,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fill null ``val_col`` by linear interpolation along ``ts_col``
    (a numeric/epoch column) within each key. See module docstring for
    edge rules."""
    out_col = out_col or f"{val_col}_filled"
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    obs = F.when(
        F.col(val_col).isNotNull(),
        F.struct(F.col(ts_col).cast("double").alias("t"), F.col(val_col).cast("double").alias("v")),
    )
    prev = F.last(obs, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, -1))
    nxt = F.first(obs, ignorenulls=True).over(w.rowsBetween(1, Window.unboundedFollowing))

    t = F.col(ts_col).cast("double")
    interp: Column = prev["v"] + (nxt["v"] - prev["v"]) * (t - prev["t"]) / (nxt["t"] - prev["t"])
    filled = (
        F.when(F.col(val_col).isNotNull(), F.col(val_col).cast("double"))
        .when(prev.isNull() & nxt.isNull(), F.lit(None).cast("double"))
        .when(prev.isNull(), nxt["v"])
        .when(nxt.isNull(), prev["v"])
        # equal-timestamp neighbors (ts ties around the gap) would make
        # the interpolation 0/0 — take the earlier observation
        .when(nxt["t"] == prev["t"], prev["v"])
        .otherwise(interp)
    )
    return df.withColumn(out_col, filled)
