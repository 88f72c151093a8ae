"""Exact distributed statistics.

``corr_matrix`` computes Pearson correlations whose results do not
depend on partition layout or engine: float sums are accumulation-
order-dependent (Spark's built-in ``corr`` can drift in the last few
ulps between runs), so values are quantized to scaled integers and
ALL moment sums run exact (decimal(38) on Spark, HUGEINT in the SQL
oracle). The float finish — the textbook
``(n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))`` — starts
from bit-identical integers, applies the identical expression, and
rounds to 6dp.

One aggregate over one scan computes every pairwise moment (p sums +
p(p+1)/2 product sums + the row count); output is one row per pair.
Rows with a null in ANY selected column are dropped (listwise
deletion) so every pair sees the same n.

The ``scale`` trades quantization error (values round to 1/scale)
against headroom: per-product magnitude is ``(scale*|x|max)^2``, and
the exact decimal sums never overflow below 1e38 total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corr_matrix(df: DataFrame, cols: list[str], scale: int = 100) -> DataFrame:
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols}")
    clean = df
    for c in cols:
        cc = F.col(c).cast("double")
        clean = clean.where(cc.isNotNull() & ~F.isnan(cc))
    q = {
        c: F.round(F.col(c).cast("double") * scale).cast("decimal(18,0)") for c in cols
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(q[c]).alias(f"__s_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    for a, b in pairs:
        aggs.append(F.sum(q[a] * q[b]).alias(f"__p_{a}_{b}"))
    one = clean.agg(*aggs)

    entries = []
    for a, b in pairs:
        if a == b:
            continue
        n = F.col("__n").cast("double")
        sx = F.col(f"__s_{a}").cast("double")
        sy = F.col(f"__s_{b}").cast("double")
        sxy = F.col(f"__p_{a}_{b}").cast("double")
        sxx = F.col(f"__p_{a}_{a}").cast("double")
        syy = F.col(f"__p_{b}_{b}").cast("double")
        denom = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = F.when(denom == 0, F.lit(None)).otherwise(
            F.round((n * sxy - sx * sy) / denom, 6)
        )
        entries.append(
            F.struct(
                F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                corr.alias("corr"), F.col("__n").alias("n"),
            )
        )
    return one.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def standardize(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    scale: int = 100,
    clip: float | None = None,
) -> DataFrame:
    """Per-group z-score standardization, layout/engine-exact: the
    feature-normalization step of a training pipeline (per-source
    length/quality normalization before mixing corpora).

    Same determinism policy as :func:`corr_matrix`: values quantize to
    ``v = round(x*scale)`` integers; per group the exact sums
    ``n, s=Σv, p=Σv²`` (decimal(38)) feed the identity

        z = (n·v − s) / sqrt(n·p − s²)

    — pure integers inside one double expression, rounded to 6dp, so
    the score is bit-identical on any partition layout and in the SQL
    oracle. Zero-variance groups emit NULL; null/NaN rows pass through
    with NULL z. ``clip`` winsorizes to ±clip after rounding (the usual
    outlier guard before feeding a model).

    Scale shape: ONE grouped aggregation (map-side partial) broadcast
    back onto the rows — no window over the data, no second shuffle of
    the fact table; ungrouped inputs use a single-row broadcast.
    """
    groups = group_cols or []
    c = F.col(col).cast("double")
    v = F.round(c * scale).cast("decimal(18,0)")
    clean = df.where(c.isNotNull() & ~F.isnan(c))
    stats = clean.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__p"),
    )
    # left join: a group whose values are ALL null/NaN has no stats row —
    # its rows still pass through with NULL z instead of vanishing
    out = (
        df.join(F.broadcast(stats), groups, "left")
        if groups
        else df.crossJoin(F.broadcast(stats))
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    p = F.col("__p").cast("double")
    denom = F.sqrt(n * p - s * s)
    z = F.when(
        c.isNull() | F.isnan(c) | (denom == 0), F.lit(None)
    ).otherwise(F.round((n * v.cast("double") - s) / denom, 6))
    if clip is not None:
        # greatest/least IGNORE nulls (both engines) — clip only real scores
        z = F.when(z.isNotNull(), F.least(F.greatest(z, F.lit(-clip)), F.lit(clip)))
    return out.select(*df.columns, z.alias("z"))
