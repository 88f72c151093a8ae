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
