"""Experiment-readout walkthrough — the A/B analysis chain, composed
from the engine's exact-by-construction operators:

- variance reduction first: CUPED shrinks the per-unit metric with a
  pre-period covariate (same mean, less noise, faster significance)
- location: Welch's unequal-variance t on the raw and adjusted metric
- whole-distribution check: Jensen-Shannon divergence (bounded,
  finite on empty bins — the honest "did anything change" readout)
- seasonality-aware baseline: classical decomposition of the hourly
  series so a "lift" that is really a daily cycle gets caught
- classifier-quality loop: exact tie-aware ROC AUC, and nDCG@k for
  ranked retrieval quality

Run: python examples/05_experiment_readout.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import js_divergence
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import (
    calibration_bins, cuped_adjust, roc_auc, welch_ttest,
)
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import seasonal_decompose


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eng.get_spark("example-experiment", cpus=8)
    events = spark.read.parquet(os.path.join(sf, "events.parquet")).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))

    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    cents = F.floor(F.col("value") * 100).cast("bigint")

    print("== CUPED: pre-period covariate shrinks the metric ==")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0)).alias("x_cents"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0)).alias("y_cents"),
    )
    adjusted = cuped_adjust(per_user, "x_cents", "y_cents")
    adjusted.select("user_id", "y_cents", "theta", "y_adjusted").show(5)

    print("== Welch's t: purchase vs click event values ==")
    welch_ttest(events, "event_type", "value", "purchase", "click").show()

    print("== JSD: how differently are the two distributed? ==")
    e = events.withColumn("__cents", cents)
    js_divergence(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") == "click"),
        "__cents",
    ).show()

    print("== Seasonal decomposition of hourly spend (period 24) ==")
    hourly = events.groupBy(
        "event_type",
        F.call_function(
            "div",
            F.unix_millis(F.col("ts").cast("timestamp")),
            F.lit(3600000).cast("bigint"),
        ).alias("hour_idx"),
    ).agg(F.sum(cents).alias("cents"))
    decomposed = seasonal_decompose(hourly, "event_type", "hour_idx", "cents", period=24)
    decomposed.filter(F.col("trend").isNotNull()).show(5)

    print("== ROC AUC: does doc length separate English from the rest? ==")
    auc_df = roc_auc(docs, "n_chars", F.col("lang") == "en")
    auc_df.show()

    # smoke oracles: the in-sample OLS theta can only SHRINK the metric
    # variance (that is CUPED's whole point), and AUC is a probability.
    v = adjusted.agg(
        F.var_samp("y_cents").alias("vy"), F.var_samp("y_adjusted").alias("va")
    ).collect()[0]
    assert v["va"] <= v["vy"] * 1.0001, (v["va"], v["vy"])
    auc = auc_df.collect()[0]["auc"]
    assert 0.0 <= auc <= 1.0
    print(f"PASS: CUPED variance {v['vy']:.0f} -> {v['va']:.0f}; AUC {auc:.3f} in [0,1]")

    print("== calibration: is the length-based 'is English' score honest? ==")
    scored = docs.withColumn(
        "p_en", F.least(F.col("n_chars"), F.lit(1000)).cast("double") / 1000.0
    )
    cal = calibration_bins(scored, "p_en", F.col("lang") == "en", n_bins=10)
    cal.orderBy("bin").show()
    # smoke oracle: bin counts cover every non-null row exactly once
    assert cal.agg(F.sum("n")).collect()[0][0] == docs.where(
        "n_chars IS NOT NULL AND lang IS NOT NULL"
    ).count()
    print("PASS: calibration bins partition the scored corpus")

    spark.stop()


if __name__ == "__main__":
    main()
