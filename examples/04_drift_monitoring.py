"""Drift-monitoring walkthrough — the statistical gates a production
feed needs, composed from the engine's exact-by-construction operators:

- distribution drift: exact two-sample KS + Mann-Whitney rank-sum
  (shape-sensitive and location-sensitive; a gate wants both)
- binned drift: PSI on the same split
- per-series changepoints: two-sided CUSUM via the prefix-sum closed form
- trend extraction: per-key OLS slope in cents/day
- categorical association: chi-squared + Cramér's V
- amount sanity: Benford first-digit audit

Run: python examples/04_drift_monitoring.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import benford_audit, ks_drift, psi_drift
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import chi2_independence, mannwhitney_drift, ols_trend
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import cusum


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eng.get_spark("example-drift", cpus=8)
    events = spark.read.parquet(os.path.join(sf, "events.parquet"))
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))

    view = events.filter(F.col("event_type") == "view")
    purchase = events.filter(F.col("event_type") == "purchase")

    print("== KS (shape drift) ==")
    ks_drift(view, purchase, "value").show()

    print("== Mann-Whitney (location drift) ==")
    mannwhitney_drift(view, purchase, "value").show()

    print("== PSI (binned drift) ==")
    psi_drift(view, purchase, "value", lo=0.0, hi=500.0, bins=16).show()

    print("== CUSUM changepoints (alerting users) ==")
    scores = cusum(events, "user_id", "ts", "value",
                   ref_cents=5000, threshold_cents=20000, slack_cents=500,
                   tiebreak_cols=("event_id",))
    scores.filter("alert").groupBy("user_id").count().orderBy(F.desc("count")).show(5)

    print("== OLS spend trend per user (cents/day) ==")
    ols_trend(
        events, ["user_id"],
        F.unix_millis(F.col("ts").cast("timestamp")) - F.lit(1704067200000),
        F.floor(F.col("value") * 100).cast("bigint"),
        slope_unit=86400000.0,
    ).orderBy(F.desc("slope")).show(5)

    print("== chi-squared: does priority predict status? ==")
    chi2 = chi2_independence(orders, "o_orderpriority", "o_orderstatus")
    chi2.show()

    print("== Benford audit on order amounts ==")
    benford = benford_audit(orders, "o_totalprice")
    benford.show()

    # smoke oracles: every gate is exact-by-construction, so a pure
    # layout change must reproduce it bit-for-bit; Benford always
    # yields the nine leading-digit rows.
    chi2_again = chi2_independence(
        orders.repartition(13), "o_orderpriority", "o_orderstatus"
    )
    assert sorted(map(tuple, chi2.collect())) == sorted(map(tuple, chi2_again.collect()))
    assert benford.count() == 9
    print("PASS: chi-squared bit-identical under repartition(13); Benford covers digits 1-9")

    print("== behavioral twins: top-2 Pearson-correlated users by daily activity ==")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.timeseries import ts_correlation_topk

    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", (F.dayofmonth("ts") - 1).alias("day")
    )
    twins = ts_correlation_topk(
        ev, "user_id", "day", n_buckets=31, k=2,
        query_filter=F.col("user_id") < 5,
    )
    twins.orderBy("user_id_q", "rank").show(10)

    spark.stop()


if __name__ == "__main__":
    main()
