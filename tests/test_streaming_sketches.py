"""Sketches as streaming accumulators: the HLL register state is a
plain groupBy/max aggregation, so Structured Streaming maintains it
natively (state store = the registers; bounded by construction at 2^p
rows per group). The batch sketch on the same data is the oracle."""

from __future__ import annotations

import json
import os

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import hll_estimate, hll_registers
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream


def test_streaming_hll_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "hll_in")
    os.makedirs(in_dir)
    rows = [{"g": i % 3, "v": f"user{i % 400}"} for i in range(1200)]
    for b in range(3):
        with open(os.path.join(in_dir, f"b{b}.json"), "w") as fh:
            for r in rows[b * 400 : (b + 1) * 400]:
                fh.write(json.dumps(r) + "\n")

    stream = json_file_stream(spark, in_dir, "g int, v string")
    regs = hll_registers(stream, ["g"], "v", p=9)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.g, r.bucket, r.r) for r in spark.sql("SELECT * FROM hll_regs").collect()
    }

    batch_df = spark.createDataFrame([(r["g"], r["v"]) for r in rows], "g int, v string")
    want = {(r.g, r.bucket, r.r) for r in hll_registers(batch_df, ["g"], "v", p=9).collect()}
    assert got == want

    # and the estimates built from the streamed state match the batch path
    est_stream = {
        (r.g, r.ndv_est)
        for r in hll_estimate(spark.sql("SELECT * FROM hll_regs"), ["g"], p=9).collect()
    }
    est_batch = {
        (r.g, r.ndv_est)
        for r in hll_estimate(hll_registers(batch_df, ["g"], "v", p=9), ["g"], p=9).collect()
    }
    assert est_stream == est_batch


def test_streaming_ks_drift_monitor_equals_batch(spark, tmp_path):
    """Live drift gate: the stream maintains a per-value histogram as a
    native update-mode count (bounded state = distinct values); KS
    against a reference corpus comes from ks_from_counts on the
    full-outer of the two histograms and equals the batch ks_drift on
    the same data."""
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import ks_drift, ks_from_counts

    in_dir = str(tmp_path / "ks_in")
    os.makedirs(in_dir)
    live_vals = [round(0.1 * ((i * 7) % 40), 1) for i in range(900)]
    for b in range(3):
        with open(os.path.join(in_dir, f"b{b}.json"), "w") as fh:
            for v in live_vals[b * 300 : (b + 1) * 300]:
                fh.write(json.dumps({"v": v}) + "\n")

    stream = json_file_stream(spark, in_dir, "v double")
    hist = stream.groupBy("v").count()
    q = (
        hist.writeStream.format("memory")
        .queryName("ks_hist")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    ref_vals = [round(0.1 * ((i * 11) % 55), 1) for i in range(700)]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    ref_hist = ref.groupBy(F.col("value").alias("v")).agg(
        F.count("*").alias("ref_count")
    )
    merged = (
        spark.sql("SELECT v, count AS live_count FROM ks_hist")
        .join(ref_hist, "v", "full_outer")
    )
    got = ks_from_counts(merged, "v", "live_count", "ref_count").first()

    live = spark.createDataFrame([(v,) for v in live_vals], "value double")
    want = ks_drift(live, ref, "value").first()
    assert (got["ks_stat"], got["ks_at"], got["n_a"], got["n_b"]) == (
        want["ks_stat"], want["ks_at"], want["n_a"], want["n_b"],
    )
    assert got["ks_stat"] > 0  # the two generators genuinely differ


def test_streaming_mwu_drift_monitor_equals_batch(spark, tmp_path):
    """Rank-sum twin of the KS gate: same live update-mode histogram,
    mannwhitney_from_counts on the full-outer of the two histograms
    equals the batch mannwhitney_drift on the same data."""
    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import (
        mannwhitney_drift,
        mannwhitney_from_counts,
    )

    in_dir = str(tmp_path / "mwu_in")
    os.makedirs(in_dir)
    live_vals = [round(0.1 * ((i * 7) % 40) + 1.0, 1) for i in range(900)]  # shifted up
    for b in range(3):
        with open(os.path.join(in_dir, f"b{b}.json"), "w") as fh:
            for v in live_vals[b * 300 : (b + 1) * 300]:
                fh.write(json.dumps({"v": v}) + "\n")

    stream = json_file_stream(spark, in_dir, "v double")
    q = (
        stream.groupBy("v").count()
        .writeStream.format("memory").queryName("mwu_hist")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)

    ref_vals = [round(0.1 * ((i * 11) % 55), 1) for i in range(700)]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    ref_hist = ref.groupBy(F.col("value").alias("v")).agg(
        F.count("*").alias("ref_count")
    )
    merged = (
        spark.sql("SELECT v, count AS live_count FROM mwu_hist")
        .join(ref_hist, "v", "full_outer")
    )
    got = mannwhitney_from_counts(merged, "v", "live_count", "ref_count").first()

    live = spark.createDataFrame([(v,) for v in live_vals], "value double")
    want = mannwhitney_drift(live, ref, "value").first()
    assert got == want
    # side B is the REFERENCE: the live stream sits above it, so few
    # (live, ref) pairs have live < ref -> U_b small, z strongly negative
    assert got["z"] < -2


def test_streaming_pane_hll_hop_equals_batch(spark, tmp_path):
    """Sliding-window distinct via PANE-decomposed HLL on a stream:
    the state Structured Streaming maintains is per-PANE registers
    (bounded, non-overlapping — no event is duplicated into its k
    covering windows), and the read-side pane->window max-merge
    reproduces the batch approx_ndv_hop bit-for-bit."""
    import datetime

    from pyspark.sql import functions as F

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import (
        approx_ndv_hop,
        hop_merge_estimate,
        hop_pane_registers,
    )

    base_ms = 1_700_000_000_000
    rows = [
        {"ts_ms": base_ms + (i * 97_000) % 10_800_000, "user": f"u{i % 250}"}
        for i in range(900)
    ]
    in_dir = str(tmp_path / "pane_in")
    os.makedirs(in_dir)
    for b in range(3):
        with open(os.path.join(in_dir, f"b{b}.json"), "w") as fh:
            for r in rows[b * 300 : (b + 1) * 300]:
                fh.write(json.dumps(r) + "\n")

    stream = json_file_stream(spark, in_dir, "ts_ms long, user string").select(
        F.timestamp_millis(F.col("ts_ms")).alias("ts"), "user"
    )
    regs = hop_pane_registers(stream, "ts", "user", "15 minutes", p=9)
    q = (
        regs.writeStream.format("memory")
        .queryName("pane_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = hop_merge_estimate(
        spark.sql("SELECT * FROM pane_regs"), "1 hour", "15 minutes", p=9
    )
    got = sorted((r.window_start_ms, r.ndv_est) for r in streamed.collect())

    batch_df = spark.createDataFrame(
        [(datetime.datetime.utcfromtimestamp(r["ts_ms"] / 1000), r["user"]) for r in rows],
        "ts timestamp, user string",
    )
    want = sorted(
        (r.window_start_ms, r.ndv_est)
        for r in approx_ndv_hop(batch_df, "ts", "user", "1 hour", "15 minutes", p=9).collect()
    )
    assert got == want and len(got) > 0
