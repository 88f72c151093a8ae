"""Streaming audience dashboard — sliding-window distinct users at
bounded cost, the pattern every event-analytics pipeline needs:

- exact sliding-window distinct (`hop_window` + COUNT DISTINCT) is the
  baseline, but duplicates every event into its size/slide covering
  windows and keeps per-window user sets as state
- the pane-decomposed HLL (`hop_pane_registers` → `hop_merge_estimate`)
  hashes each event ONCE into per-slide-pane registers — streaming
  state is bounded at 2^p rows per live pane regardless of audience
  size — and merges panes into windows at read time (associative max,
  bit-identical to sketching the expanded windows)
- the same register state union-merges across shards/streams
  (`hll_merge` contract), so per-datacenter streams roll up exactly

Run: python examples/07_streaming_audience.py  [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import (
    approx_ndv_hop,
    hop_merge_estimate,
    hop_pane_registers,
)
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.windows import hop_window


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eng.get_spark("example-audience", cpus=8)
    events = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )

    print("== batch: pane-decomposed approximate audience per sliding hour ==")
    est = approx_ndv_hop(events, "ts", "user_id", "1 hour", "15 minutes", p=9)
    est.orderBy("window_start_ms").show(8)

    print("== exact baseline on the same windows (small-scale sanity) ==")
    exact = (
        hop_window(events, "ts", "1 hour", "15 minutes")
        .groupBy(F.unix_millis("window_start").alias("window_start_ms"))
        .agg(F.count_distinct("user_id").alias("ndv_exact"))
    )
    est.join(exact, "window_start_ms").orderBy("window_start_ms").show(8)

    print("== streaming: the SAME pane registers as native streaming state ==")
    stage = tempfile.mkdtemp(prefix="audience_feed_")
    try:
        # replay the event table as a 3-batch file feed
        staged = events.withColumn("__b", F.pmod(F.xxhash64("user_id"), F.lit(3)))
        for b in range(3):
            staged.filter(F.col("__b") == b).drop("__b").write.mode(
                "overwrite"
            ).json(os.path.join(stage, f"b{b}"))
        feed = (
            spark.readStream.schema("ts timestamp, user_id bigint")
            .option("maxFilesPerTrigger", "4")
            .json(os.path.join(stage, "b*"))
        )
        regs = hop_pane_registers(feed, "ts", "user_id", "15 minutes", p=9)
        q = (
            regs.writeStream.format("memory")
            .queryName("audience_panes")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        streamed = hop_merge_estimate(
            spark.sql("SELECT * FROM audience_panes"), "1 hour", "15 minutes", p=9
        )
        parity = streamed.exceptAll(est).isEmpty() and est.exceptAll(streamed).isEmpty()
        streamed.orderBy("window_start_ms").show(8)
        assert parity, "streamed-state estimates != batch estimates"
        print("PASS: streamed-state HLL estimates == batch estimates")
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
