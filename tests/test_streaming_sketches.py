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
