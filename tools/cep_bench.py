"""Streaming CEP throughput: drive streaming_match_pattern with a
generated event stream and report events/second end-to-end.

The generator is Spark-side (range -> to_json); each logical batch is
one file with increasing mtimes so the file source replays ordered
micro-batches and the watermark really advances.

Usage: python tools/cep_bench.py [n_events] [n_batches] [n_users]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream
from data_pipeline_evolution_batch_streaming_apache_flink_spark.streaming.cep import streaming_match_pattern

STEPS = [
    ("signup", "event_type = 'signup'"),
    ("click", "event_type = 'click'"),
    ("purchase", "event_type = 'purchase'"),
]
TYPES = ["view", "click", "signup", "purchase", "error"]


def gen_batch(spark, n, batch_idx, n_users, out_dir):
    base_ms = 1_709_280_000_000 + batch_idx * n * 100
    df = (
        spark.range(n)
        .select(
            (F.col("id") + batch_idx * n).alias("event_id"),
            F.pmod(F.xxhash64((F.col("id") + batch_idx * n) * 7), F.lit(n_users)).alias("user_id"),
            F.timestamp_millis(F.lit(base_ms) + F.col("id") * 100).alias("ts"),
            F.element_at(
                F.array(*[F.lit(t) for t in TYPES]),
                (F.pmod(F.xxhash64((F.col("id") + batch_idx * n) * 13), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
        )
        .select(F.to_json(F.struct("event_id", "user_id", "ts", "event_type")).alias("value"))
    )
    tmp = os.path.join(out_dir, f"_tmp{batch_idx}")
    df.coalesce(1).write.mode("overwrite").text(tmp)
    part = [p for p in os.listdir(tmp) if p.startswith("part-")][0]
    dst = os.path.join(out_dir, f"batch_{batch_idx:03d}.json")
    shutil.move(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)
    os.utime(dst, (1_700_000_000 + batch_idx * 10, 1_700_000_000 + batch_idx * 10))


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_users = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    spark = get_spark("cep-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cep_bench_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    per = n_events // n_batches
    for b in range(n_batches):
        gen_batch(spark, per, b, n_users, in_dir)
    # heartbeat far in the future drains every buffered partial
    with open(os.path.join(in_dir, "zz_heartbeat.json"), "w") as fh:
        fh.write(json.dumps({"event_id": -1, "user_id": -1,
                             "ts": "2030-01-01 00:00:00", "event_type": "error"}) + "\n")
    os.utime(os.path.join(in_dir, "zz_heartbeat.json"),
             (1_700_000_000 + n_batches * 10, 1_700_000_000 + n_batches * 10))

    stream = json_file_stream(
        spark, in_dir, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    out = streaming_match_pattern(
        stream, STEPS, key_col="user_id", ts_col="ts", id_col="event_id",
        within=3_600_000, delay="0 seconds",
    )
    out_dir = os.path.join(root, "out")
    t0 = time.time()
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.time() - t0
    matches = spark.read.parquet(out_dir).count()
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "cep_events_per_sec",
        "value": round(n_events / wall, 1),
        "unit": "events/sec",
        "events": n_events,
        "batches": n_batches,
        "users": n_users,
        "matches": matches,
        "wall_sec": round(wall, 2),
    }))


if __name__ == "__main__":
    main()
