"""Exact integer-space k-means (operators/semantic.py kmeans_quantized):
bit-parity with a sequential pure-Python reference of the same
algorithm, and layout independence."""

from __future__ import annotations

import hashlib
import random

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.semantic import kmeans_quantized


def _quant(x: float) -> int:
    # mirror the engine exactly: the column is array<float>, so the value
    # is float32-rounded before widening; Spark round() HALF_UPs the
    # double's shortest decimal repr (BigDecimal.valueOf semantics)
    import decimal
    import struct

    xf = struct.unpack("f", struct.pack("f", x))[0]
    return int(
        decimal.Decimal(repr(xf * 1000000.0)).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
    )


def _reference(rows, k, iters):
    pts = {i: [_quant(x) for x in v] for i, v in rows}
    order = sorted(pts, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    cent = {cid: pts[i][:] for cid, i in enumerate(order[:k])}
    assign = {}
    for it in range(iters):
        assign = {}
        for i, v in pts.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
                for cid, c in cent.items()
            )
            assign[i] = best  # (dist, cid)
        if it < iters - 1:
            sums, counts = {}, {}
            for i, (d, cid) in assign.items():
                counts[cid] = counts.get(cid, 0) + 1
                acc = sums.setdefault(cid, [0] * len(pts[i]))
                for j, x in enumerate(pts[i]):
                    acc[j] += x
            cent = {
                cid: [s // counts[cid] for s in acc] for cid, acc in sums.items()
            }
    return {i: (cid, d // 1000000) for i, (d, cid) in assign.items()}


def _spark_run(spark, rows, k, iters, repartition=None):
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id bigint, embedding array<float>"
    )
    if repartition:
        df = df.repartition(repartition)
    out, cent = kmeans_quantized(df, k=k, iters=iters)
    return {r.vec_id: (r.cluster, r.dist_div) for r in out.collect()}, cent


@pytest.mark.parametrize("k,iters", [(3, 2), (4, 3), (1, 1)])
def test_matches_sequential_reference(spark, k, iters):
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(60)
    ]
    got, _ = _spark_run(spark, rows, k, iters)
    assert got == _reference(rows, k, iters)


def test_layout_independent(spark):
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-0.5, 0.5) for _ in range(6)]) for i in range(80)]
    a, _ = _spark_run(spark, rows, 4, 2)
    b, _ = _spark_run(spark, rows, 4, 2, repartition=13)
    assert a == b


def test_centroids_returned_in_integer_space(spark):
    rows = [(0, [0.1, 0.2]), (1, [0.3, 0.4]), (2, [-0.1, -0.2]), (3, [0.0, 0.0])]
    out, cent = kmeans_quantized(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>"), k=2, iters=2
    )
    cents = {r.cluster: list(r.centroid_micro) for r in cent.collect()}
    assert set(cents) <= {0, 1}
    for v in cents.values():
        assert all(isinstance(x, int) and abs(x) <= 1_000_000 for x in v)


def test_bad_params_rejected(spark):
    df = spark.createDataFrame([(0, [0.1])], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="k and iters"):
        kmeans_quantized(df, k=0)
