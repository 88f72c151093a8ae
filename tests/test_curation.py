"""Curation operators: sequence packing (distributed prefix sum),
stratified sampling, PII scrubbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
    global_running_sum,
    pack_sequences,
    sample_hash,
    scrub_pii,
    stratified_sample,
)


def test_global_running_sum_matches_sequential(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["id"]: r["running"] for r in global_running_sum(df, "id", "v").collect()}
    acc, want = 0, {}
    for i, v in rows:
        acc += v
        want[i] = acc
    assert got == want


def test_pack_sequences_concat_and_chunk(spark):
    # tokens: 5, 4, 3, 6, 2 at capacity 8 -> starts 0,5,9,12,18 -> packs 0,0,1,1,2
    df = spark.createDataFrame(
        [(1, 5), (2, 4), (3, 3), (4, 6), (5, 2)], "doc_id long, toks long"
    )
    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_sequences(df, "doc_id", "toks", capacity=8).collect()}
    assert out == {1: (0, 0), 2: (0, 5), 3: (1, 1), 4: (1, 4), 5: (2, 2)}


def test_pack_sequences_no_single_partition_window(spark, sf_dir):
    """The global cumsum must be the two-pass distributed prefix sum —
    never a single-partition window (the 100 TB killer). The range
    shuffle itself happens at the input's one-time localCheckpoint
    materialization (so expensive upstreams run once, not twice), so the
    downstream plan shows the per-__pid window over the checkpoint scan,
    not the rangepartitioning exchange."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    plan = pack_sequences(docs, "doc_id", "t", 2048)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "__pid" in plan  # windowed per range partition, never one global window
    assert "Scan ExistingRDD" in plan  # the materialized range-partitioned input


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(10_000)], "doc_id long, lang string"
    )
    out1 = stratified_sample(df, "lang", {"en": 0.5, "zh": 0.1}, "doc_id")
    rows = out1.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    assert abs(by_lang.get("en", 0) / 5000 - 0.5) < 0.05
    assert abs(by_lang.get("zh", 0) / 5000 - 0.1) < 0.05
    # deterministic: second run picks the identical row set
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.5, "zh": 0.1}, "doc_id").collect()}
    assert ids1 == ids2
    # default rate 0 drops unknown strata
    df2 = df.withColumn("lang", F.lit("xx"))
    assert stratified_sample(df2, "lang", {"en": 0.5}, "doc_id").count() == 0


def test_scrub_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.co early, see https://a.b/c?d=1 or call +1-202-555-0100 now")],
        "id int, text string",
    )
    r = scrub_pii(df).collect()[0]
    assert r["n_email"] == 1 and r["n_url"] == 1 and r["n_phone"] == 1
    assert "<EMAIL>" in r["scrubbed"] and "<URL>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]
    assert "bob.smith" not in r["scrubbed"] and "202" not in r["scrubbed"]


def test_sample_hash_range(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    mm = df.select(F.min(sample_hash("id")).alias("lo"), F.max(sample_hash("id")).alias("hi")).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] < 4294967296


def test_curation_ops_compose_with_streams(spark, tmp_path):
    """stratified_sample and scrub_pii are stateless projections/filters,
    so they run unchanged inside Structured Streaming micro-batches."""
    import json
    import os

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.streaming import json_file_stream

    src = str(tmp_path / "cur_in")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as fh:
        for i in range(200):
            fh.write(json.dumps({
                "doc_id": i, "lang": "en" if i % 2 == 0 else "zh",
                "text": f"doc {i} ping admin{i}@ex.org",
            }) + "\n")

    stream = json_file_stream(spark, src, "doc_id long, lang string, text string")
    out = scrub_pii(stratified_sample(stream, "lang", {"en": 0.5}, "doc_id"))
    assert out.isStreaming

    out_dir = str(tmp_path / "cur_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    assert all(r["lang"] == "en" for r in rows)          # zh rate 0 -> dropped
    assert 0 < len(rows) < 120                           # ~50% of the 100 en docs
    assert all("<EMAIL>" in r["scrubbed"] for r in rows)


def test_sample_hash_no_overflow_at_huge_ids(spark):
    """The 31-bit fold keeps the hash product inside int64, so Spark's
    wrapping long math equals exact arithmetic even at id = 2^63-1."""
    ids = [0, 1, 2**31 - 1, 2**31, 2**40, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: r["h"] for r in df.select("id", sample_hash("id").alias("h")).collect()}
    for i in ids:
        assert got[i] == ((i % 2**31) * 2654435761) % 2**32, i


def test_take_per_stratum_exact_counts_and_layout_independence(spark):
    """Exactly the requested count per stratum, the same rows at any
    partition layout, and per-count overrides respected."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import take_per_stratum

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "zh") for i in range(90)], "doc_id long, lang string"
    )
    picked = take_per_stratum(df, "lang", 10, "doc_id").collect()
    by_lang: dict[str, set] = {}
    for r in picked:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 10, "zh": 10}
    again = take_per_stratum(df.repartition(13), "lang", 10, "doc_id").collect()
    assert {(r["lang"], r["doc_id"]) for r in again} == {(r["lang"], r["doc_id"]) for r in picked}
    counted = take_per_stratum(df, "lang", 10, "doc_id", counts={"en": 3}).collect()
    assert [r["lang"] for r in counted] == ["en"] * 3  # zh absent: default 0


def test_global_running_sum_with_negative_values(spark):
    """Partition offsets must come from per-partition SUMS, not the max
    of the cumulative sum — signed deltas would otherwise inflate every
    later partition's offset."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import global_running_sum

    vals = [5, -3, 7, -10, 2, 6, -1, 4]
    df = spark.createDataFrame(list(enumerate(vals)), "i long, v long")
    got = {r["i"]: r["running"] for r in global_running_sum(df, "i", "v", num_partitions=3).collect()}
    acc = 0
    for i, v in enumerate(vals):
        acc += v
        assert got[i] == acc, (i, got[i], acc)


def test_weighted_sample_clamps_and_is_deterministic(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import sample_hash, weighted_sample

    rows = [(i, w) for i, w in enumerate([-1.0, 0.0, 0.5, 2.0, 1e9, None] * 40)]
    df = spark.createDataFrame(rows, "id long, w double")
    kept = {r["id"] for r in weighted_sample(df, "w", 0.5, "id").collect()}
    # negative / zero / NULL weights can never be sampled
    assert all(i % 6 not in (0, 1, 5) for i in kept)
    # probability clamps at 1: huge weights always survive
    assert all(i in kept for i in range(len(rows)) if i % 6 == 4)
    # layout independence
    again = {r["id"] for r in weighted_sample(df.repartition(7), "w", 0.5, "id").collect()}
    assert kept == again
    # keep decision matches the explicit threshold formula per row
    import pyspark.sql.functions as SF
    manual = {
        r["id"]
        for r in df.withColumn("h", sample_hash("id"))
        .filter(
            SF.col("h")
            < SF.least(SF.greatest(SF.col("w") * 0.5, SF.lit(0.0)), SF.lit(1.0)) * 4294967296.0
        )
        .collect()
    }
    assert kept == manual


def test_curriculum_order_global_ordering(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import curriculum_order
    import random

    rng = random.Random(3)
    rows = [(i, rng.uniform(0, 100)) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    out = curriculum_order(df, "score", shards=8, tiebreak_col="doc_id")
    collected = out.select("curriculum_shard", "score").collect()
    by_shard = {}
    for r in collected:
        by_shard.setdefault(r.curriculum_shard, []).append(r.score)
    # within-shard sorted...
    for scores in by_shard.values():
        assert scores == sorted(scores)
    # ...and shard ranges don't interleave
    shard_ids = sorted(by_shard)
    for a, b in zip(shard_ids, shard_ids[1:]):
        assert max(by_shard[a]) <= min(by_shard[b])
    assert sum(len(v) for v in by_shard.values()) == 5000

    # hard-first ordering flips the direction
    desc = curriculum_order(df, "score", shards=4, ascending=False, tiebreak_col="doc_id")
    d = {}
    for r in desc.select("curriculum_shard", "score").collect():
        d.setdefault(r.curriculum_shard, []).append(r.score)
    for shard_scores in d.values():
        assert shard_scores == sorted(shard_scores, reverse=True)
    ids = sorted(d)
    for a, b in zip(ids, ids[1:]):
        assert min(d[a]) >= max(d[b])


def test_dataset_split_disjoint_stable_and_validated(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import dataset_split

    import pytest

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = dataset_split(df, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    rows = {r.doc_id: r.split for r in out.collect()}
    assert set(rows.values()) == {"train", "val", "test"}  # sums to 1: no NULLs
    counts = {s: sum(1 for v in rows.values() if v == s) for s in ("train", "val", "test")}
    assert 0.7 < counts["train"] / 2000 < 0.9
    # growth stability: folds computed on a superset agree on the overlap
    big = dataset_split(
        spark.range(0, 4000).withColumnRenamed("id", "doc_id"),
        "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)],
    )
    rows_big = {r.doc_id: r.split for r in big.collect()}
    assert all(rows_big[k] == v for k, v in rows.items())
    # under-allocated range -> NULL held-out rows
    held = dataset_split(df, "doc_id", [("train", 0.5)])
    assert held.where("split IS NULL").count() > 0
    with pytest.raises(ValueError, match="non-positive"):
        dataset_split(df, "doc_id", [("a", 0.0)])
    with pytest.raises(ValueError, match="sum"):
        dataset_split(df, "doc_id", [("a", 0.8), ("b", 0.4)])
    # zero shuffle
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_assign_global_ids_dense_and_layout_independent(spark):
    """Ids are row_number()-1 in the declared total order, regardless of
    the input's partition layout; negated numeric component gives DESC."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import assign_global_ids

    rows = [(i, (i * 37) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, "k int, score int")

    def ids(frame):
        out = assign_global_ids(
            frame, [(-F.col("score")).cast("long"), F.col("k")], num_partitions=7
        )
        return {r["k"]: r["row_id"] for r in out.collect()}

    got = ids(df)
    expected_order = sorted(rows, key=lambda r: (-r[1], r[0]))
    assert got == {k: i for i, (k, _) in enumerate(expected_order)}
    assert ids(df.repartition(13)) == got
    assert ids(df.coalesce(1)) == got


def test_negative_sample_deterministic_no_self(spark):
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import negative_sample

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = negative_sample(df, "doc_id", k=4, seed=3)
    rows = {(r["anchor_id"], r["j"], r["neg_id"]) for r in out.collect()}
    # never self; j in range; at most k per anchor, k-1 only via self-collision
    assert all(a != n for a, _, n in rows)
    assert all(0 <= j < 4 for _, j, _ in rows)
    per_anchor = {}
    for a, j, n in rows:
        per_anchor.setdefault(a, set()).add(j)
    assert set(per_anchor) == set(range(50))
    assert all(len(js) >= 3 for js in per_anchor.values())

    # layout independence: identical draw from a repartitioned copy
    rows2 = {
        (r["anchor_id"], r["j"], r["neg_id"])
        for r in negative_sample(df.repartition(11), "doc_id", k=4, seed=3).collect()
    }
    assert rows2 == rows


def test_negative_sample_guards(spark):
    import pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import negative_sample

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        negative_sample(df, "doc_id", k=0)
    with pytest.raises(ValueError):
        negative_sample(df, "doc_id", k=2)


def test_review_r7_edge_contracts(spark):
    """Round-7 review regressions: NULL text chunks, NULL strata,
    alpha validation, huge-id span hashing, tie-straddling percentile."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
        chunk_documents,
        filter_by_percentile,
        span_corruption,
        temperature_resample,
    )

    # NULL text -> one empty chunk, never a vanished document
    df = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in chunk_documents(df, size=2).collect()}
    assert 1 in got and got[1]["chunk_text"] == ""

    # NULL stratum is its own stratum; alpha validated
    mix = spark.createDataFrame(
        [(i, "en") for i in range(10)] + [(100 + i, None) for i in range(5)],
        "doc_id long, lang string",
    )
    out = temperature_resample(mix, "lang", "doc_id", alpha=0.5, budget=12)
    assert out.filter(F.col("lang").isNull()).count() > 0  # not silently dropped
    import pytest as _pytest
    with _pytest.raises(ValueError, match="alpha"):
        temperature_resample(mix, "lang", "doc_id", alpha=1.5)

    # snowflake-scale ids must not overflow the salted span hash
    big = spark.createDataFrame(
        [(9_200_000_000_000_000, "w0 w1 w2 w3 w4 w5 w6 w7")], "doc_id long, text string"
    )
    assert span_corruption(big).count() == 1  # no ARITHMETIC_OVERFLOW

    # a tie group straddling the keep boundary keeps the exact count —
    # and warns that WHICH tied rows survive is layout-dependent until
    # a tiebreak_col is given (ADVICE r8)
    import warnings

    ties = spark.createDataFrame(
        [(i, "en", 7.0) for i in range(10)], "doc_id long, lang string, score double"
    )
    with pytest.warns(UserWarning, match="tiebreak_col"):
        kept = filter_by_percentile(ties, "score", 0.5, partition_by="lang")
    assert kept.count() == 5  # cume_dist formulation kept 0
    # with a tiebreak the kept set is exact and no warning fires
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        det = filter_by_percentile(ties, "score", 0.5, partition_by="lang",
                                   tiebreak_col="doc_id")
    assert {r["doc_id"] for r in det.collect()} == {0, 1, 2, 3, 4}


def test_balanced_shards_balance_counts_and_determinism(spark):
    """r9 balanced_shards: (1) row counts per shard differ by at most
    one; (2) total-weight spread is bounded by the largest single row
    weight (folded-deal guarantee), even on a skewed corpus; (3) the
    assignment is layout-independent; (4) sequential reference parity
    (snake over the weight-desc rank)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import balanced_shards

    # skewed weights: a few huge rows + a long tail
    rows = [(i, 10_000 if i < 3 else ((i * 37) % 97) + 1) for i in range(503)]
    df = spark.createDataFrame(rows, "id long, w long")
    n = 8
    got = balanced_shards(df, "w", n, "id").collect()
    assert {r["shard_id"] for r in got} == set(range(n))
    counts = [0] * n
    totals = [0] * n
    for r in got:
        counts[r["shard_id"]] += 1
        totals[r["shard_id"]] += r["w"]
    assert max(counts) - min(counts) <= 1
    assert max(totals) - min(totals) <= max(w for _, w in rows)
    # layout independence
    again = {(r["id"], r["shard_id"])
             for r in balanced_shards(df.repartition(17), "w", n, "id").collect()}
    assert again == {(r["id"], r["shard_id"]) for r in got}
    # sequential reference: snake over (w desc, id asc)
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want = {}
    for rank, (i, _) in enumerate(order):
        rnd, pos = divmod(rank, n)
        want[i] = pos if rnd % 2 == 0 else n - 1 - pos
    assert {r["id"]: r["shard_id"] for r in got} == want
    with pytest.raises(ValueError, match="n_shards"):
        balanced_shards(df, "w", 0, "id")


def test_budget_select_prefix_rule_and_determinism(spark):
    """r9 budget_select: selection is the maximal prefix of the
    (score DESC, id ASC) order whose INCLUSIVE running cost fits the
    budget — an oversized row mid-order is skipped and does not unblock
    later rows; layout-independent; budget 0 selects nothing."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import budget_select

    #            id, score, cost
    rows = [(1, 100, 30), (2, 90, 50), (3, 80, 40), (4, 70, 10), (5, 60, 5)]
    df = spark.createDataFrame(rows, "id long, score long, cost long")
    got = {r["id"]: r["selected"]
           for r in budget_select(df, "score", "cost", 85, "id").collect()}
    # running: 30, 80, 120, 130, 135 -> only ids 1,2 fit; id 3 overruns
    # and ids 4,5 stay excluded even though 30+50+10+5 would fit
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False}
    again = {r["id"]: r["selected"]
             for r in budget_select(df.repartition(7), "score", "cost", 85, "id").collect()}
    assert again == got
    none = budget_select(df, "score", "cost", 0, "id")
    assert all(not r["selected"] for r in none.collect())
    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        budget_select(df, "score", "cost", -1, "id")


def test_budget_select_rejects_fractional_cost(spark):
    """ADVICE r10: a double cost would be truncated toward zero PER ROW
    before the prefix sum (0.9 -> 0), silently changing which rows fit
    the budget — the operator must reject fractional cost types at plan
    time and tell the caller to micro-scale to an integer unit."""
    import pytest as _pytest

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import budget_select

    df = spark.createDataFrame(
        [(1, 10, 0.9), (2, 9, 0.9)], "id long, score long, cost double"
    )
    with _pytest.raises(TypeError, match="integral"):
        budget_select(df, "score", "cost", 1, "id")
    with _pytest.raises(TypeError, match="integral"):
        budget_select(df, "score", "cost", 1, "id", partition_by="score")
    # fractional decimals are rejected too: same per-row truncation
    with _pytest.raises(TypeError, match="integral"):
        budget_select(
            df.withColumn("cost", F.col("cost").cast("decimal(10,2)")),
            "score", "cost", 1, "id",
        )
    # micro-scaled integral costs pass
    ok = budget_select(
        df.withColumn("cost", (F.col("cost") * 1000).cast("long")),
        "score", "cost", 1000, "id",
    )
    assert {r["id"]: r["selected"] for r in ok.collect()} == {1: True, 2: False}
    # ADVICE r10: decimal(p, 0) is EXACT integral — no truncation is
    # possible, so decimal token counts must pass, same answer as long
    ok_dec = budget_select(
        df.withColumn(
            "cost", (F.col("cost") * 1000).cast("decimal(10,0)")
        ),
        "score", "cost", 1000, "id",
    )
    assert {r["id"]: r["selected"] for r in ok_dec.collect()} == {1: True, 2: False}


def test_budget_select_per_group_quota(spark):
    """partition_by applies the budget per group (per-source quota):
    each source's selection is the prefix of ITS quality order, and the
    result equals running the global operator per group."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import budget_select

    rows = [
        ("a", 1, 100, 40), ("a", 2, 90, 40), ("a", 3, 80, 40),
        ("b", 4, 95, 70), ("b", 5, 85, 20),
    ]
    df = spark.createDataFrame(rows, "src string, id long, score long, cost long")
    got = {r["id"]: r["selected"]
           for r in budget_select(df, "score", "cost", 80, "id",
                                  partition_by="src").collect()}
    # a: 40, 80, 120 -> ids 1,2; b: 70, 90 -> id 4 only
    assert got == {1: True, 2: True, 3: False, 4: True, 5: False}
    # equivalence with the global operator applied per group
    for src in ("a", "b"):
        sub = {r["id"]: r["selected"]
               for r in budget_select(df.where(F.col("src") == src),
                                      "score", "cost", 80, "id").collect()}
        assert sub == {i: got[i] for i in sub}
