"""Plan-shape regression tests — lock in the SCALE.md claims.

These assert on the physical plan, not results: filters reach the
parquet scan, small dims broadcast, the as-of join keeps its single
shuffle, and bucketed tables join without any exchange (the co-located
join story for repeated big-big joins at scale).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    plan = _plan(suite.QUERIES["pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: unreferenced wide columns must not be read
    assert "l_comment" not in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(suite.QUERIES["region_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    plan = _plan(suite.QUERIES["asof_join"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_candidate_joins_are_hash_joins_not_cross(spark, sf_dir):
    for q in ("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard"):
        plan = _plan(suite.QUERIES[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_curation_and_contamination_plan_shapes(spark, sf_dir):
    """The decontamination step must be hash/broadcast joins end-to-end:
    no CartesianProduct anywhere, and the drop applied as a broadcast
    anti-join (the contaminated-id set is tiny by design). The anti-join
    is asserted on the decontaminate stage itself — in the full
    curation_pipeline it sits above packing's localCheckpoint, which
    truncates the visible plan."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import decontaminate

    plan = _plan(suite.QUERIES["contamination_check"](spark, sf_dir))
    assert "CartesianProduct" not in plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = decontaminate(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20),
        "doc_id", "doc_id", n=3, min_shared=3,
    )
    plan = _plan(clean)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_asof_tolerance_single_shuffle(spark, sf_dir):
    """The tolerance branch adds a second window pass but must reuse the
    same (key) partitioning — still exactly one exchange."""
    plan = _plan(suite.QUERIES["asof_tolerance"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_max_bucket_guard_adds_no_exchange(spark, sf_dir):
    """The bucket-size window filter must share the groupBy's hash
    partitioning: one (tbl, bucket) exchange with or without the guard,
    so bounding adversarial buckets costs a sort, never a second
    shuffle of the hashed vectors."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import bucketed_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for mb in (None, 50):
        df = bucketed_cosine_pairs(
            emb, "vec_id", "embedding", 0.45, n_planes=4, n_tables=4, max_bucket=mb
        )
        assert _plan(df).count("Exchange hashpartitioning(tbl") == 1, f"max_bucket={mb}"


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Bucketing both sides of a repeated big-big join on the join key
    removes the per-query shuffle entirely: with broadcast disabled the
    bucketed join must plan as SortMergeJoin with ZERO exchanges."""
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("b")
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_training_prep_scoring_stays_above_fanout(spark, sf_dir):
    """Regression guard for the dedup-before-gate restructure (SCALE.md
    "When NOT to push a predicate down"): the expensive text-scoring
    expressions must appear in exactly ONE plan node — the projection
    above the fan-out exchange — and never inside a Filter or the
    parquet scan (pushdown substitution would re-serialize them)."""
    plan = _plan(suite.QUERIES["training_prep"](spark, sf_dir))
    for line in plan.split("\n"):
        stripped = line.lstrip(" +-:*()0123456789")
        if stripped.startswith("Filter") or stripped.startswith("FileScan"):
            assert "split(" not in line, f"scoring leaked into: {line[:120]}"
    heavy_nodes = [
        line for line in plan.split("\n")
        if "split(" in line and line.lstrip(" +-:*()0123456789").startswith("Project")
    ]
    assert len(heavy_nodes) == 1, f"scoring evaluated in {len(heavy_nodes)} projections"


def test_partition_pruning_on_partitioned_table(spark, sf_dir, tmp_path):
    """Date-partitioned layout (how a 100 TB fact table is stored): a
    filter on the partition column must become a PartitionFilter (pruned
    at planning, zero IO for other partitions), not a data filter."""
    src = suite.load_tables(spark, sf_dir, ("orders",))["orders"]
    part_dir = str(tmp_path / "orders_part")
    (
        src.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .write.partitionBy("order_month")
        .mode("overwrite")
        .parquet(part_dir)
    )
    df = spark.read.parquet(part_dir).filter(F.col("order_month") == "1997-03")
    plan = _plan(df)
    assert "PartitionFilters" in plan and "order_month" in plan.split("PartitionFilters")[1][:200]
    # pruned scan must touch only the one partition's files
    scanned = df.select(F.input_file_name()).distinct().collect()
    assert all("order_month=1997-03" in r[0] for r in scanned)
    assert df.count() > 0


def test_ivf_index_probe_partition_pruned(spark, sf_dir, tmp_path):
    """The persisted IVF index (ivf_write_index) must be probed via
    partition-pruned scans (only probed __cell partitions read) with the
    query side broadcast — the corpus is never shuffled on __cell — and
    the probe result must equal the in-memory IVF at the same seed."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_probe_topk,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    ivf_write_index(emb, idx, "vec_id", n_cells=8, seed=42)

    probed = ivf_probe_topk(queries, idx, "vec_id", "vec_id", k=5, n_probe=2)
    plan = _plan(probed)
    assert "PartitionFilters" in plan and "__cell" in plan.split("PartitionFilters")[1][:300]
    assert "BroadcastHashJoin" in plan
    # corpus side must not be exchanged on the cell key
    assert "Exchange hashpartitioning(__cell" not in plan
    mem = ivf_cosine_topk(queries, emb, "vec_id", "vec_id", k=5, n_cells=8, n_probe=2, seed=42)
    assert sorted(map(tuple, probed.collect())) == sorted(map(tuple, mem.collect()))


def test_ivfpq_index_probe_partition_pruned_and_matches_in_memory(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index must be probed via partition-pruned
    scans of the CODES files only (unprobed cells never read, float
    vectors never stored in the index) and must reproduce the in-memory
    ivf_pq_topk exactly at the same seed — both builds are deterministic
    (seeded k-means + content-hash codebook sampling)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import (
        ivf_pq_topk,
        ivfpq_probe_topk,
        ivfpq_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, idx, "vec_id", n_cells=8, m=16, n_centroids=32, seed=42)

    probed = ivfpq_probe_topk(
        queries, emb, idx, "vec_id", "vec_id", k=5, n_probe=2, refine=8
    )
    plan = _plan(probed)
    assert "PartitionFilters" in plan and "__cell" in plan.split("PartitionFilters")[1][:300]
    mem = ivf_pq_topk(
        queries, emb, "vec_id", "vec_id", k=5,
        n_cells=8, n_probe=2, m=16, n_centroids=32, refine=8, seed=42,
    )
    assert sorted(map(tuple, probed.collect())) == sorted(map(tuple, mem.collect()))


def test_ivf_in_memory_probe_join_broadcasts_queries(spark, sf_dir):
    """ivf_cosine_topk's probe join must broadcast the (queries x n_probe)
    side so the corpus never shuffles on __cell (VERDICT r1 item 5)."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    df = ivf_cosine_topk(queries, emb, "vec_id", "vec_id", k=5, n_cells=8, n_probe=2)
    plan = _plan(df)
    assert "Exchange hashpartitioning(__cell" not in plan
    assert "BroadcastHashJoin" in plan


def test_aqe_splits_skewed_join_partitions(spark):
    """SCALE.md claim: hot-key shuffle joins are healed by AQE skew
    splitting at runtime. Synthetic 90%-one-key join (thresholds scaled to
    the fixture) must finalize with a skew-split shuffle read."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        big = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000).cast("int").alias("k"),
            F.concat(F.lit("pad_"), F.col("id").cast("string"), F.lit("x" * 64)).alias("payload"),
        )
        dim = spark.range(0, 1000).select(F.col("id").cast("int").alias("k"), F.col("id").alias("v"))
        j = big.join(dim, "k").groupBy().count()
        assert j.collect()[0]["count"] == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hashed_features_fold_not_duplicated_below_fanout(spark, sf_dir):
    """The md5 feature fold must run once, above the fan_out exchange —
    Catalyst's explode size-filter pushdown used to duplicate the whole
    fold onto the serial scan partition (75x wall at sf0.1)."""
    plan = _plan(suite.QUERIES["hashed_features"](spark, sf_dir))
    assert plan.count("Exchange RoundRobinPartitioning") == 1
    # the fold expression appears exactly once (the Project), not again
    # in a pushed-down Filter below the exchange ("split(trim(text"
    # survives the plan-string truncation; "sequence(1, 15" does not)
    assert plan.count("split(trim(text") == 1


def test_session4_queries_no_cartesian_and_pruned_scans(spark, sf_dir):
    # co-occurrence/triangle: every candidate join is an equi-join (the
    # only nested-loop allowed is the 1-row summary/count crossJoin);
    # char_entropy reads exactly (doc_id, text)
    for q in ("cooccur_pmi", "triangle_census"):
        plan = _plan(suite.QUERIES[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
    plan = _plan(suite.QUERIES["char_entropy"](spark, sf_dir))
    assert "Exchange" not in plan  # row-local: zero shuffle
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_bloom_probe_side_has_no_shuffle(spark, sf_dir):
    # the prune itself is a scan + broadcast-nested-loop against the
    # 1-row filter + row-local predicate: the probe side must see NO
    # exchange of its rows and the key filter must reach the scan
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.bloom import bloom_build, bloom_prune

    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    bloom = bloom_build(dim, "c_custkey", m=1024, k=3)
    probe = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    plan = _plan(bloom_prune(probe, "o_custkey", bloom, m=1024, k=3))
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(o_custkey)]" in plan


def test_cooccur_and_triangle_scan_fact_table_once(spark, sf_dir):
    # the (basket, item) distinct / canonical edge list feed several
    # consumers each; lazy localCheckpoint shares ONE materialization by
    # RDD identity, so the fact table appears in the main plan at most
    # once (AQE stage reuse alone is submission-order opportunistic)
    for q in ("cooccur_pmi", "triangle_census"):
        plan = _plan(suite.QUERIES[q](spark, sf_dir))
        assert plan.count("FileScan parquet") <= 1, q


def test_winnow_index_materialized_once(spark, sf_dir):
    # winnow_pairs' (id, fp) index feeds the df-count guard, per-doc
    # totals, and both join sides: the lazy localCheckpoint pins ONE
    # materialization of the md5-heavy fingerprint build (8 FileScans
    # without it); source_overlap composes it, so it inherits the pin
    # plus its two tiny dimension scans.
    plan = _plan(suite.QUERIES["winnow_pairs"](spark, sf_dir))
    assert plan.count("FileScan parquet") <= 1
    plan = _plan(suite.QUERIES["source_overlap"](spark, sf_dir))
    assert plan.count("FileScan parquet") <= 3


def test_session4_results_layout_independent(spark, sf_dir):
    # determinism claim of the new families pinned at the SUITE level:
    # same rows whatever the shuffle-partition count / input layout
    import pytest

    for q in ("cooccur_pmi", "triangle_census", "char_entropy", "rrf_fusion",
              "dataset_split", "range_join_pairs", "hop_distinct_users"):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            a = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b, q


def test_session5_results_layout_independent(spark, sf_dir):
    """Round-4 session-5 families: same rows at shuffle partitions 5 vs 17
    (url/global-id/containment/KS/ntile/negatives/LPA/k-anonymity)."""
    for q in ("url_dedup", "global_ids", "dedup_containment", "ks_drift",
              "equidepth_bins", "negative_sample", "lpa_communities",
              "k_anonymity", "html_extract"):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            a = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b, q


def test_session6_results_layout_independent(spark, sf_dir):
    """Round-4 session-6 families: same rows at shuffle partitions 5 vs 17
    (HITS/link-prediction/winnowing/EWMA/NB/variant/XML/linkage/digest/
    windowed HLL)."""
    for q in ("hits_scores", "link_prediction", "winnow_pairs",
              "ewma_features", "nb_classify", "variant_shred", "xml_ingest",
              "record_linkage", "table_digest", "hop_hll_users"):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            a = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b, q


def test_session6_pair_generators_never_cartesian(spark, sf_dir):
    """The session-6 pair generators (wedge join, fingerprint index,
    blocked linkage) must stay pure equi-joins — no
    CartesianProduct/BroadcastNestedLoopJoin anywhere in their plans."""
    for q in ("link_prediction", "winnow_pairs", "record_linkage"):
        plan = suite.QUERIES[q](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_session7_results_layout_independent(spark, sf_dir):
    """Round-4 session-7 families: same rows at shuffle partitions 5 vs 17
    (Mann-Whitney/CUSUM/OLS-trend/chi-squared/k-core/FK-audit/RAKE)."""
    for q in ("mannwhitney_drift", "cusum_alerts", "trend_lines",
              "chi2_independence", "kcore", "fk_audit", "rake_keywords",
              "woe_iv", "acf_features", "hll_overlap", "benford_audit",
              "association_rules", "transition_matrix", "assortativity",
              "winsorize", "zipf_fit", "local_clustering", "lsh_incremental"):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            a = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b, q


def test_session7_plan_shapes(spark, sf_dir):
    """CUSUM must stay a single-exchange window cascade; the chi-squared
    marginals must come back as broadcast joins (no sort-merge on the
    tiny cell table)."""
    plan = _plan(suite.QUERIES["cusum_alerts"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan

    plan2 = _plan(suite.QUERIES["chi2_independence"](spark, sf_dir))
    assert "SortMergeJoin" not in plan2


def test_session7_more_plan_shapes(spark, sf_dir):
    """winsorize's bound table must come back as a broadcast join (never
    a sort-merge of the fact table against 5 rows); RAKE and the LSH
    probe must stay equi-join-only (no CartesianProduct /
    BroadcastNestedLoopJoin); zipf's rank stage must not collapse into
    a single-partition global window."""
    plan = _plan(suite.QUERIES["winsorize"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    for q in ("rake_keywords", "lsh_incremental"):
        plan = _plan(suite.QUERIES[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q

    plan = _plan(suite.QUERIES["zipf_fit"](spark, sf_dir))
    # the rank comes from the two-pass prefix sum, whose range exchange is
    # materialized behind a localCheckpoint; the remaining window cumsum
    # partitions by __pid — NO window in the plan is global
    assert "Scan ExistingRDD" in plan
    assert plan.count("windowspecdefinition(") == plan.count("windowspecdefinition(__pid")


def test_session8_plan_shapes(spark, sf_dir):
    """The round's new families keep their scale shapes: the seasonal
    phase table comes back as a broadcast join; the quantile-normalize
    as-of merge is exchange+window, never a nested-loop range join; the
    CUPED moment frame is the only nested-loop (a 1-row broadcast
    crossJoin, by design); roc_auc's prefix sum is materialized behind
    the localCheckpoint."""
    plan = _plan(suite.QUERIES["seasonal_decompose"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    plan = _plan(suite.QUERIES["quantile_normalize"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row total broadcast onto the probe
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "Scan ExistingRDD" in plan  # checkpointed range-partitioned merge

    plan = _plan(suite.QUERIES["roc_auc"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan

    plan = _plan(suite.QUERIES["cuped_metrics"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row moments


def test_round5_new_queries_scale_shapes(spark, sf_dir):
    """Round-5 additions keep the house discipline: graded-nDCG's
    histogram joins broadcast and never go nested-loop over data (the
    sole BroadcastNestedLoopJoin allowance is cosine_topk's 1-row
    corpus-count broadcast), and both queries are layout-independent."""
    plan = _plan(suite.QUERIES["ndcg_graded_eval"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

    for q in ("ndcg_graded_eval", "record_linkage_em"):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            a = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(str, suite.QUERIES[q](spark, sf_dir).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b, q


def test_shingle_and_token_builds_evaluated_once_not_below_fanout(spark, sf_dir):
    """InferFiltersFromGenerate regression pin: exploding the shingle /
    token array as a bare attribute lets Catalyst infer `size(arr) > 0`,
    which alias-substitutes below fan_out's exchange and re-runs the
    whole array build serially in the scan stage (measured 7x on sf0.1
    documents). explode_noinfer's CASE WHEN wrapper defeats the
    inference; pin that the expensive build expression appears exactly
    once in the optimized plan — in the post-exchange stage."""
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import contamination_pairs, ngram_containment_pairs, ngram_jaccard_pairs
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import bm25_scores
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").limit(200)

    def optimized(df) -> str:
        return df._jdf.queryExecution().optimizedPlan().toString()

    # Shingle build signature: the transform over sliced token arrays.
    # Golden counts = one eval per logical appearance of the shingled
    # subtree (self-join prints it twice, containment's fwd/rev union
    # doubles that, contamination shingles two inputs). Reintroducing
    # the bare-attribute explode adds an inferred size()>0 filter eval
    # per appearance, bumping every count.
    sig = "concat_ws( , slice("
    cases = [
        (ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5), 2),
        # containment pins its pair-level `shared` aggregate (lazy
        # localCheckpoint), so the shingle build sits behind a LogicalRDD
        # barrier in this plan — 0 visible evals; its single-eval path is
        # the same _explode_shingles helper the jaccard case pins above.
        (ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5, min_size=2), 0),
        (
            contamination_pairs(
                docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20),
                "doc_id", "doc_id", n=3, min_shared=3,
            ),
            2,
        ),
    ]
    for df, want in cases:
        plan = optimized(df)
        assert plan.count(sig) == want, plan

    # bm25: tokens build once per consumer subtree (stats, tf, and the
    # broadcast stats twin) — and NEVER below the fan_out repartition.
    plan = optimized(bm25_scores(docs, ["the", "and"]))
    assert plan.count("split(trim(") == 3, plan


def test_every_suite_query_plan_invariants(spark, sf_dir):
    """Suite-WIDE plan sweep (future-proofs the per-family pins): every
    declared query's physical plan must be free of CartesianProduct and
    row-at-a-time Python (BatchEvalPython) — Arrow stages and
    documented 1-row BroadcastNestedLoopJoin summaries are allowed —
    and no heavy array/text build may appear inside a scan-stage
    Filter (the InferFiltersFromGenerate / alias-substitution trap)."""
    import re

    heavy = re.compile(r"transform\(|aggregate\(|md5\(|split\(trim|concat_ws\( , slice")
    bad = []
    for name, q in suite.QUERIES.items():
        try:
            plan = _plan(q(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surface plan breakage
            bad.append((name, f"plan error: {e}"))
            continue
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            bad.append((name, "row-at-a-time Python UDF"))
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Filter" in ln and heavy.search(ln) and "FileScan" in "\n".join(lines[i : i + 4]):
                bad.append((name, "heavy expression in scan-stage filter"))
                break
    assert not bad, bad
