"""Training-data pipeline operators on the driver testdata: dedup family,
similarity search, text analysis, multimodal plumbing.

Run: python examples/03_training_data_ops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
)
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.multimodal import attach_binary_payload, extract_image_features
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import cosine_topk
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import analyze_documents
from data_pipeline_evolution_batch_streaming_apache_flink_spark.sources.batch import read_parquet

from pyspark.sql import functions as F


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = eng.get_spark("example-llm", cpus=8)
    docs = read_parquet(spark, f"{sf}/documents.parquet")
    emb = read_parquet(spark, f"{sf}/embeddings.parquet")

    print("exact dedup keeps", exact_dedup(docs, "text", "doc_id").count(), "of", docs.count(), "docs")
    print("near-dup pairs (minhash-LSH, jaccard>=0.5):")
    minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.5).show(5)
    print("embedding near-dup pairs (cos>=0.45):")
    embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.45).show(5)
    print("top-3 neighbors of the first 5 vectors:")
    cosine_topk(emb.filter(F.col("vec_id") < 5), emb, "vec_id", "vec_id", k=3).show()

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
        pack_sequences,
        scrub_pii,
        stratified_sample,
    )

    toks = docs.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("t"))
    print("sequence packing (capacity 2048):")
    pack_sequences(toks, "doc_id", "t", 2048).orderBy("doc_id").show(5)
    print("stratified sample kept", stratified_sample(docs, "lang", {"en": 0.5, "zh": 0.1}, "doc_id").count(), "docs")
    print("PII scrub:")
    scrub_pii(docs.withColumn("text", F.concat("text", F.lit(" mail me at a@b.co"))), "text").select("doc_id", "n_email", "scrubbed").show(2, truncate=60)
    print("text profile:")
    analyze_documents(docs).show(5, truncate=60)
    print("multimodal features (fake decoder — codecs stubbed):")
    extract_image_features(attach_binary_payload(docs, "text")).show(5)

    print("near-dedup end-to-end (LSH pairs -> clusters -> drop non-canonical):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import near_dedup

    print("  kept", near_dedup(docs, "doc_id", "text", n=3, threshold=0.5).count(), "of", docs.count())

    print("composed prep pipeline (score -> dedup -> gate -> per-source stats):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans.suite import q_training_prep

    q_training_prep(spark, sf).show()

    print("gap-based sessions over the events clickstream:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sessions import session_stats, sessionize

    ev = read_parquet(spark, f"{sf}/events.parquet").select(
        "user_id", "event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    )
    session_stats(sessionize(ev, gap="30 minutes", tiebreak_cols=("event_id",))).show(5)

    print("benchmark decontamination (doc_id<20 as the stand-in eval set):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import contamination_pairs, decontaminate

    bench = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    contamination_pairs(train, bench, "doc_id", "doc_id", n=3, min_shared=3).show(5)
    print("decontaminated corpus:", decontaminate(train, bench, "doc_id", "doc_id", n=3, min_shared=3).count(), "of", train.count(), "train docs")

    print("BM25 keyword relevance (query: vector merge stream window):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.textops import bm25_scores

    bm25_scores(docs, ["vector", "merge", "stream", "window"]).orderBy(F.desc("bm25")).show(5)

    print("IVF-PQ (residual IVFADC) approximate neighbors:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import ivf_pq_topk

    ivf_pq_topk(
        emb.filter(F.col("vec_id") < 5), emb, "vec_id", "vec_id",
        k=3, n_cells=8, n_probe=4, m=16, n_centroids=32, refine=8,
    ).show()

    print("RAG chunking (64-token windows, 16 overlap):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
        chunk_documents,
        filter_by_percentile,
        temperature_resample,
    )

    chunk_documents(docs, size=64, overlap=16).show(3)

    print("quality gate: top 25% by length per language:")
    filter_by_percentile(
        docs.select("doc_id", "lang", "n_chars"), "n_chars", 0.25,
        partition_by="lang", tiebreak_col="doc_id",
    ).groupBy("lang").count().show()

    print("temperature rebalancing (alpha=0.5):")
    temperature_resample(docs, "lang", "doc_id", alpha=0.5).groupBy("lang").count().show()

    print("BPE tokenizer (64 merges learned from the word histogram):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.bpe import bpe_encode, bpe_train

    merges = bpe_train(docs, num_merges=64, max_words=8000)
    print("first merges:", merges[:8])
    bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens").show(5)

    print("int8 embedding quantization:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import quantize_int8

    quantize_int8(emb).select("vec_id", "dim", "scale", "err_1e9").show(5)

    print("CEP funnel (signup -> click -> purchase per user, relaxed contiguity):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.cep_sql import match_recognize

    events = read_parquet(spark, f"{sf}/events.parquet").select(
        "user_id", "event_id", "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    match_recognize(events, """
        PARTITION BY user_id
        ORDER BY ts_ms, event_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A -> B -> C)
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'click',
               C AS event_type = 'purchase'
    """).show(3)

    print("substring-level dedup: duplicated 5-gram spans:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import duplicate_spans

    duplicate_spans(docs, n=5).orderBy(F.col("n_dup_grams").desc()).show(5)

    print("portable sketches: HLL distinct users + CMS heavy hitters:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.sketches import approx_ndv, cms_lookup, cms_state

    approx_ndv(events, ["event_type"], "user_id", p=9).show()
    toks = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    state = cms_state(toks, "tok", depth=4, width=2048)
    probe = toks.groupBy("tok").count().orderBy(F.col("count").desc()).limit(5)
    cms_lookup(state, probe, "tok", depth=4, width=2048).show()

    print("corpus drift (PSI) between the two halves of the order history:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import psi_drift

    orders = read_parquet(spark, f"{sf}/orders.parquet")
    cutoff = F.lit("1998-01-01").cast("date")
    psi_drift(
        orders.where(F.col("o_orderdate") < cutoff),
        orders.where(F.col("o_orderdate") >= cutoff),
        "o_totalprice", 0.0, 500000.0, bins=8,
    ).orderBy("bucket").show()

    print("feature hashing (1024-dim sparse bag-of-words, zero shuffle):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.features import hashed_features

    hashed_features(docs, dim=1024, portable=False).select(
        "doc_id", F.slice("features", 1, 3).alias("first_features")
    ).show(3, truncate=False)

    print("deterministic k-means on the embeddings (exact integer space):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.semantic import kmeans_quantized

    assignments, centroids = kmeans_quantized(emb, k=4, iters=2)
    assignments.groupBy("cluster").count().orderBy("cluster").show()

    print("self-trained bigram LM: lowest-likelihood documents:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import bigram_lm, bigram_lm_scores

    c2, c1, vocab = bigram_lm(docs)
    bigram_lm_scores(docs, c2, c1, vocab).orderBy("avg_logp_micro").show(5)

    print("Gopher rule-based quality gate (per-rule auditable flags):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import gopher_rules

    flags = gopher_rules(docs, min_words=30, min_stopwords=1)
    flags.groupBy("passes").count().show()
    flags.where(~F.col("r_stopwords")).select("doc_id", "n_words").show(3)

    print("per-source z-score of document length (exact moments, clipped):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import standardize

    standardize(
        docs.select("doc_id", "source", F.col("n_chars").cast("double").alias("n_chars")),
        "n_chars", ["source"], clip=3.0,
    ).orderBy(F.col("z").desc_nulls_last()).show(3)

    print("PageRank over the customer-supplier purchase graph:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import pagerank

    orders_t = read_parquet(spark, f"{sf}/orders.parquet")
    li = read_parquet(spark, f"{sf}/lineitem.parquet")
    pairs = (
        orders_t.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.concat(F.lit("c"), "o_custkey").alias("c"),
                F.concat(F.lit("s"), "l_suppkey").alias("s")).distinct()
    )
    edges = pairs.selectExpr("c AS src", "s AS dst").union(pairs.selectExpr("s AS src", "c AS dst"))
    pagerank(edges, iterations=3).orderBy(F.col("rank_micro").desc()).show(5)

    print("supplier co-occurrence: strongest within-order associations (PMI):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.basket import cooccurrence_pmi

    obs = li.select(F.col("l_orderkey").alias("basket"), F.col("l_suppkey").alias("item"))
    cooccurrence_pmi(obs, "basket", "item", min_pair_count=2).orderBy(
        F.col("pmi_micro").desc()
    ).show(5)

    print("triangle census of the part co-purchase graph:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import triangle_stats

    b = li.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")).distinct()
    copurchase = (
        b.alias("l").join(b.alias("r"), (F.col("l.bk") == F.col("r.bk")) & (F.col("l.it") < F.col("r.it")))
        .groupBy(F.col("l.it").alias("src"), F.col("r.it").alias("dst"))
        .count().where("count >= 2").select("src", "dst")
    )
    triangle_stats(copurchase).show()

    print("character entropy: least-diverse documents (gibberish signal):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import char_entropy

    char_entropy(docs, max_chars=4000).orderBy("entropy_micro").show(3)

    print("Bloom-pruned probe: orders likely from BUILDING-segment customers:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.bloom import bloom_build, bloom_prune

    cust = read_parquet(spark, f"{sf}/customer.parquet")
    bloom = bloom_build(cust.where("c_mktsegment = 'BUILDING'"), "c_custkey", m=4096, k=3)
    pruned = bloom_prune(orders_t.select("o_orderkey", "o_custkey"), "o_custkey", bloom, m=4096, k=3)
    print(f"  probe kept {pruned.count()} of {orders_t.count()} orders before the real join")

    print("growth-stable train/val/test folds:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import dataset_split

    dataset_split(docs.select("doc_id"), "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)]) \
        .groupBy("split").count().orderBy("split").show()

    print("co-purchase influence spread of one brand (k-hop BFS census):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import k_hop_reach

    seeds = read_parquet(spark, f"{sf}/part.parquet").where("p_brand = 'Brand#4'").select("p_partkey")
    undirected = copurchase.union(copurchase.selectExpr("dst AS src", "src AS dst"))
    k_hop_reach(undirected, seeds, hops=3).show()

    print("URL hygiene: canonical keys collapse tracking-param/case variants:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions.url import canonical_url

    ev = read_parquet(spark, f"{sf}/events.parquet")
    messy = ev.select(
        F.concat(
            F.lit("https://Shop.Example.com/u/"), F.col("user_id"),
            F.lit("?utm_source=news&id="), F.get_json_object("props", "$.k"),
        ).alias("url")
    )
    messy.groupBy(canonical_url("url").alias("canon")).count().orderBy(
        F.col("count").desc()
    ).show(3, truncate=False)

    print("exact KS drift between event segments (no binning):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import ks_drift

    ks_drift(
        ev.where("event_type = 'view'"), ev.where("event_type = 'purchase'"), "value"
    ).show()

    print("near-superset containment: truncated twin caught at C=1.0:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import ngram_containment_pairs

    corpus = docs.select((F.col("doc_id") * 2).alias("doc_id"), "text").union(
        docs.limit(5).select(
            (F.col("doc_id") * 2 + 1).alias("doc_id"),
            F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 12), " ").alias("text"),
        )
    )
    ngram_containment_pairs(corpus, "doc_id", "text", n=3, threshold=0.9).show(5)

    print("dense global ids -> deterministic contrastive negatives:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import negative_sample

    negative_sample(docs.select("doc_id"), "doc_id", k=2, seed=7).show(5)

    print("PCA on embeddings (exact-integer covariance, deterministic):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.stats import pca_fit, pca_project

    emb = read_parquet(spark, f"{sf}/embeddings.parquet")
    model = pca_fit(emb, "embedding", k=4)
    print(f"  explained variance (top 4): {[round(float(v), 4) for v in model['explained_var']]}")
    pca_project(emb, "vec_id", "embedding", model).show(3)

    print("label-propagation communities on the purchase graph:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import label_propagation

    npairs = (
        orders_t.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select((F.col("o_custkey") * 2).alias("c"), (F.col("l_suppkey") * 2 + 1).alias("s"))
        .distinct()
    )
    nedges = npairs.selectExpr("c AS src", "s AS dst").union(npairs.selectExpr("s AS src", "c AS dst"))
    label_propagation(nedges, iterations=3).groupBy("label").count().orderBy(
        F.col("count").desc()
    ).show(5)

    print("HITS: which suppliers are authorities, which customers hubs:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.graph import hits, link_prediction

    dedges = npairs.selectExpr("c AS src", "s AS dst")
    hits(dedges, iterations=3).orderBy(F.col("auth_micro").desc()).show(5)

    print("link prediction: supplier pairs that share customers but no edge:")
    link_prediction(
        dedges.selectExpr("CAST(src AS STRING) AS src", "CAST(dst AS STRING) AS dst"),
        min_common=3, max_degree=40,
    ).orderBy(F.col("adamic_adar_micro").desc()).show(5)

    print("winnowing fingerprints localize shared boilerplate:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import winnow_pairs

    winnow_pairs(docs, "doc_id", "text", k=8, window=4, min_shared=2, max_df=5).orderBy(
        F.col("overlap_micro").desc()
    ).show(5)

    print("Naive Bayes language routing (train on 4/5, score the rest):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.classify import naive_bayes_classify

    naive_bayes_classify(
        docs.where("doc_id % 5 != 0"), docs.where("doc_id % 5 = 0"),
        "lang", "text", "doc_id",
    ).show(5)

    print("Fellegi-Sunter record linkage on nation-blocked customers:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.linkage import fellegi_sunter

    cust = read_parquet(spark, f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("blk"),
        F.col("c_name").alias("name"), F.col("c_mktsegment").alias("seg"),
    )
    fellegi_sunter(
        cust, "id", ["blk"],
        [{"col": "name", "m_pm": 900, "u_pm": 100, "max_dist": 2},
         {"col": "seg", "m_pm": 900, "u_pm": 200}],
        upper_micro=3_000_000, lower_micro=0,
    ).where("decision = 'link'").show(5)

    print("table digest before/after a rewrite (order-insensitive):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.quality import table_digest

    li_slim = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    d_before = table_digest(li_slim, ["l_orderkey", "l_linenumber", "l_returnflag"])
    d_after = table_digest(
        li_slim.repartition(17), ["l_orderkey", "l_linenumber", "l_returnflag"]
    )
    d_before.show()
    d_after.show()

    # smoke oracle: a pure layout rewrite must not move the digest
    assert tuple(d_before.collect()[0]) == tuple(d_after.collect()[0])
    print("PASS: table digest invariant under the repartition(17) rewrite")

    print("export: token-budget selection then size-balanced shards:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import (
        balanced_shards, budget_select,
    )

    weighted = docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("bytes"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000"
            " div greatest(CAST(size(split(text, ' ')) AS BIGINT), 1)"
        ).alias("quality_ppm"),
    )
    half = (weighted.agg(F.sum("bytes")).head()[0] or 0) // 2
    picked = budget_select(weighted, "quality_ppm", "bytes", half, "doc_id").where("selected")
    shards = balanced_shards(picked, "bytes", 4, "doc_id")
    manifest = shards.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("bytes").alias("total_bytes")
    ).orderBy("shard_id")
    manifest.show()
    stats = manifest.agg(
        F.max("total_bytes").alias("mx"), F.min("total_bytes").alias("mn")
    ).head()
    biggest = picked.agg(F.max("bytes")).head()[0]
    assert stats["mx"] - stats["mn"] <= biggest
    print("PASS: shard weight spread bounded by the largest single document")

    print("DSIR importance weights (target = the English slice) -> budget cut:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dsir import dsir_weights

    w = dsir_weights(docs, docs.where(F.col("lang") == "en"), n_buckets=256)
    scored = docs.select("doc_id", "lang", F.octet_length("text").alias("bytes")).join(
        w, "doc_id"
    )
    # the target-conditioned selection: best-by-weight under half the bytes
    half = (scored.agg(F.sum("bytes")).head()[0] or 0) // 2
    sel = budget_select(scored, "logw_micro", "bytes", half, "doc_id").where("selected")
    print("language mix of the DSIR-selected half (should skew English):")
    sel.groupBy("lang").count().orderBy(F.col("count").desc()).show()

    print("margin-based pair mining between two embedding pools:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import margin_mine

    mined = margin_mine(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
        "vec_id", "vec_id", knn_k=4,
    )
    mined.orderBy(F.col("margin_ppm").desc()).show(5)
    print("mutual best pairs:", mined.where("mutual").count(), "of", mined.count())

    print("soft dedup: near-dup clusters down-weighted instead of dropped:")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        ngram_jaccard_pairs,
        soft_dedup_weights,
    )

    sd_pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    weighted_docs = soft_dedup_weights(docs.select("doc_id"), sd_pairs, "doc_id")
    weighted_docs.groupBy("weight_ppm").count().orderBy("weight_ppm").show(5)

    print("cross-LM filter (CCNet shape: LM trained on the English slice):")
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.lm import bigram_lm, bigram_lm_scores

    c2m, c1m, vm = bigram_lm(docs.where(F.col("lang") == "en"))
    lm_out = bigram_lm_scores(docs, c2m, c1m, vm).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    print("avg log-likelihood by language (target language should lead):")
    lm_out.groupBy("lang").agg(F.avg("avg_logp_micro").alias("avg")).orderBy(
        F.col("avg").desc()
    ).show()


if __name__ == "__main__":
    main()
