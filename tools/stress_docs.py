"""Documents scaling stress: replicate the documents corpus N× with
per-replica token mutation and time the text/dedup family at each
factor.

The mutation suffixes every token with the replica id, so replicas
share NO shingles with each other or the original — near-dup pair
count grows linearly with the factor (factor × base pairs), which
isolates PIPELINE scaling from pair-count explosion. Near-linear wall
growth is the evidence for the LSH/inverted-index claim in SCALE.md:
candidate generation is linear in corpus size, independent of the
quadratic pair space.

Usage: python tools/stress_docs.py [factors...]   (default: 1 4 16)
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
from data_pipeline_evolution_batch_streaming_apache_flink_spark.plans import suite

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "text_analysis", "tfidf_topterms",
    "bm25_scores", "contamination_check", "near_dedup",
    "chunk_documents", "bigram_topk", "quality_percentile", "temperature_mix",
    # round-4 additions: substring dedup, LM scoring, feature hashing —
    # replica token mutation keeps duplicated grams replica-local, so work
    # scales linearly with the corpus
    "duplicate_spans", "mask_dup_spans", "lm_scores", "hashed_features",
    # round-4 session-4: char entropy is row-local (linear by construction;
    # included to pin the constant)
    "char_entropy",
    # round-4 session-5: containment shares the inverted-index machinery
    # (replica-local shingles => linear candidates); html extraction is
    # row-local regexp work; global ids are the two-pass prefix sum
    "dedup_containment", "html_extract", "global_ids", "negative_sample",
    # round-4 session-6: winnowing grams are replica-local after token
    # mutation (linear candidates); NB's vocab/conditional table grows with
    # the mutated token universe — join keys scale, per-key state bounded
    "winnow_pairs", "nb_classify",
    # round-4 session-7: RAKE is doc_id-keyed end to end (linear); the Zipf
    # fit's rank stage is the two-pass prefix sum over the saturating-vocab
    # token histogram
    "rake_keywords", "zipf_fit",
    # round-10: DSIR profiles are bounded-width counted shuffles; scoring
    # is explode + broadcast join + per-doc sum — linear in the pool
    "dsir_weights",
    # round-11 (VERDICT r10 #6): unlike DSIR's fixed-n_buckets tables,
    # cross-LM's c2/c1 grow with the TARGET vocabulary and join-shuffle
    # against the pool's bigrams — replica token mutation grows both
    # sides linearly, the worst case for the c2 join
    "cross_lm_scores",
    # round-12 (VERDICT r11 #5): excess-loss inherits cross_lm's c2-join
    # caveat TWICE — the target-trained c2t AND the pool-trained c2s are
    # both shuffle-joined against the pool's bigrams (only the 1-row
    # vocab frames broadcast), and the self-model side's bigram table
    # grows with the pool itself under replica token mutation
    "excess_lm_scores",
    # round-12: the DoReMi-style reduction of the excess signal — one
    # extra id-keyed join + a counted shuffle onto domain keys on top
    # of excess_lm_scores; the 20-domain weight table is trivially
    # bounded, so any super-linearity would come from the excess pass
    "domain_mixture",
)


def build(spark, factor: int, out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    idspan = docs.agg(F.max("doc_id")).head()[0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__rep")
    toks = F.split(F.trim("text"), r"\s+")
    mutated = F.concat_ws(
        " ", F.transform(toks, lambda t: F.concat(t, F.lit("_"), F.col("__rep")))
    )
    out = (
        docs.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * idspan)
        .withColumn("text", F.when(F.col("__rep") == 0, F.col("text")).otherwise(mutated))
        .drop("__rep")
        .repartition(32)
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return spark.read.parquet(os.path.join(out_dir, "documents.parquet")).count()


def main() -> None:
    only: tuple[str, ...] | None = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = tuple(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    factors = [int(a) for a in args] or [1, 4, 16]
    spark = get_spark("stress-docs", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).mapInPandas(lambda it: it, "id long").count()  # warm python pool
    root = tempfile.mkdtemp(prefix="dpe_sdocs_")
    results: dict[str, dict[str, float]] = {}
    rows = {}
    try:
        for factor in factors:
            d = os.path.join(root, f"x{factor}")
            rows[factor] = build(spark, factor, d)
            results[str(factor)] = {}
            for q in (only or QUERIES):
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    suite.QUERIES[q](spark, d).write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
                results[str(factor)][q] = round(best, 2)
                print(f"x{factor:<3} ({rows[factor]:>7} docs) {q:<22} {best:6.2f}s", flush=True)
                # several suite queries localCheckpoint intermediates;
                # the ContextCleaner frees those blocks only after GC
                # notices the orphaned refs — nudge both runtimes so a
                # later timing never pays an earlier run's storage
                # eviction (same caveat as tools/stress_curation.py;
                # measured here as a monotonic ~1.5x drift across
                # back-to-back cross_lm_scores runs regardless of size)
                import gc

                gc.collect()
                spark.sparkContext._jvm.System.gc()
        print(json.dumps({"base": BASE, "docs": rows, "timings": results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
