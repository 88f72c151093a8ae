"""A/B the r9 index-build levers at replicated scale.

Usage: python tools/index_build_ab.py [multipliers...]   (default: 1 16)

Two comparisons per multiplier, digests checked where results must agree:

1. IVF-PQ build: the r9 sample-trained spherical quantizer
   (operators/similarity._fit_cells) vs the r8 path's cost driver —
   a pyspark.ml KMeans.fit on the same corpus (fit-only: the old
   assignment ran inside the same ML transform, so fit time is the
   honest lower bound of the old build's quantizer stage).
2. MinHash-LSH index write: auto band_parts (corpus-sized, r9) vs the
   old fixed band_parts=16, probe results digest-compared.

Corpora are the sf0.1 tables replicated with OFFSET ids (embeddings:
vec_id + i*N; documents: doc_id + i*N) so id-keyed logic sees distinct
rows. Vectors/texts repeat — irrelevant for build cost, and the probe
digest equality check only needs determinism, not diversity.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.session import get_spark


def replicated(df, id_col: str, mult: int):
    if mult == 1:
        return df
    n = df.count()
    parts = [df.withColumn(id_col, F.col(id_col) + F.lit(i * n)) for i in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 16]
    spark = get_spark("index-build-ab")
    emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
        lsh_probe_pairs,
        lsh_write_index,
    )
    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.similarity import (
        ivfpq_write_index,
    )

    # Warm the session before ANY timing (JVM codegen, netlib BLAS, the
    # Python/Arrow worker pool, parquet committer): without this the
    # first measured leg eats the one-time session costs and the A/B is
    # ordering-dependent.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    warm = emb0.limit(200).select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("__features")
    )
    KMeans(k=2, seed=1, featuresCol="__features").fit(warm)
    emb0.limit(200).write.mode("overwrite").parquet(tempfile.mkdtemp(prefix="ab_warm_"))
    emb0.limit(200).mapInPandas(lambda it: it, schema=emb0.schema).count()

    for m in mults:
        emb = replicated(emb0, "vec_id", m).localCheckpoint()
        print(f"--- x{m}: {emb.count()} vectors ---", flush=True)

        t0 = time.time()
        path = tempfile.mkdtemp(prefix=f"ab_ivfpq_x{m}_")
        ivfpq_write_index(emb, path, "vec_id", n_cells=8, m=16, n_centroids=32, seed=42)
        t1 = time.time()
        print(f"ivfpq_write_index (r9 sampled fit): {t1 - t0:.2f} s", flush=True)

        corpus_v = emb.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias("__features")
        )
        t2 = time.time()
        KMeans(k=8, seed=42, featuresCol="__features").fit(corpus_v)
        t3 = time.time()
        print(f"pyspark.ml KMeans.fit alone (r8 quantizer stage): {t3 - t2:.2f} s", flush=True)

        docs = replicated(docs0, "doc_id", m).localCheckpoint()
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        probe = docs.filter(F.col("doc_id") % 2 == 1).limit(500)
        digests = []
        for label, parts in (("auto (r9)", None), ("fixed 16 (r8)", 16)):
            t4 = time.time()
            p2 = tempfile.mkdtemp(prefix=f"ab_lsh_x{m}_")
            lsh_write_index(corpus, p2, "doc_id", "text", n=3, band_parts=parts)
            t5 = time.time()
            got = sorted(
                (r["query_id"], r["corpus_id"], r["jaccard"])
                for r in lsh_probe_pairs(
                    probe, p2, "doc_id", "text", threshold=0.5, n=3
                ).collect()
            )
            t6 = time.time()
            meta = spark.read.parquet(p2 + "/meta").head()
            digests.append(got)
            print(
                f"lsh_write_index {label}: build {t5 - t4:.2f} s, probe {t6 - t5:.2f} s,"
                f" band_parts={meta['band_parts']}, pairs={len(got)}",
                flush=True,
            )
        assert digests[0] == digests[1], "probe results must not depend on layout"
        print("probe digests identical across layouts", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
