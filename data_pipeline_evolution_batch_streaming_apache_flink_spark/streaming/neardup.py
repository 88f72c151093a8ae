"""Streaming near-duplicate detection: incremental MinHash + LSH.

Batch near-dup (``operators/dedup.py minhash_lsh_pairs``) answers "which
pairs in this corpus are near-duplicates". The streaming question is
different: *as documents arrive, is each one a near-dup of anything
accepted before?* — the admission-control shape of a continuously
ingesting training-data pipeline (only novel documents enter the
corpus; duplicates are logged with their canonical twin).

foreachBatch incremental maintenance (the same engine shape as
``streaming/topn.py``):

- State = two partitioned parquet logs: the accepted-documents log
  (id, text) and the LSH band index (band, band_hash, id). No driver
  state.
- Each micro-batch: (1) intra-batch dedup first (batch
  ``minhash_lsh_pairs`` inside the batch; smallest id is canonical —
  deterministic regardless of arrival order within the batch);
  (2) surviving docs compute band hashes and equi-join the band index —
  only colliding buckets meet, linear candidate generation exactly as
  in batch LSH; (3) candidates verify with EXACT Jaccard against the
  accepted log's text (no false positives from signature noise);
  (4) novel docs append to both logs, duplicates emit
  (doc_id, dup_of, jaccard) decisions.

Same exactly-once contract as the other foreachBatch engines: per-epoch
overwrite directories + applied-epoch skip. At scale, bucket/partition
the band index by ``band_hash`` so the per-batch join prunes to
colliding partitions, and compact it periodically (`compact_files`).

MinHash family, band math, and verification all reuse the batch
operator's public pieces — the streaming path cannot drift from the
batch path's definition of "near-duplicate".

``dup_of`` points at the smallest near-duplicate partner, which inside
one batch may itself have been rejected (A<B<C with only A–B and B–C
similar: C records dup_of=B). That's a provenance CHAIN, the standard
greedy-streaming semantics; resolve chains to canonical roots offline
with ``operators/dedup.py near-dup clustering`` when needed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions.text import word_shingles
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
)


class StreamingNearDup:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        *,
        id_col: str,
        text_col: str,
        n: int = 5,
        threshold: float = 0.7,
        num_perm: int = 128,
        bands: int = 32,
        seed: int = 42,
    ):
        if num_perm % bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        self.spark = spark
        self.base = base_dir
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.threshold = threshold
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.seed = seed
        os.makedirs(base_dir, exist_ok=True)

    # -- plumbing (epoch-overwrite exactly-once) ---------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _write_epoch(self, df: DataFrame, path: str, epoch_id) -> None:
        if epoch_id is None:
            df.write.mode("append").parquet(path)
        else:
            df.write.mode("overwrite").parquet(os.path.join(path, f"e{int(epoch_id):010d}"))

    def _read(self, name: str, schema: str) -> DataFrame:
        path = self._path(name)
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )

    def _meta(self) -> dict:
        try:
            with open(self._path("meta.json")) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"last_epoch": None}

    def _save_meta(self, meta: dict) -> None:
        tmp = self._path("meta.json") + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._path("meta.json"))

    # -- band hashing -------------------------------------------------------
    def _band_rows(self, docs: DataFrame) -> DataFrame:
        """(id, band, band_hash) over a NORMALIZED (id, text) frame — one
        row per band per doc; the band hash folds the band's signature
        slice through xxhash64."""
        sig = minhash_signature("text", self.n, self.num_perm, self.seed)
        with_sig = docs.select("id", sig.alias("__sig"))
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.element_at("__sig", b * self.rows_per_band + r + 1)
                            for r in range(self.rows_per_band)
                        ],
                    ).alias("band_hash"),
                )
                for b in range(self.bands)
            ]
        )
        return with_sig.select("id", F.explode(bands).alias("bb")).select(
            "id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
        )

    # -- the micro-batch body ------------------------------------------------
    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        meta = self._meta()
        last = meta.get("last_epoch")
        if epoch_id is not None and last is not None and int(epoch_id) <= int(last):
            return

        batch = batch_df.select(
            F.col(self.id_col).alias("id"), F.col(self.text_col).alias("text")
        ).dropDuplicates(["id"]).localCheckpoint(eager=True)

        # 1. intra-batch: smallest id in each near-dup group is canonical
        intra = minhash_lsh_pairs(
            batch, "id", "text", self.n, self.threshold, self.num_perm, self.bands, self.seed
        ).localCheckpoint(eager=True)
        # a doc is a dup of the SMALLEST partner below it (deterministic)
        intra_dups = (
            intra.groupBy(F.col("id_b").alias("id"))
            .agg(F.min("id_a").alias("dup_of"), F.max("jaccard").alias("jaccard"))
        )
        survivors = batch.join(intra_dups.select("id"), "id", "left_anti")

        # 2. candidates vs the accepted index: band equi-join
        index = self._read("bands", "band int, band_hash long, id long")
        cand = (
            self._band_rows(survivors)
            .withColumnRenamed("id", "new_id")
            .join(index.withColumnRenamed("id", "old_id"), ["band", "band_hash"])
            .select("new_id", "old_id")
            .distinct()
        )

        # 3. exact verification against accepted text
        accepted = self._read("docs", "id long, text string")
        sh_new = survivors.select(
            F.col("id").alias("new_id"), word_shingles("text", self.n).alias("__sha")
        )
        sh_old = accepted.select(
            F.col("id").alias("old_id"), word_shingles("text", self.n).alias("__shb")
        )
        verified = (
            cand.join(sh_new, "new_id")
            .join(sh_old, "old_id")
            .withColumn(
                "jaccard",
                F.round(
                    F.size(F.array_intersect("__sha", "__shb"))
                    / F.size(F.array_union("__sha", "__shb")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= self.threshold)
        )
        # dup of the smallest matching accepted doc (deterministic)
        cross_dups = verified.groupBy(F.col("new_id").alias("id")).agg(
            F.min("old_id").alias("dup_of"), F.max("jaccard").alias("jaccard")
        )

        # 4. decisions + state updates
        novel = survivors.join(cross_dups.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        decisions = (
            novel.select("id", F.lit(None).cast("long").alias("dup_of"),
                         F.lit(None).cast("double").alias("jaccard"))
            .unionByName(intra_dups.select("id", "dup_of", "jaccard"))
            .unionByName(cross_dups.select("id", "dup_of", "jaccard"))
            .withColumn("__epoch", F.lit(int(epoch_id) if epoch_id is not None else 0).cast("long"))
        )
        self._write_epoch(decisions, self._path("out"), epoch_id)
        self._write_epoch(novel.select(F.col("id").cast("long"), "text"), self._path("docs"), epoch_id)
        self._write_epoch(
            self._band_rows(novel).select(
                F.col("band").cast("int"), F.col("band_hash").cast("long"), F.col("id").cast("long")
            ),
            self._path("bands"),
            epoch_id,
        )
        meta["last_epoch"] = int(epoch_id) if epoch_id is not None else None
        self._save_meta(meta)

    # -- results --------------------------------------------------------------
    def decisions(self) -> DataFrame:
        path = self._path("out")
        if not os.path.isdir(path):
            raise FileNotFoundError("no decisions emitted yet")
        return self.spark.read.option("recursiveFileLookup", "true").parquet(path)

    def accepted(self) -> DataFrame:
        return self._read("docs", "id long, text string")

    def run_available_now(self, stream_df: DataFrame) -> None:
        q = (
            stream_df.writeStream.foreachBatch(self.foreach_batch)
            .option("checkpointLocation", self._path("ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
