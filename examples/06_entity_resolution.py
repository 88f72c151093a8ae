"""End-to-end entity resolution: EM-train the Fellegi-Sunter model with
no labels, score blocked candidate pairs, cluster the links, and pick a
golden record per entity.

The master-data workflow behind Splink/dedupe-style pipelines, composed
from the engine's operators:

  1. fellegi_sunter_em   -- learn per-field m/u + the match prior from
                            the agreement-pattern histogram alone
  2. fellegi_sunter      -- score every same-block pair with the learned
                            per-mille weights (exact bigint log-weights)
  3. connected_components-- links -> entity clusters (min-label rounds)
  4. survivorship        -- one deterministic golden record per cluster

Run: python examples/06_entity_resolution.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_pipeline_evolution_batch_streaming_apache_flink_spark as eng
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import connected_components
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.linkage import (
    fellegi_sunter,
    fellegi_sunter_em,
)

from pyspark.sql import functions as F


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = eng.get_spark("example-er", cpus=8)

    # --- a dirty customer file: every 4th customer has a noisy twin ----
    base = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey",
        F.col("c_nationkey").alias("blk"),
        (F.col("c_custkey") % 10).alias("blk2"),
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
    bal = F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")
    orig = base.select(
        (F.col("c_custkey") * 2).alias("id"), "blk", "blk2",
        F.col("c_name").alias("name"), bal.alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    twin = base.filter(F.col("c_custkey") % 4 == 0).select(
        (F.col("c_custkey") * 2 + 1).alias("id"), "blk", "blk2",
        F.when(F.col("c_custkey") % 40 == 0, F.reverse("c_name"))
        .otherwise(F.col("c_name")).alias("name"),
        F.when(F.col("c_custkey") % 44 == 0, bal + 3).otherwise(bal).alias("bal"),
        F.when(F.col("c_custkey") % 28 == 0, F.lit("FLIPPED"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    records = orig.unionByName(twin)
    comps = [{"col": "name"}, {"col": "bal"}, {"col": "seg"}]

    # --- 1. unsupervised parameter training ---------------------------
    est = fellegi_sunter_em(records, "id", ["blk", "blk2"], comps, n_iter=25)
    est.show()
    e = {r["field"]: r for r in est.collect()}
    print(f"match prior lambda = {e['name']['lambda_micro'] / 1e6:.4%} "
          f"over {e['name']['n_pairs']} blocked pairs")

    # --- 2. score with the learned weights ----------------------------
    cfg = [
        {"col": c["col"], "m_pm": e[c["col"]]["m_pm"], "u_pm": e[c["col"]]["u_pm"], **(
            {"max_dist": c["max_dist"]} if "max_dist" in c else {}
        )}
        for c in comps
    ]
    scored = fellegi_sunter(
        records, "id", ["blk", "blk2"], cfg,
        upper_micro=5_000_000, lower_micro=0, max_block=2000,
    )
    links = scored.where("decision = 'link'")
    print("links:", links.count(), "| clerical-review:",
          scored.where("decision = 'possible'").count())

    # --- 3. links -> entity clusters ----------------------------------
    clusters = connected_components(links, "id_a", "id_b")

    # --- 4. survivorship: deterministic golden record per cluster -----
    golden = (
        records.join(clusters, records["id"] == clusters["node"], "left")
        .withColumn("entity", F.coalesce("comp", "id"))
        .groupBy("entity")
        .agg(
            F.min_by("name", "id").alias("name"),      # oldest record wins
            F.min_by("seg", "id").alias("seg"),
            F.count(F.lit(1)).alias("n_merged"),
        )
    )
    n_rec, n_ent = records.count(), golden.count()
    print(f"{n_rec} records -> {n_ent} entities "
          f"({golden.where('n_merged > 1').count()} merged clusters)")
    golden.orderBy(F.desc("n_merged"), "entity").show(5, truncate=False)

    # smoke oracle: ground truth is constructed (ids 2k / 2k+1 are the
    # only true matches), so precision/recall are measurable exactly.
    n_links = links.count()
    true_links = links.where(
        (F.col("id_a") % 2 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    n_twins = base.filter(F.col("c_custkey") % 4 == 0).count()
    prec = true_links / n_links if n_links else 0.0
    rec = true_links / n_twins if n_twins else 0.0
    assert prec >= 0.95, f"precision {prec:.1%}"
    assert rec >= 0.60, f"recall {rec:.1%}"
    # each merging link removes at least one entity; true twin links
    # are disjoint pairs so they remove exactly one each
    assert n_rec - n_links <= n_ent <= n_rec - true_links
    print(f"PASS: linkage precision {prec:.1%}, recall {rec:.1%} "
          f"against the constructed twins; entity count consistent")


if __name__ == "__main__":
    main()
