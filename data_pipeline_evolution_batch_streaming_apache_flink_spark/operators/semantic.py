"""Semantic deduplication (SemDeDup-style, Abbas et al. 2023):
cluster embeddings, then remove near-duplicates WITHIN each cluster.

The scalable alternative to the exact all-pairs embedding dedup
(``dedup.embedding_cosine_pairs``, a blocked O(n^2) scan): clustering
first makes the quadratic stage local to each (small) cluster, so total
pair work is ``sum(|cluster|^2)`` instead of ``n^2`` — the trade the
SemDeDup paper makes on billion-document corpora.

Everything is deterministic and engine-reproducible (it ships a DuckDB
oracle twin), which forces two departures from the paper's k-means:

- **exemplar clustering, not iterative k-means**: the ``k`` cluster
  centers are the rows with the smallest content-independent sampling
  hash (``curation.sample_hash`` of the id — a uniform random-but-
  reproducible draw). Every vector joins the broadcast exemplar set and
  takes the highest-cosine exemplar (round-6, id tiebreak). One
  broadcast join, no iteration, no floating-point accumulation order
  issues.
- **keep-first, not keep-centroid-closest**: within a cluster, a row is
  dropped iff some LOWER-id row in the same cluster has cosine >=
  threshold to it. First-occurrence-wins matches the engine's other
  dedup operators (``dedup_lines``, ``exact_dedup``).

Scale shape: exemplar selection is a global top-k (tiny), assignment is
a map-side broadcast join + ``max_by`` (one partial-aggregated shuffle
on the row id), the pair stage is an equi-join on ``cluster`` (one
shuffle), and the final removal is a broadcast-able anti-join.
``max_cluster`` bounds the quadratic stage against adversarial
all-identical corpora, mirroring ``max_bucket`` on the LSH operators:
oversize clusters are dropped from PAIR GENERATION (their rows are all
kept — recall trade, never a blow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import vectors as V
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.curation import sample_hash
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import (
    unpersist_local_checkpoint as _unpersist_local_checkpoint,
)

__all__ = ["assign_clusters", "kcenter_select", "kmeans_quantized", "semantic_dedup"]


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Assign every row to its nearest of ``k`` deterministic exemplars.

    Exemplars are the ``k`` rows with the smallest
    ``(sample_hash(id), id)`` — a reproducible uniform draw, computed
    with one global top-k (the sort output is ``k`` rows, never a
    collect). Assignment packs the exemplars into ONE broadcast row
    (id-sorted array of ``{id, vec}`` structs) and folds over it
    per input row — highest round-6 cosine wins, smallest exemplar id
    on ties. Zero shuffles: the assignment is a pure projection, which
    is what survives 100 TB (the broadcast-join + re-aggregate
    formulation would shuffle the full vector payload once).

    Returns the input plus a ``cluster`` column (the exemplar's id).

    ``id_col`` must be NUMERIC (integral): exemplar selection hashes it
    via ``sample_hash`` (a long cast) and the fold accumulator carries a
    bigint exemplar id — same documented requirement as
    ``label_propagation`` (review r7: a string id failed at plan time
    with an opaque DATATYPE_MISMATCH); map string ids to a numeric
    surrogate (e.g. xxhash64) upstream.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # norms are precomputed ONCE per side (cosine = dot / (|a|·|b|) with
    # cached norms is the same expression tree the oracle evaluates, just
    # not re-folded per candidate — 3x less fold work in the hot loop)
    exemplars = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy(sample_hash("id"), F.col("id"))
        .limit(k)
        .select("id", "vec", V.norm("vec").alias("nrm"))
        .agg(F.array_sort(F.collect_list(F.struct("id", "vec", "nrm"))).alias("__exs"))
    )

    def _fold_step(acc, e):
        cos6 = F.round(V.dot(F.col(vec_col), e["vec"]) / (F.col("__vnorm") * e["nrm"]), 6)
        better = cos6 > acc["bcos"]
        return F.when(
            better, F.struct(e["id"].alias("bid"), cos6.alias("bcos"))
        ).otherwise(acc)

    init = F.struct(
        F.lit(None).cast("long").alias("bid"), F.lit(-2.0).alias("bcos")
    )
    best = F.aggregate(F.col("__exs"), init, _fold_step)
    return (
        df.withColumn("__vnorm", V.norm(vec_col))
        .crossJoin(F.broadcast(exemplars))
        .withColumn("cluster", best["bid"])
        .drop("__exs", "__vnorm")
    )


#: Rows above which a cluster's pair stage runs as the exploded SQL
#: pair join instead of one numpy block in a single Python worker
#: (ADVICE r13): ``applyInPandas`` loads the whole cluster group —
#: |cluster| x dim float64 plus the Arrow frame — into one executor, so
#: a dominant cluster would OOM it where the pair join streams its
#: pairs. The two formulations produce identical drop sets (the r13
#: parity test pins block == pair join), so the gate is purely an
#: execution choice; 64k rows x 1024 dims is ~512 MB of matrix, a safe
#: single-task bound.
_SEMANTIC_BLOCK_MAX_ROWS = 65_536


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    threshold: float,
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup: cluster by exemplar, drop within-cluster near-dups.

    A row is removed iff a lower-id row in the SAME cluster has cosine
    >= ``threshold`` (round-6) to it. Returns the kept rows with their
    ``cluster`` assignment (all input columns preserved).

    ``max_cluster`` skips pair generation for clusters larger than that
    many rows (rows kept, never dropped) — the adversarial guard for
    corpora where one cluster swallows everything. Independent of the
    guard, clusters above ``_SEMANTIC_BLOCK_MAX_ROWS`` are scored by
    the streaming SQL pair join instead of the single-worker numpy
    block (identical results — see the gate's docstring), so an
    unguarded dominant cluster degrades to the quadratic join, never
    to an executor OOM.
    """
    # assigned feeds BOTH pair sides and the final anti-join: pin one
    # materialization (lazy, by RDD identity) or the per-row cosine fold
    # over k exemplars replays three times.
    assigned = assign_clusters(df, id_col, vec_col, k).localCheckpoint(eager=False)

    # pin: both pair sides scan pair_src, and the norm fold is O(dim)
    # per row — without the checkpoint it (and the projection) replays
    # once per side (review r7)
    pair_src = assigned.select(
        F.col(id_col).alias("__pid"),
        F.col(vec_col).alias("__pvec"),
        V.norm(vec_col).alias("__pnrm"),
        "cluster",
    ).localCheckpoint(eager=False)
    # Per-cluster sizes drive the max_cluster guard and the block-vs-
    # pair-join routing. There are at most k clusters (the exemplar
    # count), so the size table is a k-row aggregate over the pinned
    # pair_src — and the ROUTING decision is made DRIVER-SIDE from its
    # max (one small job against the checkpoint blocks): the common
    # case (no oversize cluster) then keeps the r13 plan byte-for-byte.
    # Plan-side routing was measured first (a count window, then
    # broadcast semi/anti-joins) and cost ~25% of warm wall for a
    # branch that virtually never carries rows.
    sizes = pair_src.groupBy("cluster").agg(F.count(F.lit(1)).alias("__csize"))
    if max_cluster is not None:
        sizes = sizes.filter(F.col("__csize") <= max_cluster)
        pair_src = pair_src.join(
            F.broadcast(sizes.select("cluster")), "cluster", "left_semi"
        )
    mx = sizes.agg(F.max("__csize")).head()[0] or 0

    # Within-cluster scoring as one numpy block pass per cluster (r13;
    # guide §4.2 — the exploded pair join evaluated an O(dim) SQL fold
    # per pair and was ~75% of warm wall). _fold_matmul reproduces
    # V.dot's left-fold summation order bit-for-bit (the cosine_topk
    # equivalence this module already relies on), the norms are the
    # SQL-computed __pnrm values unchanged, and the division is the
    # same single IEEE op — so raw scores are identical to the pair
    # join's. Python emits only pairs within 1e-6 slack of the
    # threshold; the exact HALF_UP 6dp rounding + threshold runs
    # JVM-side (house rounding discipline — numpy's round is
    # banker's, never used).
    import numpy as np
    import pandas as pd

    from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.dedup import _fold_matmul

    id_type = df.schema[id_col].dataType.simpleString()
    chunk = 1024  # bound the cos block at chunk x |cluster| doubles

    def _near_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"__did": pdf["__pid"].iloc[:0], "__cos": np.array([], dtype=np.float64)})
        pdf = pdf.sort_values("__pid", ignore_index=True)
        Vm = np.stack(pdf["__pvec"].to_numpy()).astype(np.float64)
        nrm = pdf["__pnrm"].to_numpy(dtype=np.float64)
        ids = pdf["__pid"].to_numpy()
        out_ids, out_cos = [], []
        for i0 in range(0, len(Vm), chunk):
            A = Vm[i0 : i0 + chunk]
            cos = _fold_matmul(A, Vm) / (nrm[i0 : i0 + chunk, None] * nrm[None, :])
            # strict upper triangle on the id-sorted order = id_a < id_b
            rows, cols = np.nonzero(
                (cos >= threshold - 1e-6)
                & (np.arange(len(Vm))[None, :] > (i0 + np.arange(len(A)))[:, None])
            )
            if len(rows):
                out_ids.append(ids[cols])
                out_cos.append(cos[rows, cols])
        if not out_ids:
            return pd.DataFrame({"__did": pdf["__pid"].iloc[:0], "__cos": np.array([], dtype=np.float64)})
        return pd.DataFrame({"__did": np.concatenate(out_ids), "__cos": np.concatenate(out_cos)})

    block_src = pair_src
    if mx > _SEMANTIC_BLOCK_MAX_ROWS:
        oversize = F.broadcast(
            sizes.filter(F.col("__csize") > _SEMANTIC_BLOCK_MAX_ROWS).select("cluster")
        )
        block_src = pair_src.join(oversize, "cluster", "left_anti")
    scored = block_src.groupBy("cluster").applyInPandas(
        _near_pairs, schema=f"__did {id_type}, __cos double"
    )
    doomed = scored.filter(F.round(F.col("__cos"), 6) >= threshold).select(
        F.col("__did").alias(id_col)
    )
    if mx > _SEMANTIC_BLOCK_MAX_ROWS:
        # oversize clusters: the streaming pair-join formulation (the
        # pre-r13 shape — bit-identical scores, see module docstring)
        big = pair_src.join(oversize, "cluster", "left_semi")
        a = big.select(
            F.col("__pid").alias("__id_a"), F.col("__pvec").alias("__va"),
            F.col("__pnrm").alias("__na"), "cluster",
        )
        b = big.select(
            F.col("__pid").alias("__id_b"), F.col("__pvec").alias("__vb"),
            F.col("__pnrm").alias("__nb"), "cluster",
        )
        cos6 = F.round(V.dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6)
        doomed_big = (
            a.join(b, "cluster")
            .filter(F.col("__id_a") < F.col("__id_b"))
            .filter(cos6 >= threshold)
            .select(F.col("__id_b").alias(id_col))
        )
        doomed = doomed.unionByName(doomed_big)
    return assigned.join(doomed.distinct(), id_col, "left_anti")


def kmeans_quantized(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means in exact integer space.

    The float pitfall with distributed k-means is that centroid means
    are order-of-accumulation dependent, so the same corpus gives
    different clusters on different partition layouts (and different
    engines). This variant quantizes vectors to micro-units
    (``round(x * 1e6)`` bigints) and does EVERYTHING in exact integer
    arithmetic — squared distances, argmin (id tiebreak), and centroid
    means via pmod floor-division — so the result is bit-identical
    under any layout and reproducible in plain SQL (the suite oracle
    runs the same iterations unrolled in DuckDB).

    Init: the ``k`` rows with the smallest ``md5(id)`` (a reproducible
    uniform draw), cluster ids 0..k-1 in hash order. ``iters`` counts
    ASSIGNMENT passes (updates run between them). Empty clusters drop
    out, shrinking k — standard Lloyd's behavior.

    Scale: per iteration, one broadcast cross join against k centroid
    rows (k is small by construction), one partial-aggregated shuffle
    on the point id for the argmin, one (cluster, dim) shuffle for the
    means. Distances fit bigint while ``dim * (2 * 1e6 * |x|max)^2``
    < 2^63 — i.e. comfortably for unit-norm embeddings up to thousands
    of dims. Centroid sums stay exact (integer DIV) at any count.

    Returns ``(assignments, centroids)``: assignments are
    ``(id, cluster int, dist_div bigint)`` with ``dist_div`` the final
    squared distance DIV 1e6 (overflow headroom for corpus-level
    inertia sums); centroids are ``(cluster, centroid_micro
    array<bigint>)``.
    """
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    quant = F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
    )
    # quantized points are read once per ASSIGNMENT pass plus once for
    # the init exemplars: pin one materialization (lazy, RDD identity)
    # so the corpus scan + micro-quantization never replay per iteration
    # — the MLlib cache-the-input pattern for iterative algorithms.
    pts = df.select(
        id_col, quant.alias("__v"), F.md5(F.col(id_col).cast("string")).alias("__h")
    ).localCheckpoint(eager=False)
    wk = Window.orderBy("__h")  # k rows only — the limit() below ran first
    cent = (
        pts.orderBy("__h").limit(k)
        .select((F.row_number().over(wk) - 1).alias("cid"), F.col("__v").alias("__c"))
    )
    pts = pts.drop("__h")

    dist = F.expr(
        "aggregate(zip_with(__v, __c, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (a, e) -> a + e)"
    )
    assigned = None
    for it in range(iters):
        assigned = (
            pts.crossJoin(F.broadcast(cent))
            .withColumn("__d", dist)
            .groupBy(id_col)
            .agg(F.min(F.struct("__d", "cid")).alias("__m"), F.first("__v").alias("__v"))
            .select(
                id_col,
                F.col("__m.cid").alias("cid"),
                F.col("__m.__d").alias("__d"),
                "__v",
            )
        )
        if it < iters - 1:
            sums = (
                assigned.select("cid", F.posexplode("__v").alias("pos", "val"))
                .groupBy("cid", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            )
            mu = sums.select("cid", "pos", F.expr("(s - pmod(s, c)) div c").alias("m"))
            cent = (
                mu.groupBy("cid")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                .select("cid", F.expr("transform(pm, p -> p.m)").alias("__c"))
            )
    out = assigned.select(
        id_col,
        F.col("cid").alias("cluster"),
        F.expr("__d div 1000000").alias("dist_div"),
    )
    centroids = cent.select(F.col("cid").alias("cluster"), F.col("__c").alias("centroid_micro"))
    return out, centroids


def kcenter_select(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Greedy farthest-point k-center coreset selection (Gonzalez 1985,
    the classic 2-approximation) — diversity-aware data selection: pick
    ``k`` maximally spread exemplars, then assign every point to its
    nearest exemplar. The coreset/facility-location shape of
    embedding-based training-data curation (cover the distribution with
    k representatives; per-exemplar groups then feed balanced sampling
    or dedup-by-representative).

    Determinism discipline matches :func:`kmeans_quantized`: vectors
    quantize to micro-int bigints and ALL distances are exact integer
    squared Euclidean, so selection and assignment are bit-identical
    under any layout and unroll into plain SQL. Seed: the minimum id.
    Each round picks the point FARTHEST from its nearest chosen center
    (max d2, id tiebreak, already-chosen ids excluded); assignment
    ties break to the earlier-chosen center (selection order).

    Scale shape: the greedy sweep is inherently k sequential passes —
    each is one narrow scan (id, vector, running d2) updating d2
    against ONE new center (a broadcast literal of d ints) plus a
    1-row argmax agg; the running frame is re-checkpointed per round
    so pass j never replays rounds 0..j-1, and the PRIOR round's
    checkpoint blocks are unpersisted as soon as the new one
    materializes (ADVICE r11 — storage stays at two live frames, not
    k). Driver round-trips: k
    single-row collects (the chosen exemplar + its vector). The final
    assignment is one broadcast cross join against the k-row center
    table. k is a SMALL constant by contract (guarded ≤ 256) — for
    thousands of centers use kmeans_quantized instead.

    Returns ``(id_col, center_id, center_order int, d2 bigint)`` —
    ``d2`` the exact squared micro-distance to the assigned center.
    Chosen exemplars appear with ``d2 = 0``; each is its own center
    UNLESS it duplicates an earlier exemplar's vector (possible only
    when the corpus has fewer distinct vectors than k), in which case
    the earlier-order tiebreak assigns it to that earlier center.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > 256:
        raise ValueError(
            f"k={k} exceeds the greedy k-center contract (<= 256 sequential "
            "passes); use kmeans_quantized for large center counts"
        )
    quant = F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
    )
    pts = df.select(id_col, quant.alias("__v")).localCheckpoint(eager=True)

    def _d2(center_vec: list) -> F.Column:
        lit = F.array(*[F.lit(int(x)).cast("bigint") for x in center_vec])
        return F.aggregate(
            F.zip_with("__v", lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda a, e: a + e,
        )

    seed = pts.select(F.min(F.struct(F.col(id_col).alias("i"), F.col("__v").alias("v")))).head()[0]
    if seed is None:
        raise ValueError("kcenter_select on an empty DataFrame")
    centers = [(seed["i"], seed["v"])]
    cur = pts.withColumn("__d2", _d2(seed["v"]))
    # Re-base (checkpoint) the running-min frame every REBASE rounds,
    # not every round (r14): a round's argmax can read the prior
    # checkpoint plus a short exact-integer ``least`` chain — bigint
    # min is associative, so the values are identical — which drops a
    # full corpus-frame checkpoint write (and its job) from 3 of every
    # 4 rounds. The chain is bounded at REBASE re-evaluated d2 folds
    # per row per round, a constant; the ADVICE-r11 unpersist
    # discipline is unchanged at the re-base points (two live frames,
    # never k). df.unpersist() is a no-op for localCheckpoint blocks
    # (the RDD is persisted outside the cache manager), so reach the
    # LogicalRDD's checkpointed RDD directly; never applied to
    # ``pts``, which the final assignment join still reads.
    REBASE = 4
    prev_ckpt: DataFrame | None = None
    pending = 0
    for _ in range(1, k):
        if pending >= REBASE:
            cur = cur.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                _unpersist_local_checkpoint(prev_ckpt)
            prev_ckpt = cur
            pending = 0
        chosen = [c for c, _ in centers]
        far = (
            cur.where(~F.col(id_col).isin(chosen))
            .select(F.min(F.struct(
                (-F.col("__d2")).alias("nd"),
                F.col(id_col).alias("i"),
                F.col("__v").alias("v"),
            )))
            .head()[0]
        )
        if far is None:
            break  # k exceeds the corpus: return the full point set as centers
        centers.append((far["i"], far["v"]))
        cur = cur.withColumn("__d2", F.least(F.col("__d2"), _d2(far["v"])))
        pending += 1
    if prev_ckpt is not None:
        _unpersist_local_checkpoint(prev_ckpt)  # the result reads only pts
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    cent_df = spark.createDataFrame(
        [(j, c, [int(x) for x in v]) for j, (c, v) in enumerate(centers)],
        f"center_order int, center_id {id_type}, __c array<bigint>",
    )
    paird = F.expr(
        "aggregate(zip_with(__v, __c, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (a, e) -> a + e)"
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__d2p").asc(), F.col("center_order").asc())
    return (
        pts.crossJoin(F.broadcast(cent_df))
        .withColumn("__d2p", paird)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "center_id", "center_order", F.col("__d2p").alias("d2"))
    )
