"""Training-data curation operators: sequence packing, stratified
sampling, PII scrubbing (driver-mandated LLM-pipeline surface, BASELINE
"training-data pipeline" family — not in the reference).

All three are shuffle-disciplined for 100 TB corpora:

- :func:`pack_sequences` — GPT-style packing: documents are concatenated
  in a global order and cut every ``capacity`` tokens; a document belongs
  to the pack where it starts. The global running token sum uses a
  DISTRIBUTED prefix sum (range repartition → in-partition window →
  broadcast per-partition offsets), never a single-partition window.
- :func:`stratified_sample` — deterministic per-stratum rates via a
  Knuth multiplicative hash of the id, so any SQL engine reproduces the
  exact row set (no engine-specific hash, no rand()).
- :func:`scrub_pii` — email/URL/phone masking with plain
  ``regexp_replace`` chains: pure codegen'd JVM expressions, no UDF.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import is_exact_integral

#: Knuth multiplicative hash constants (public domain folklore): spread
#: is good enough for rate-threshold sampling and exactly reproducible in
#: any engine with 64-bit integer arithmetic.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Cumulative sum of ``value_col`` in global ``order_col`` order,
    computed scalably: range-repartition on the (unique) order key,
    window-cumsum within each partition, then add each partition's
    starting offset (per-partition totals — at most ``num_partitions``
    rows — are collected and rebroadcast: a bounded driver round-trip,
    the classic two-pass distributed prefix sum).

    The result is partitioning-independent (``order_col`` must be unique),
    so nondeterministic range bounds cannot change values.

    The range-partitioned input is materialized ONCE (localCheckpoint)
    before the two passes: without it, the totals collect and the final
    action would each re-execute the whole upstream — ruinous when the
    caller feeds an expensive pipeline (e.g. decontamination → scrub)
    into packing. Measured 2× on the composed curation query.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    n = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = ranged.withColumn("__loc", F.sum(value).over(w))
    # per-partition totals via sum of the VALUE, not max of the cumsum —
    # max would overstate totals whenever values can be negative
    totals = sorted(
        (r["__pid"], r["t"])
        for r in ranged.groupBy("__pid").agg(F.sum(value).alias("t")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in totals:
        offsets.append((pid, acc))
        acc += tot or 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    )
    return (
        local.join(off_df, "__pid", "left")
        .withColumn(out_col, F.col("__loc") + F.coalesce("__off", F.lit(0)))
        .drop("__pid", "__loc", "__off")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    tokens_col: str | Column,
    capacity: int,
    tokens_out: str = "n_tokens",
) -> DataFrame:
    """Assign each document to a fixed-capacity training pack: concatenate
    all token streams in ``order_col`` order and cut every ``capacity``
    tokens — a document belongs to the pack where its first token lands
    (the standard concat-and-chunk packing of LLM pretraining loaders).

    Output: input columns + ``n_tokens``, ``pack_id`` (0-based) and
    ``pack_offset`` (the document's start position within its pack).
    One range shuffle + one bounded driver round-trip (see
    :func:`global_running_sum`); no single-partition window at any size.
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    with_tok = df.withColumn(tokens_out, tokens.cast("long"))
    run = global_running_sum(with_tok, order_col, tokens_out, "__run")
    start = F.col("__run") - F.col(tokens_out)
    return (
        run.withColumn("pack_id", F.floor(start / F.lit(capacity)).cast("long"))
        .withColumn("pack_offset", (start % F.lit(capacity)).cast("long"))
        .drop("__run")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size overlapping token windows —
    the context-length chunking step of embedding/RAG indexing and
    fixed-window pretraining (size tokens per chunk, consecutive chunks
    share ``overlap`` tokens).

    A document with n tokens yields ``1 + ceil((n - size) / stride)``
    chunks (stride = size - overlap); the last chunk may be short, and a
    document never yields zero chunks. Entirely map-side (tokenize →
    ``explode(sequence(...))`` → ``slice``): zero shuffle, so at 100 TB
    it scales with input splits and the output stays partitioned with
    its parent documents.

    Output: ``id_col, chunk_id (0-based), chunk_text, chunk_tokens``.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not (0 <= overlap < size):
        raise ValueError(f"overlap must be in [0, size), got {overlap}")
    stride = size - overlap
    # NULL text behaves as empty text: one empty chunk, preserving the
    # documented "a document never yields zero chunks" invariant (review
    # r7: NULL propagated into sequence() and the document vanished,
    # breaking chunk-vs-document reconciliation downstream)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks).cast("long")
    # ceil((n - size) / stride) in exact integer arithmetic so any SQL
    # engine reproduces the chunk count bit-for-bit
    n_chunks = F.when(n <= size, F.lit(1).cast("long")).otherwise(
        F.floor((n - size + (stride - 1)) / F.lit(float(stride))).cast("long") + 1
    )
    start = F.col("chunk_id") * stride  # 0-based token offset of the chunk
    return (
        df.select(
            F.col(id_col),
            n.alias("__n"),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(F.slice("__toks", (start + 1).cast("int"), size), " ").alias("chunk_text"),
            F.least(F.lit(size).cast("long"), F.col("__n") - start).alias("chunk_tokens"),
        )
    )


def sample_hash(id_col: str | Column) -> Column:
    """Deterministic sampling hash in [0, 2^32): Knuth multiplicative on
    the id folded to 31 bits first — ``((id % 2^31) * 2654435761) % 2^32``.
    The fold keeps the product under 2^63 for EVERY int64 id, so Spark
    (wrapping long arithmetic) and any exact-arithmetic SQL engine
    (DuckDB hugeint) compute the identical value at any corpus size."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    folded = F.pmod(c.cast("long"), F.lit(2147483648))
    return F.pmod(folded * F.lit(_KNUTH), F.lit(_MOD))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate, decided by a deterministic
    hash threshold — reproducible across engines and retries (no
    ``rand()``), map-side only (zero shuffle), and exact per-row so the
    same id always makes the same cut at any scale."""
    rate: Column = F.lit(default_rate)
    for value, r in sorted(rates.items(), key=lambda kv: (kv[0] is not None, kv[0])):
        matched = (
            F.col(stratum_col).isNull() if value is None else F.col(stratum_col) == value
        )
        rate = F.when(matched, F.lit(r)).otherwise(rate)
    return df.filter(sample_hash(id_col) < rate * F.lit(float(_MOD)))


def dataset_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint fold assignment (train/val/test): each row
    gets the first split whose cumulative hash threshold its
    :func:`sample_hash` falls under. The thresholds are EXACT integer
    literals (``floor(cum_fraction * 2^32)`` computed once in Python),
    so fold membership is reproducible across engines, retries, layouts
    and corpus growth — adding documents never moves an existing
    document between folds, which is the property that keeps eval sets
    honest as a corpus is re-crawled.

    ``splits`` is an ordered list of ``(name, fraction)``; fractions
    must be positive and sum to at most 1 (+1e-9 slack). If they sum to
    less than 1, the remaining hash range gets a NULL ``out_col`` —
    held-out rows, filterable. Map-side only: zero shuffle, zero UDF.
    """
    if not splits:
        raise ValueError("splits must be a non-empty list of (name, fraction)")
    total = 0.0
    cuts: list[tuple[str, int]] = []
    for name, frac in splits:
        if frac <= 0:
            raise ValueError(f"split {name!r} has non-positive fraction {frac}")
        total += frac
        cuts.append((name, min(int(total * _MOD), _MOD)))
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total}, must be <= 1")
    h = sample_hash(id_col)
    expr: Column = F.lit(None).cast("string")
    for name, cut in reversed(cuts):
        expr = F.when(h < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    rate: float,
    id_col: str,
) -> DataFrame:
    """Quality-weighted Poisson sampling: keep each row independently
    with probability ``min(1, weight * rate)``, decided by the same
    deterministic hash threshold as :func:`stratified_sample` — the
    standard curation move of up-weighting high-quality documents in a
    pretraining mixture with CONTINUOUS per-row weights (a quality-model
    score) rather than per-stratum rates.

    Map-side only (zero shuffle), reproducible across engines, retries
    and layouts; negative/null weights mean probability 0. The expected
    output size is ``sum(clamp(w * rate))`` rows — callers tune ``rate``
    against the weight scale, they do not get a fixed-size sample (use
    :func:`take_per_stratum` for exact counts)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    prob = F.least(F.greatest(w.cast("double") * F.lit(float(rate)), F.lit(0.0)), F.lit(1.0))
    return df.filter(sample_hash(id_col) < prob * F.lit(float(_MOD)))


def take_per_stratum(
    df: DataFrame,
    stratum_col: str,
    n: int,
    id_col: str,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample — the fixed-budget
    mixture companion to rate-based :func:`stratified_sample` (hit a
    target domain mix with exact document counts): rows rank inside each
    stratum by the sampling hash (id tiebreak) and the first ``n``
    survive. When ``counts`` is given it is EXHAUSTIVE: each stratum
    keeps ``counts[stratum]`` rows and strata absent from the dict are
    DROPPED entirely (``n`` is ignored) — pass every stratum you want in
    the mixture. The same rows are chosen by any engine at any layout
    (no rand(), no limit()); one shuffle for the rank window."""
    w = Window.partitionBy(stratum_col).orderBy(sample_hash(id_col), F.col(id_col))
    ranked = df.withColumn("__rn", F.row_number().over(w))
    if counts is not None:
        limit: Column = F.lit(0)
        for value, c in sorted(counts.items()):
            limit = F.when(F.col(stratum_col) == value, F.lit(c)).otherwise(limit)
    else:
        limit = F.lit(n)
    return ranked.filter(F.col("__rn") <= limit).drop("__rn")


#: Scrub patterns, applied in order (URLs before emails so the email
#: regex never fires inside an already-masked URL; phones last). RE2-safe
#: so Spark (Java regex) and DuckDB (RE2) agree.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d[\d-]{7,}\d", "<PHONE>"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "scrubbed",
    count_hits: bool = True,
) -> DataFrame:
    """Mask URLs, emails and phone numbers in ``text_col`` (chained
    ``regexp_replace`` — codegen'd, no Python in the path). With
    ``count_hits`` each pattern also emits ``n_<name>`` match counts
    (counted on the original text, before masking)."""
    out = df
    if count_hits:
        for name, pat, _ in PII_PATTERNS:
            out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(out_col, scrubbed)


def filter_by_percentile(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    partition_by: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep the top ``keep_frac`` fraction of rows by ``score_col`` —
    the percentile quality gate of pretraining curation (drop the
    bottom X% by quality-model score), optionally per group
    (``partition_by``, e.g. per language so one language's score scale
    never starves another).

    Exact, not approximate — no sampled-quantile drift between runs.
    Grouped: ``row_number`` over the per-group sort plus the group count
    (both windows share one shuffle on the group key); the keep test is
    ``rank / N <= keep_frac``. Review r7: the earlier ``cume_dist``
    formulation assigned a whole score-tie group one value, so without a
    tiebreak a tie group straddling the boundary was kept or dropped en
    bloc — quantized quality scores could silently starve a group.
    Ungrouped: a DISTRIBUTED global rank (range shuffle on the score +
    in-partition ``row_number`` + broadcast partition offsets — the
    :func:`global_running_sum` pattern), NEVER a single-partition global
    window; the keep test is the identical division.

    ``tiebreak_col`` (pass a unique id) makes rank order — and
    therefore the kept set — deterministic under score ties; without
    it the kept COUNT is still exact but which tied row survives is
    layout-dependent, so a warning is emitted whenever rows can
    actually be dropped (ADVICE r8: quantized quality scores tie
    often, and a silently nondeterministic kept SET violates the
    framework's determinism guarantees — there is no stable internal
    tiebreak to default to, monotonically_increasing_id is itself
    layout-dependent).
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if tiebreak_col is None and keep_frac < 1.0:
        warnings.warn(
            "filter_by_percentile without tiebreak_col: score ties straddling "
            "the keep boundary make the kept SET layout-dependent (the kept "
            "count stays exact). Pass a unique id column as tiebreak_col for "
            "a deterministic result.",
            stacklevel=2,
        )
    order = [F.col(score_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    if partition_by is not None:
        wp = Window.partitionBy(partition_by)
        return (
            df.withColumn("__rn", F.row_number().over(wp.orderBy(*order)))
            .withColumn("__n", F.count(F.lit(1)).over(wp))
            .filter((F.col("__rn") / F.col("__n")) <= keep_frac)
            .drop("__rn", "__n")
        )
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n_part, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    )
    if not sizes:
        return df
    offsets, acc = [], 0
    for pid, c in sizes:
        offsets.append((pid, acc))
        acc += c
    total = acc
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        ranged.withColumn("__lrank", F.row_number().over(w))
        .join(off_df, "__pid")
        .filter((F.col("__lrank") + F.col("__off")) / F.lit(float(total)) <= keep_frac)
        .drop("__pid", "__lrank", "__off")
    )


def temperature_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    alpha: float = 0.7,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-corpus
    resampling of XLM-R / mT5: sample languages proportional to
    ``p_l^alpha`` so low-resource strata are up-weighted relative to
    their raw frequency). ``alpha=1`` keeps the natural distribution;
    ``alpha=0`` targets uniform.

    Computes per-stratum counts (one small aggregate), derives each
    stratum's keep-rate toward the temperature-adjusted target — out of
    a total ``budget`` rows (default: the largest budget with every
    rate <= 1, i.e. pure downsampling) — then applies the deterministic
    hash threshold of :func:`stratified_sample` map-side. Rates are
    rounded to 6dp so any engine derives the identical row set.

    Default-budget rates use the closed form ``(n_min / n_s)^(1-alpha)``
    — the weight normalizer cancels algebraically, so no order-dependent
    double summation enters the rate (the smallest stratum keeps rate
    1.0 exactly). With an explicit ``budget`` the normalizer is summed
    in sorted-stratum order for run-to-run determinism.

    Strata counts land on the driver (bounded: one row per stratum —
    languages/domains, not documents).
    """
    if not 0.0 <= alpha <= 1.0:
        # alpha > 1 makes every rate clamp to 1.0 (a silent no-op), alpha
        # < 0 produces nonsense rates (review r7)
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("s")).agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return df
    if budget is None:
        n_min = min(counts.values())
        rates = {
            s: round(min(1.0, (n_min / n) ** (1.0 - alpha)), 6) for s, n in counts.items()
        }
    else:
        # None-safe stratum sort: a NULL stratum (routine in crawl tags)
        # is its own stratum, ordered first (review r7: sorted() raised
        # TypeError comparing None with str)
        skey = lambda kv: (kv[0] is not None, kv[0])
        weights = {s: (n / total) ** alpha for s, n in sorted(counts.items(), key=skey)}
        wsum = sum(w for _s, w in sorted(weights.items(), key=skey))
        targets = {s: weights[s] / wsum for s in counts}  # temperature-adjusted shares
        rates = {
            s: round(min(1.0, targets[s] * float(budget) / counts[s]), 6) for s in counts
        }
    return stratified_sample(df, stratum_col, rates, id_col, default_rate=0.0)


def repeat_dataset(
    df: DataFrame,
    weight: float,
    id_col: str,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch repetition for pretraining-mixture weights > 1:
    ``weight=2.3`` emits every row twice plus a deterministic 30%
    subset a third time — how high-quality subsets are oversampled in
    published data recipes (weights like "1.5 epochs of books").

    ``epoch_col`` numbers the repetitions (0-based) so downstream
    shuffling/curriculum can tell copies apart. The fractional cut uses
    the same Knuth hash threshold as :func:`stratified_sample`:
    map-side only, zero shuffle, identical decisions on any engine,
    layout, or retry. ``weight < 1`` degenerates to pure subsampling
    (epoch 0 only), weight 0 to an empty frame.
    """
    if weight < 0:
        raise ValueError(f"weight must be >= 0, got {weight}")
    n_full = int(weight)
    frac = weight - n_full
    copies = F.lit(n_full) + F.when(
        sample_hash(id_col) < F.lit(float(round(frac * _MOD))), F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(0, copies-1) would generate a DESCENDING [0, -1] when
    # copies = 0 (Spark auto-negative step) — guard to an empty array so
    # zero-copy rows drop out of the explode
    seq = F.when(copies > 0, F.sequence(F.lit(0), copies - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_col, F.explode(seq))


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    mean_span: int = 3,
) -> DataFrame:
    """T5/UL2-style span corruption, deterministic: mask ~``mask_rate``
    of each document's tokens in spans of mean length ``mean_span``,
    emitting the (input with sentinels, target of masked spans) pair
    the denoising objective trains on.

    Span starts are chosen per token position by the engine's Knuth
    hash on ``id * 1000003 + pos`` (start probability =
    mask_rate / mean_span); each start draws a length uniform in
    ``[1, 2*mean_span - 1]`` from a second salt. Overlapping spans
    merge; sentinels number left to right (``<extra_id_0>`` ...), the
    same ids in input and target — everything reproducible on any
    engine/layout/retry, no rand().

    One narrow explode + one per-doc shuffle for the island merge and
    ordered reassembly. Returns ``(id, input_text, target_text,
    n_masked)``; documents with no span selected pass through with an
    empty target.
    """
    if not 0 < mask_rate < 1:
        raise ValueError(f"mask_rate must be in (0, 1), got {mask_rate}")
    if mean_span < 1:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")
    start_p = mask_rate / mean_span
    width = 2 * mean_span - 1

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = df.select(id_col, F.posexplode(toks).alias("pos", "tok"))
    # fold the id to 31 bits BEFORE the salt multiply: id * 1000003 would
    # overflow int64 (ANSI abort) for ids above ~9.2e12, and the fold is
    # congruent mod 2^31 so every hash value is unchanged (review r7)
    folded_id = F.pmod(F.col(id_col).cast("long"), F.lit(2147483648))
    h1 = sample_hash(folded_id * 1000003 + F.col("pos"))
    h2 = sample_hash(folded_id * 1000033 + F.col("pos"))
    starts = tok.withColumn("__start", h1 < F.lit(float(round(start_p * _MOD)))).withColumn(
        "__len", (h2 % width + 1).cast("int")
    )
    covered = (
        starts.where("__start")
        .select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.col("__len") - 1)).alias("pos"),
        )
        .distinct()
    )
    marked = tok.join(covered.withColumn("__cov", F.lit(1)), [id_col, "pos"], "left")

    w = Window.partitionBy(id_col).orderBy("pos")
    prev_cov = F.lag("__cov").over(w)
    # span id: running count of covered-run starts (covered token whose
    # predecessor is uncovered)
    flagged = marked.withColumn(
        "__spanstart",
        F.when(F.col("__cov").isNotNull() & (prev_cov.isNull()), 1).otherwise(0),
    ).withColumn(
        "__spanid",
        F.sum("__spanstart").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    piece = F.when(
        F.col("__cov").isNull(), F.col("tok")
    ).when(F.col("__spanstart") == 1, F.concat(F.lit("<extra_id_"), (F.col("__spanid") - 1).cast("string"), F.lit(">")))
    inp = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(piece.isNotNull(), F.struct("pos", piece.alias("p")))
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("input_text"),
        F.sum(F.when(F.col("__cov").isNotNull(), 1).otherwise(0)).alias("n_masked"),
    )
    tgt_piece = F.when(
        F.col("__spanstart") == 1,
        F.concat(F.lit("<extra_id_"), (F.col("__spanid") - 1).cast("string"), F.lit("> "), F.col("tok")),
    ).when(F.col("__cov").isNotNull(), F.col("tok"))
    tgt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(tgt_piece.isNotNull(), F.struct("pos", tgt_piece.alias("p"))))
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("target_text")
    )
    return inp.join(tgt, id_col).select(id_col, "input_text", "target_text", "n_masked")


def curriculum_order(
    df: DataFrame,
    score_col: str,
    shards: int = 32,
    ascending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Globally order a corpus by a difficulty/quality score into
    ``shards`` range shards for curriculum training (easy-first or
    hard-first): shard *i* holds strictly easier rows than shard *i+1*
    and rows are sorted within each shard, so writing per-shard files
    yields a globally ordered dataset without a single-partition sort.

    Implementation is ``repartitionByRange`` (distributed sampled range
    boundaries — the standard total-order-partitioner shape) followed
    by an in-partition sort; ``curriculum_shard`` exposes the shard id
    for file naming. Boundary placement comes from Spark's reservoir
    sample, so exact shard SIZES can vary run to run while the global
    ORDER guarantee always holds — don't key determinism-sensitive
    logic off the shard id.
    """
    cols = [F.col(score_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    if not ascending:
        cols = [c.desc() for c in cols]
    out = df.repartitionByRange(shards, *cols).sortWithinPartitions(*cols)
    return out.withColumn("curriculum_shard", F.spark_partition_id())


def assign_global_ids(
    df: DataFrame,
    order_by: str | Column | list[str | Column],
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense, contiguous, 0-based global row ids in a total order — the
    stable-id primitive every sharded training corpus needs (shard
    manifests, resumable loaders, example-level provenance).

    Why not the two obvious Spark spellings:

    - ``monotonically_increasing_id()`` is sparse and layout-dependent —
      re-reading the same data with a different split plan renumbers
      everything;
    - ``row_number() OVER (ORDER BY ...)`` with no partition key collapses
      the whole dataset into ONE task — a non-starter at 100 TB.

    This is :func:`global_running_sum` with value 1 (range repartition →
    in-partition window → add per-partition offsets; one range shuffle +
    a ≤ num_partitions-row driver round-trip), so ids are independent of
    input layout provided ``order_by`` forms a UNIQUE key (include a
    tiebreaker column; descending order = negate a numeric component).
    """
    cols = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    tagged = df.withColumn("__ord", F.struct(*cols))
    out = global_running_sum(tagged, "__ord", F.lit(1).cast("long"), out_col, num_partitions)
    return out.withColumn(out_col, (F.col(out_col) - 1).cast("long")).drop("__ord")


def balanced_shards(
    df: DataFrame,
    weight_col: str | Column,
    n_shards: int,
    tiebreak_col: str | Column,
    out_col: str = "shard_id",
) -> DataFrame:
    """Assign each row to one of ``n_shards`` output shards so the shard
    TOTAL WEIGHTS come out near-equal — the export step of a training
    pipeline (size-balanced WebDataset/TFRecord shards: every reader in
    a data-parallel job gets the same amount of work). Returns the input
    plus ``out_col`` in [0, n_shards).

    Snake (boustrophedon) round-robin over the global (weight DESC,
    tiebreak ASC) rank: each "round" of ``n_shards`` consecutive ranks
    deals one row to every shard, alternating direction between rounds,
    so row counts per shard never differ by more than one and the
    descending order + direction flip cancel the within-round bias —
    the folded-deal guarantee that the total-weight spread is bounded by
    a single row's weight, independent of corpus size. Distinct from
    :func:`pack_sequences` (fixed-CAPACITY packs, documents split across
    pack boundaries, pack count data-dependent) and
    :func:`curriculum_order` (ordered range shards: deliberately
    UNbalanced by weight).

    Cost: one global rank (:func:`assign_global_ids` — range shuffle +
    in-partition window + a bounded driver round-trip, never a
    single-partition window) and pure arithmetic. Deterministic and
    layout-independent provided ``tiebreak_col`` completes a unique key;
    ``weight_col`` must be non-null numeric (it is negated for the
    descending range sort)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    tb = F.col(tiebreak_col) if isinstance(tiebreak_col, str) else tiebreak_col
    # negate in the INPUT type: a double cast would collapse the order of
    # integer weights past 2^53
    ranked = assign_global_ids(df, [-w, tb], "__rank")
    rnd = F.expr(f"__rank div {n_shards}")
    pos = F.pmod("__rank", F.lit(n_shards))
    shard = F.when(F.pmod(rnd, F.lit(2)) == 0, pos).otherwise(
        F.lit(n_shards - 1) - pos
    )
    return ranked.withColumn(out_col, shard.cast("int")).drop("__rank")


def budget_select(
    df: DataFrame,
    score_col: str | Column,
    cost_col: str | Column,
    budget: int,
    tiebreak_col: str | Column,
    keep_col: str = "selected",
    partition_by: str | None = None,
) -> DataFrame:
    """Greedy selection under a total COST budget: walk the corpus in
    (score DESC, tiebreak ASC) order and keep rows while the running cost
    stays within ``budget`` — the token-budget data-selection step of
    pretraining curation ("give me the best N-billion-token subset by
    quality score"), the knapsack relaxation every selection paper
    reduces to at corpus scale.

    Returns the input plus boolean ``keep_col``. A row is selected iff
    its own cost still fits after all strictly-better rows: running sum
    INCLUSIVE of the row <= budget — so one oversized row mid-order is
    skipped and does NOT unblock later rows (its cost stays counted;
    the cut is a prefix of the quality order, exactly reproducible in
    SQL). Deciding instead to re-fill past a skipped row would make the
    decision for row k depend on k's predecessors' individual fits — a
    sequential scan, not a prefix sum — and differ from every SQL twin;
    the prefix rule is the standard, shuffle-disciplined formulation.

    ``partition_by``: apply the budget PER GROUP instead of globally —
    the per-source quota of mixture control ("at most N tokens from any
    one domain/feed, best-first"). The grouped prefix sum is a plain
    partitioned window (one hash shuffle on the group key, no global
    structure needed); the global case needs the distributed two-pass
    prefix sum because there is no partition key to bound the window.

    Distinct from :func:`filter_by_percentile` (keep a FRACTION of rows,
    cost-blind) and :func:`weighted_sample` (randomized). Cost: one
    global prefix sum (:func:`global_running_sum` via
    :func:`assign_global_ids`'s struct ordering — range shuffle +
    bounded driver round-trip), pure arithmetic after.

    ``score_col`` must be non-null numeric (negated for the descending
    sort); ``tiebreak_col`` must complete a unique key (within the
    group, when grouped) or the cut row is layout-dependent;
    ``cost_col`` must be non-null, non-negative and of an INTEGRAL type
    (the prefix sum runs in exact int64 on both engines — a fractional
    cost would be truncated per row before summing, changing which rows
    fit; micro-scale fractional costs to an integer unit first, e.g.
    milli-tokens, the same contract as :func:`calibration_bins`)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    c = F.col(cost_col) if isinstance(cost_col, str) else cost_col
    tb = F.col(tiebreak_col) if isinstance(tiebreak_col, str) else tiebreak_col
    # ADVICE r9: .cast('long') on a fractional cost silently truncates
    # each row toward zero BEFORE the prefix sum — reject at plan time.
    # ADVICE r10: decimal(p, 0) is exact-integral (no truncation
    # possible) and passes; fractional decimals stay rejected.
    cost_dt = df.select(c.alias("__c")).schema[0].dataType
    if not is_exact_integral(cost_dt):
        raise TypeError(
            f"budget_select cost_col must be an exact integral type "
            f"(byte/short/int/long or decimal(p, 0)), got "
            f"{cost_dt.simpleString()}: per-row truncation before the prefix "
            f"sum would change which rows fit the budget — micro-scale to an "
            f"integer unit (e.g. milli-tokens) first"
        )
    if partition_by is not None:
        w = (
            Window.partitionBy(partition_by)
            .orderBy(s.desc(), tb.asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(
            keep_col, F.sum(c.cast("long")).over(w) <= F.lit(int(budget))
        )
    # negate in the INPUT type (a double cast would collapse integer
    # scores past 2^53)
    tagged = df.withColumn("__ord", F.struct((-s).alias("s"), tb.alias("t")))
    run = global_running_sum(tagged, "__ord", c.cast("long"), "__run")
    return (
        run.withColumn(keep_col, F.col("__run") <= F.lit(int(budget)))
        .drop("__ord", "__run")
    )


def negative_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    seed: int = 1,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: ``k``
    pseudo-random partner rows per anchor WITHOUT a cross join.

    The trick is :func:`assign_global_ids`: dense 0..N-1 ids turn "a
    random row of the corpus" into "the row at a computed index" — an
    EQUI-join on ``pick == idx`` (one hash shuffle per side, uniform
    keys), where a naive formulation is an N×N sample. The draw is the
    same overflow-safe integer arithmetic as :func:`sample_hash`
    (Knuth multiplicative + a per-draw offset, every step exact in
    int64 on both engines), so the sample is reproducible across runs,
    layouts, and engines — the property replay-debugging a training
    run depends on.

    An anchor never draws itself: self-collisions are dropped, so a few
    anchors carry k-1 negatives (deterministically — rerunning cannot
    resurrect them). Filter known positives downstream with an
    anti-join on (anchor_id, neg_id) before use.

    Returns (anchor_id, j, neg_id) with j in [0, k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ids = assign_global_ids(df.select(id_col), id_col, "__idx")
    n = ids.count()
    if n < 2:
        raise ValueError(f"need at least 2 rows to draw negatives, got {n}")
    draws = (
        ids.select(F.col(id_col).alias("anchor_id"))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(
            "__pick",
            F.pmod(
                F.pmod(
                    F.pmod(F.col("anchor_id").cast("long"), F.lit(2147483648))
                    * F.lit(_KNUTH),
                    F.lit(_MOD),
                )
                + (F.col("j") + 1) * F.lit(97003969)
                + F.lit(seed),
                F.lit(_MOD),
            )
            % F.lit(n),
        )
    )
    cands = ids.select(F.col(id_col).alias("neg_id"), F.col("__idx").alias("__pick"))
    return (
        draws.join(cands, "__pick")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "neg_id")
    )
