"""Document-level text analysis operators over a documents table
(doc_id, text, ...). Thin DataFrame compositions of functions/text.py —
single pass over the corpus, no shuffle (all per-row expressions)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import text as TXT
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import explode_noinfer, fan_out


def analyze_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass text profile: token counts, language ID, quality score,
    rolling-hash fingerprint. All codegen'd scalar expressions; input is
    fanned out so the per-char fingerprint fold uses every core."""
    df = fan_out(df)
    return df.select(
        F.col(id_col),
        TXT.token_count(text_col).alias("n_tokens"),
        TXT.distinct_token_count(text_col).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars_measured"),
        TXT.lang_id(text_col).alias("lang_pred"),
        TXT.quality_score(text_col).alias("quality"),
        TXT.fingerprint(text_col).alias("fingerprint"),
    )


def token_histogram(df: DataFrame, text_col: str = "text", top_n: int | None = None) -> DataFrame:
    """Corpus-wide token frequency (explode + count; one shuffle with
    map-side combine). ``top_n`` limits output after ranking.

    No fan_out: a bare tokenize-then-count is light per-row work, and
    the repartition would shuffle the full text payload — measured
    SLOWER with fan_out at sf0.1 (house rule from the round-6 lm_scores
    A/B: fan out only when per-row compute >> payload shuffle cost;
    contrast ngram_histogram/repetition_stats, whose per-row gram
    builds measurably need it)."""
    counts = (
        df.select(F.col(text_col))
        .select(F.explode(TXT.tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    if top_n is not None:
        counts = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(top_n)
    return counts


def ngram_histogram(
    df: DataFrame, n: int = 2, text_col: str = "text", top_n: int | None = None
) -> DataFrame:
    """Corpus-wide word n-gram frequency — the n>1 companion to
    :func:`token_histogram` (corpus phrase statistics: vocabulary drift,
    boilerplate phrases, template detection before dedup).

    Documents shorter than ``n`` tokens contribute nothing (unlike
    dedup's :func:`~..functions.text.word_shingles`, which pads short
    docs so every doc participates — a frequency count must not invent
    partial n-grams). The n-gram build is a codegen'd
    ``transform(sequence(...))`` over the token array — map-side only;
    the count is one shuffle with map-side combine; ``top_n`` ranks via
    TakeOrdered (no global sort materialization)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = TXT.tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        fan_out(df.select(F.col(text_col)))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("freq"))
    )
    if top_n is not None:
        counts = counts.orderBy(F.col("freq").desc(), F.col("ngram")).limit(top_n)
    return counts


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus TF-IDF: term frequency per (doc, term), smoothed inverse
    document frequency per term, score = tf * (ln((N+1)/(df+1)) + 1),
    rounded to 6dp (absorbs last-ulp ln() differences across engines).

    Plan shape: explode -> (doc, term) count -> term-level doc frequency
    -> join back -> optional per-doc top-k window. The corpus size N is
    a broadcast scalar (single-row cross join), never a driver value.
    ``top_k`` ranks by (score desc, term asc) for determinism.
    """
    from pyspark.sql import Window

    # no fan_out: tokenize-then-count (same measured rule as token_histogram)
    terms = df.select(id_col, text_col).select(
        F.col(id_col), F.explode(TXT.tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
        .select(id_col, "term", "tf", "tfidf")
    )
    if top_k is not None:
        w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
        scored = (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top_k)
        )
    return scored


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms — the standard retrieval scorer for keyword-driven corpus
    curation (pull the documents most relevant to a topic list before
    expensive downstream processing).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the Lucene-style smoothed idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape: explode → filter to the query terms (the explode output
    shrinks to |terms|-matching rows immediately) → per-(doc, term)
    counts → term doc-frequency join → one final per-doc fold. Corpus
    stats (N, avgdl) ride a broadcast single-row cross join, never a
    driver scalar; dl sums are exact integers so avgdl is bit-identical
    in any engine; the 6dp round absorbs last-ulp ln() differences; the
    per-doc total is a TERM-SORTED left fold (≤ |query_terms| structs),
    not a float sum in shuffle order — deterministic in any engine.
    Returns (id_col, bm25, n_terms) for documents matching ≥1 term.
    """
    # no fan_out: tokenize-then-count (same measured rule as token_histogram)
    toks = df.select(id_col, text_col).select(
        F.col(id_col), TXT.tokens(text_col).alias("__t")
    )
    base = toks.withColumn("__dl", F.size("__t"))
    stats = base.agg(F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl"))
    tf = (
        base.select(id_col, "__dl", explode_noinfer("__t").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", idf * tf_part)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("term", "__s"))).alias("__xs"),
            F.count("*").alias("n_terms"),
        )
        .select(
            id_col,
            F.round(
                F.aggregate("__xs", F.lit(0.0), lambda acc, x: acc + x["__s"]), 6
            ).alias("bm25"),
            "n_terms",
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngrams: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style within-document repetition signals — the standard
    quality gate against degenerate/boilerplate text before pretraining:

    - ``dup_{n}gram_frac``: fraction of n-gram OCCURRENCES that are
      repeats of an earlier occurrence (1 − distinct/total), per n;
    - ``top_token_frac``: share of the document taken by its single most
      frequent token.

    All codegen'd array expressions over one corpus pass (shingle with
    ``distinct=False``, compare against the distinct count; token mode
    via sort + aggregate run-length max) — no shuffle, no UDF. Round-6
    for cross-engine float parity. Returns id columns + the signals.
    """
    toks = TXT.tokens(text_col)
    cols = [F.col(id_col)]
    for n in ngrams:
        all_sh = TXT.word_shingles(text_col, n, distinct=False)
        frac = F.lit(1.0) - F.size(F.array_distinct(all_sh)) / F.size(all_sh)
        # NULL text scores NULL (unknown), not 0.0 (perfectly
        # non-repetitive) — the sibling top_token_frac already returns
        # NULL there, and a Gopher gate must not admit NULL docs
        # through this signal (review r7)
        cols.append(
            F.when(F.col(text_col).isNull(), F.lit(None).cast("double"))
            .otherwise(F.round(frac, 6))
            .alias(f"dup_{n}gram_frac")
        )
    # most-frequent-token count: sort tokens, then the longest equal run
    # is the max frequency — a single left fold, no per-token map build.
    sorted_toks = F.array_sort(toks)
    run = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    cols.append(F.round(run / F.size(toks), 6).alias("top_token_frac"))
    return fan_out(df).select(*cols)


def bm25_topk(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batch retrieval: BM25 top-k documents for EVERY query in a
    queries table at once — the many-query generalization of
    :func:`bm25_scores` (RAG candidate generation, eval-set retrieval,
    topic-targeted curation sweeps).

    Plan shape: the corpus explodes once into an inverted index pruned
    by the broadcast distinct query-term set (the explode collapses to
    term matches immediately); doc frequencies and per-(doc, term)
    scores reuse that term partitioning; the query->term map joins in
    on the same key; one (query, doc) fold with term-sorted
    accumulation; and a per-query window takes the top k (rounded
    score desc, doc id tiebreak — fully deterministic). Nothing
    quadratic: cost is O(matching postings), not |queries| x |docs|.
    Returns (query_id, doc_id, bm25, n_terms, rank).
    """
    from pyspark.sql import Window

    qterms = (
        queries.select(
            F.col(query_id_col), F.explode(TXT.tokens(query_text_col)).alias("term")
        )
        .distinct()
    )
    term_set = qterms.select("term").distinct()

    # no fan_out: tokenize-then-count (same measured rule as token_histogram)
    toks = docs.select(id_col, text_col).select(
        F.col(id_col), TXT.tokens(text_col).alias("__t")
    )
    base = toks.withColumn("__dl", F.size("__t"))
    stats = base.agg(F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl"))
    tf = (
        base.select(id_col, "__dl", explode_noinfer("__t").alias("term"))
        .join(F.broadcast(term_set), "term")
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", idf * tf_part)
        .join(qterms, "term")
    )
    totals = (
        scored.groupBy(query_id_col, id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("term", "__s"))).alias("__xs"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .select(
            query_id_col,
            id_col,
            F.round(
                F.aggregate("__xs", F.lit(0.0), lambda acc, x: acc + x["__s"]), 6
            ).alias("bm25"),
            "n_terms",
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (BM25 + dense + priors) for
    hard-negative mining and RAG candidate pooling: a document's fused
    score is ``Σ_lists 1/(k + rank)``, needing only RANKS, never the
    incomparable raw scores.

    Exact-integer discipline: each contribution is
    ``round(1e6 / (k + rank))`` as bigint (ONE division then
    micro-round, per house policy), so the fused sum and the resulting
    order are bit-identical on any engine/layout. A document absent
    from a list simply contributes nothing (union semantics).
    ``fused_rank`` breaks score ties by ``doc_col`` — fully
    deterministic.

    Scale shape: union of the lists (already tiny: top-k per query per
    ranker) → one grouped sum keyed by (query, doc) → one per-query
    window over ≤ N·k rows. Cost is bounded by the candidate pools,
    never the corpus.

    Returns ``(query_col, doc_col, rrf_micro, n_lists, fused_rank)``.
    """
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    slim = [
        r.select(
            F.col(query_col), F.col(doc_col),
            F.expr(f"CAST(round(1000000.0 / ({k} + {rank_col})) AS BIGINT)").alias("__c"),
        )
        for r in rankings
    ]
    uni = slim[0]
    for s in slim[1:]:
        uni = uni.unionByName(s)
    fused = uni.groupBy(query_col, doc_col).agg(
        F.sum("__c").alias("rrf_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_micro").desc(), F.col(doc_col)
    )
    return fused.withColumn("fused_rank", F.row_number().over(w))


RAKE_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "this", "to",
    "was", "with",
)


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    max_words: int = 4,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) per document.

    Candidate phrases are maximal runs of content words — stopwords and
    punctuation act as delimiters. Word scores are the classic
    ``deg(w)/freq(w)`` computed WITHIN each document (the canonical
    single-document algorithm): ``freq`` = occurrences of the word in
    the doc's candidate phrases, ``deg`` = sum of the lengths of the
    phrases containing each occurrence. A phrase scores the sum of its
    words' scores; the doc keeps its ``top_k`` phrases.

    Engine-stable numerics: each word score is ONE micro-rounded
    integer ratio (``round(deg*1e6/freq)`` — the NB discipline), so
    phrase scores are exact bigint sums and float accumulation order
    can never reorder the ranking. Ties rank lexicographically.

    Scale shape: phrase extraction is per-row regex codegen (stopword
    masking + split — no per-word loop); word stats, the score join,
    and the phrase regroup are all keyed by (doc_id, ...), so nothing
    global is ever built — hot keys are impossible and the plan scales
    linearly with the corpus. The per-doc top-k is a bounded window.

    Returns ``(id_col, keyword, score_micro, n_words, occurrences)``,
    ``top_k`` rows per doc with at least one candidate phrase.
    """
    if not stopwords:
        raise ValueError("stopwords must be non-empty")
    # Caller-supplied stopwords are data, not regex: a word like 'c++'
    # or 'u.s' would otherwise corrupt the alternation (ADVICE r4).
    # \Q...\E literal quoting is the Java-regex-native escape; reject
    # the one sequence it cannot quote.
    for w in stopwords:
        if r"\E" in w:
            raise ValueError(rf"stopword may not contain \E: {w!r}")
    # lookarounds, not \b: a boundary cannot be asserted next to a
    # non-word char, so \b made stopwords like 'c++'/'u.s.' unmatchable
    # and their fragments leaked into the keyword list (review r7).
    # (?<![\w])/(?![\w]) is exactly \b for word-char edges and "not glued
    # to a word char" for the rest.
    stop_re = r"(?<![\w])(" + "|".join(rf"\Q{w}\E" for w in stopwords) + r")(?![\w])"
    phrases = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col(text_col)), stop_re, "|"),
                    r"[^a-z0-9| ]",
                    "|",
                ),
                r"\|",
            )
        ).alias("__pid", "__raw"),
    ).select(
        F.col(id_col),
        F.col("__pid"),
        F.regexp_replace(F.trim(F.col("__raw")), r"\s+", " ").alias("keyword"),
    ).where(F.col("keyword") != "")
    phrases = phrases.withColumn("__words", F.split(F.col("keyword"), " ")).where(
        F.size("__words") <= max_words
    )
    words = phrases.select(
        id_col, "__pid", "keyword",
        F.size("__words").cast("long").alias("__plen"),
        explode_noinfer("__words").alias("__w"),
    )
    stats = words.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__freq"), F.sum("__plen").alias("__deg")
    )
    scored = words.join(stats, [id_col, "__w"]).withColumn(
        "__wscore",
        F.round(
            F.col("__deg").cast("double") * F.lit(1000000.0) / F.col("__freq").cast("double")
        ).cast("long"),
    )
    per_phrase = scored.groupBy(id_col, "__pid", "keyword").agg(
        F.sum("__wscore").alias("score_micro"), F.first("__plen").alias("n_words")
    )
    collapsed = per_phrase.groupBy(id_col, "keyword").agg(
        F.max("score_micro").alias("score_micro"),
        F.max("n_words").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("occurrences"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("keyword").asc()
    )
    return (
        collapsed.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= top_k)
        .drop("__rk")
    )
