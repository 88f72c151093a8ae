"""Document-level text analysis operators over a documents table
(doc_id, text, ...). Thin DataFrame compositions of functions/text.py —
single pass over the corpus, no shuffle (all per-row expressions)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_evolution_batch_streaming_apache_flink_spark.functions import text as TXT
from data_pipeline_evolution_batch_streaming_apache_flink_spark.operators.util import fan_out


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
    map-side combine). ``top_n`` limits output after ranking."""
    counts = (
        fan_out(df.select(F.col(text_col)))
        .select(F.explode(TXT.tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    if top_n is not None:
        counts = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(top_n)
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

    terms = fan_out(df.select(id_col, text_col)).select(
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
