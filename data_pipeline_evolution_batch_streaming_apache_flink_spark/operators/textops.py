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
