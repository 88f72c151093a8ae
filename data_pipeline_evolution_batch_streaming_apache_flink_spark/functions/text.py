"""Text-analysis scalar functions for training-data pipelines.

All pure Spark SQL expressions (codegen'd, no UDFs): tokenization, n-gram
shingling, language-ID heuristic, quality scoring, rolling-hash
fingerprinting. Each is also expressible in ANSI SQL so the DuckDB oracle
can replicate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FNV_PRIME = 2147483647  # 2^31 - 1; keeps rolling-hash arithmetic overflow-free under ANSI mode


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenization classes (GPT-2 style, simplified to what both
# Spark and the DuckDB oracle regex engines support identically): runs of
# letters, runs of digits, runs of non-alphanumeric-non-space symbols.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def regex_tokens(col: Column | str, pattern: str = BPE_TOKEN_PATTERN) -> Column:
    """BPE-style pre-tokenization: extract all matches of ``pattern``
    instead of splitting on whitespace — punctuation becomes its own
    token, as LLM tokenizers do before merges."""
    return F.regexp_extract_all(_c(col), F.lit(pattern), 0)


def regex_token_count(col: Column | str, pattern: str = BPE_TOKEN_PATTERN) -> Column:
    return F.size(regex_tokens(col, pattern))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def word_shingles(col: Column | str, n: int = 5, distinct: bool = True) -> Column:
    """n-word shingles. Documents shorter than n tokens yield one shingle
    (all their tokens) so every doc participates in dedup."""
    toks = tokens(col)
    positions = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    sh = F.transform(positions, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(sh) if distinct else sh


# Marker stopwords per language for the n-gram language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "les", "des", "est", "une"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "zh": ("的", "是", "了", "在", "我"),
}


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-token counts over the token array."""
    toks = tokens(col)

    def marker_count(marker: str) -> Column:
        return F.size(F.filter(toks, lambda t: t == F.lit(marker)))

    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            cnt = marker_count(m)
            score = cnt if score is None else score + cnt
        out[lang] = score
    return out


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Argmax language by marker count; ``default`` when all scores are 0.
    Ties break by language-name order (deterministic)."""
    scores = lang_scores(col)
    pairs = F.array(*[F.struct(v.alias("score"), F.lit(k).alias("lang")) for k, v in sorted(scores.items())])
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score: token count band, type-token ratio,
    mean token length band, alphabetic character ratio. Deterministic
    arithmetic only — reproducible in the SQL oracle."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    ttr = distinct_token_count(c).cast("double") / F.greatest(n_tok, F.lit(1.0))
    alpha_ratio = (
        F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
        / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    )
    len_band = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round((ttr + alpha_ratio + len_band) / F.lit(3.0), 6)


def fingerprint(col: Column | str, prime: int = FNV_PRIME, mult: int = 31) -> Column:
    """Polynomial rolling hash of the full text, mod ``prime``.

    acc = (acc*mult + codepoint(ch)) % prime, left to right. Multiplier and
    modulus are small enough that intermediate values stay < 2^63 (safe
    under ANSI overflow checking) and the identical formula runs in DuckDB.
    """
    chars = F.split(_c(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(acc * mult + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(prime)),
    )


#: accent-fold table (Latin-1 supplement + common Latin Extended-A) —
#: a FIXED translate map rather than locale/ICU normalization so every
#: engine reproduces the same bytes
ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāăēĕīĭōŏūŭšžćčđłńřśţż"
ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyyaaeeiioouuszccdlnrstz"


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for dedup/fingerprint preprocessing:
    lowercase, accent-fold (fixed table above), strip everything except
    word characters and spaces, collapse whitespace, trim. Pure codegen
    (lower/translate/regexp_replace) — zero shuffle, reproducible on
    any engine that has the same three builtins."""
    c = F.lower(_c(col))
    c = F.translate(c, ACCENT_SRC, ACCENT_DST)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def html_to_text(col: Column | str) -> Column:
    """Boilerplate-free text from raw HTML — the very first transform of
    a web-crawl corpus (CommonCrawl WET-style extraction), as a pure
    codegen'd regexp chain (no UDF, runs inside the scan projection).

    Steps, in order (each pattern is valid in BOTH Java regex and RE2 so
    the DuckDB oracle replays them verbatim): drop <script>/<style>
    subtrees and comments wholesale (their text is never content), turn
    block-level boundaries (p/div/br/h1-6/li/tr/table) into newlines so
    words from adjacent blocks don't fuse, strip every remaining tag,
    decode the six entities that dominate real pages, collapse intra-line
    whitespace and blank lines.

    Deliberately NOT a browser: malformed nesting degrades to extra
    whitespace, never to dropped content. Heavier readability scoring
    (link density, line quality) belongs in operators/quality.py gates
    applied downstream of this function.
    """
    x = _c(col)
    # two passes, no backreference — RE2 (the oracle's engine) has none
    x = F.regexp_replace(x, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?i)</?(p|div|br|h[1-6]|li|tr|table|ul|ol)\b[^>]*>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    # &amp; decodes LAST: doing it earlier turns &amp;lt; into &lt; and a
    # second rule would then double-decode it to a bare '<'
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r"[ \t\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n+", "\n")
    return F.regexp_replace(F.trim(x), r"^\n+|\n+$", "")
