"""Text analysis for training-data pipelines: token counts, quality
scores, language-ID heuristic, document fingerprints.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM
side, whole-stage codegen) — no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "que", "es", "un", "una", "por"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens, empty strings removed (works for '' and NULL)."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_tokens(col: Column) -> Column:
    """BPE-ish word/punct tokens: runs of letters+digits or single punct."""
    return F.filter(
        F.split(col, r"((?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9]))"),
        lambda x: (x != F.lit("")) & (~x.rlike(r"^\s+$")),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row quality features: lengths, token stats, punct/alpha ratios.

    Adds columns: n_chars_q, n_tokens, mean_token_len, punct_ratio,
    alpha_ratio, stopword_ratio_en.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw, F.lower(x))))
    return (
        df.withColumn("n_chars_q", F.coalesce(n_chars, F.lit(0)))
        .withColumn("n_tokens", F.coalesce(n_tok, F.lit(0)))
        .withColumn(
            "mean_token_len",
            F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "alpha_ratio",
            F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio_en",
            F.when(n_tok > 0, n_sw / n_tok).otherwise(F.lit(0.0)),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID. Adds ``lang_pred:string`` (2-letter
    code with the highest stopword hit count; 'und' if no hits).

    Pure Column algebra: one pass, no shuffle, no UDF.
    """
    t = F.lower(F.col(text_col))
    toks = tokens(t)
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", pred)


def fingerprint(col: Column, window: int = 8) -> Column:
    """Document fingerprint: xxhash64 of the normalized text — the exact
    dedup key. (Rolling-hash winnowing lives in dedup.simhash/minhash.)"""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(norm)
