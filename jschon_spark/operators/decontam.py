"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark text set (the GPT-3 appendix-C
/ PaLM "13-gram overlap" method — public technique; the reference has
no analogue, this is part of the LLM-pipeline family).

Scale shape (the reason this survives 100 TB): the benchmark side is
eval-set text — megabytes against a 100 TB corpus — so its distinct
n-gram hashes BROADCAST. The corpus side is a single scan that
shingles row-locally (HOFs, no Python), explodes only 64-bit hashes
(never gram strings or payloads), and broadcast-hash-semi-joins; the
lone groupBy aggregates only MATCHED (doc_id, hash) rows, which are
rare by construction. The corpus payload is never shuffled.

Engine-portable hashing: grams are compared through
``dedup.md5_hash60`` (first 15 hex chars of md5 as a 60-bit int) so a
SQL oracle can replay the exact join on any engine —
``('0x' || substr(md5(gram), 1, 15))::BIGINT`` in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jschon_spark.operators import _partitions
from jschon_spark.operators._hof import fence
from jschon_spark.operators.dedup import md5_hash60, normalized
from jschon_spark.operators.textqa import tokens


def strict_shingles_from_tokens(toks: Column, n: int) -> Column:
    """Distinct space-joined word n-grams from a token array; EMPTY
    array (not a whole-text fallback — unlike
    ``dedup.shingles_from_tokens``) when there are fewer than ``n``
    tokens, so short rows simply produce no candidate grams. Pass a
    materialized column (operators/_hof.py)."""
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def strict_shingles(col: Column, n: int) -> Column:
    """Convenience form over a raw text column (small inputs only —
    the corpus path materializes tokens first)."""
    return strict_shingles_from_tokens(tokens(normalized(col)), n)


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    hash_fn=md5_hash60,
) -> DataFrame:
    """Per-document contamination hits against the benchmark set.

    Returns ONLY contaminated documents (the actionable removal list —
    clean docs are the anti-join complement, same convention as
    ``dedup.dedup_representatives``), one row each:

    ``doc_id, n_grams (distinct grams in the doc), n_hit (grams also
    in the benchmark set), hit_frac``.
    """
    # fan out a tiny scan (CPU-bound shingling), materialize tokens
    # then grams in pinned projections so the slice lambda indexes a
    # bound array (O(k^2) -> O(k) per row, operators/_hof.py) and
    # size/explode don't re-evaluate the gram build
    base = (
        _partitions.fan_out(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        )
        .select(
            "doc_id", fence(tokens(normalized(F.col("__t")))).alias("__tk")
        )
        .select(
            "doc_id",
            fence(strict_shingles_from_tokens(F.col("__tk"), n)).alias("g"),
        )
        .withColumn("n_grams", F.size("g").cast("bigint"))
    )
    exploded = base.select(
        "doc_id", "n_grams", F.explode("g").alias("gram")
    ).select("doc_id", "n_grams", hash_fn(F.col("gram")).alias("h"))
    bench_hashes = (
        bench.select(F.explode(strict_shingles(F.col(bench_text_col), n)).alias("gram"))
        .select(hash_fn(F.col("gram")).alias("h"))
        .distinct()
    )
    hits = (
        exploded.join(F.broadcast(bench_hashes), "h", "left_semi")
        .groupBy("doc_id", "n_grams")
        .agg(F.count("*").alias("n_hit"))
    )
    return hits.select(
        "doc_id",
        "n_grams",
        "n_hit",
        (F.col("n_hit") / F.col("n_grams")).alias("hit_frac"),
    )
