"""Cross-row uniqueness — ``uniqueItems`` lifted from array to table.

jschon analogue: ``uniqueItems`` does an O(n²) pairwise scan of one
array (/root/reference/jschon/vocabulary/validation.py:163-177). The
table-level form is a hash-aggregate on the key.

Scale notes
-----------
``groupBy(key).count()`` already does map-side partial aggregation, so
for a *count* the shuffle carries one row per (partition, key) — fine
even at 10^12 rows unless one key value dominates. The salted two-phase
variant makes skew handling explicit for hot keys (e.g. url=NULL or a
crawler artifact repeated 10^9 times): phase 1 aggregates on
(key, salt=pmod(hash(key, seed), buckets)) spreading a hot key over
``buckets`` reducers, phase 2 sums the partial counts per key. AQE skew
handling is enabled in the session as the safety net.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str | list[str]) -> DataFrame:
    """Keys appearing more than once. Output: <key cols>, n_dup:bigint."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def duplicate_keys_salted(
    df: DataFrame, key: str | list[str], buckets: int = 64
) -> DataFrame:
    """Skew-robust two-phase variant of :func:`duplicate_keys`.

    Identical output; the first aggregation fans each key over
    ``buckets`` salt values so no single reducer owns a hot key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.hash(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__part"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__part").alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def uniqueness_verdict(df: DataFrame, key: str | list[str]) -> DataFrame:
    """Single-row verdict: n_rows, n_distinct_keys, n_dup_rows, passed."""
    keys = [key] if isinstance(key, str) else list(key)
    dups = duplicate_keys(df, keys)
    agg = dups.agg(
        F.coalesce(F.sum("n_dup"), F.lit(0)).alias("n_dup_rows"),
        F.count(F.lit(1)).alias("n_dup_keys"),
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return total.crossJoin(agg).select(
        "n_rows",
        "n_dup_keys",
        "n_dup_rows",
        (F.col("n_dup_rows") == 0).alias("passed"),
    )


def duplicate_keys_prefiltered(
    df: DataFrame,
    key: str,
    broadcast_candidates: bool | None = None,
    broadcast_max_candidates: int = 10_000_000,
) -> DataFrame:
    """Exact duplicate keys with a HASH-prefilter shuffle.

    Same output as :func:`duplicate_keys`, different shuffle economics
    for wide keys (urls): phase 1 aggregates on ``xxhash64(key)`` so the
    exchange carries 8-byte hashes with map-side combine instead of the
    key strings (~6-10x fewer shuffle bytes on url-length keys); phase 2
    re-scans and exact-counts ONLY rows whose hash is duplicated —
    collisions merely add candidates, the exact groupBy removes them, so
    the result is identical to duplicate_keys.

    ``broadcast_candidates=None`` (default) gates the broadcast on the
    MEASURED candidate count: the phase-1 aggregate is persisted and
    counted (the aggregate is one 8-byte row per duplicated hash —
    tiny relative to the scan that produces it — and the persist lets
    the phase-2 join reuse it instead of recomputing phase 1), and the
    broadcast hint is attached only when the count is under
    ``broadcast_max_candidates``. Above the bound the join is left
    unhinted so AQE picks a shuffled join — a crawl burst of 10^10
    duplicate urls can therefore never force an unbounded broadcast.
    Pass True/False to skip the measuring action and force the choice.
    """
    h = F.xxhash64(F.col(key)).alias("__h")
    cand = (
        df.select(h)
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__h")
    )
    if broadcast_candidates is None:
        from jschon_spark.operators import _cachereg

        cand = cand.persist()
        _cachereg.track("duplicate_keys_prefiltered", cand)
        if cand.count() <= broadcast_max_candidates:
            cand = F.broadcast(cand)
    elif broadcast_candidates:
        cand = F.broadcast(cand)
    return (
        df.join(cand, F.xxhash64(F.col(key)) == F.col("__h"))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )
