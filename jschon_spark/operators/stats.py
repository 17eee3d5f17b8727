"""Per-column statistics — corpus-wide profiling pass.

jschon analogue: ``type``/``required`` applied corpus-wide and
``maxLength`` bounds (/root/reference/jschon/vocabulary/validation.py:33-46,
114-120, 233-240), lifted from one document to a table.

Scale notes
-----------
One job = ONE scan of the table: all per-column aggregates are computed
in a single ``df.agg(...)`` (Catalyst fuses them into one hash-aggregate
with map-side partial aggregation, so the shuffle carries exactly one
row per partition). Distinct counts use HyperLogLog++
(``approx_count_distinct``) on the scale path — exact
``count(distinct)`` forces a per-column shuffle and is offered only for
oracle parity at test scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One output row per column: count/nulls/distinct plus min/max.

    Output schema::

        col_name:string, n_rows:bigint, n_nulls:bigint, n_distinct:bigint,
        min_str:string, max_str:string

    min/max are reported as strings so heterogeneous column types fit a
    single long-format result. Numeric min/max in native type:
    ``numeric_stats``.
    """
    if columns is None:
        columns = df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(col).alias(f"nd__{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"nd__{c}"))
        aggs.append(F.min(col).cast("string").alias(f"mn__{c}"))
        aggs.append(F.max(col).cast("string").alias(f"mx__{c}"))
    wide = df.agg(*aggs)

    # Unpivot the single wide row into one row per column (driver-free:
    # stays a DataFrame; the wide row is 1 row so this is trivial work).
    pairs = []
    for c in columns:
        pairs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"nn__{c}")).alias("n_nulls"),
                F.col(f"nd__{c}").cast("bigint").alias("n_distinct"),
                F.col(f"mn__{c}").alias("min_str"),
                F.col(f"mx__{c}").alias("max_str"),
            )
        )
    return (
        wide.select(F.explode(F.array(*pairs)).alias("s"))
        .select("s.*")
    )


def numeric_stats(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-format numeric profile: min/max as doubles, exact counts.

    Output: col_name, n_rows, n_nulls, n_distinct, min_val, max_val.
    Exact distinct (shuffle per column) — test/oracle scale only.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs.append(F.countDistinct(col).alias(f"nd__{c}"))
        aggs.append(F.min(col).cast("double").alias(f"mn__{c}"))
        aggs.append(F.max(col).cast("double").alias(f"mx__{c}"))
    # (round 7: fanning the scan out before this aggregate was
    # measured SLOWER — the repartition shuffles the whole input to
    # parallelize a partial aggregate that the scan already overlaps)
    wide = df.agg(*aggs)
    pairs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"nn__{c}")).alias("n_nulls"),
            F.col(f"nd__{c}").cast("bigint").alias("n_distinct"),
            F.col(f"mn__{c}").alias("min_val"),
            F.col(f"mx__{c}").alias("max_val"),
        )
        for c in columns
    ]
    return wide.select(F.explode(F.array(*pairs)).alias("s")).select("s.*")


def numeric_quantiles(
    df: DataFrame,
    columns: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Interpolated quantiles for many columns in ONE scan.

    Output: col_name:string, p:double, q:double (long format).

    ``exact=True`` uses Spark's exact ``percentile`` (sorts each
    column's values — test/oracle scale only: memory is O(values)).
    The SCALE path is ``exact=False`` → ``approx_percentile``
    (GK-sketch, bounded memory, one-pass mergeable partials — the same
    shape as the HLL distinct counts above); same call, same output
    schema, rank error ≤ 1/accuracy.
    """
    plist = [float(p) for p in probs]
    fn = F.percentile if exact else (
        lambda c, ps: F.approx_percentile(c, ps, F.lit(accuracy))
    )
    aggs = [
        fn(F.col(c).cast("double"), F.lit(plist)).alias(f"q__{c}")
        for c in columns
    ]
    wide = df.agg(*aggs)
    pairs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(plist).alias("ps"),
            F.col(f"q__{c}").alias("qs"),
        )
        for c in columns
    ]
    return (
        wide.select(F.explode(F.array(*pairs)).alias("s"))
        .select("s.col_name", F.explode(F.arrays_zip("s.ps", "s.qs")).alias("z"))
        .select("col_name", F.col("z.ps").alias("p"), F.col("z.qs").alias("q"))
    )
