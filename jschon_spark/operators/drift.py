"""Distribution-drift checks — per-partition histograms + PSI / KS.

No jschon analogue (new, per BASELINE.json north_star): fixed-bin
histograms per table partition, combined into per-partition
distributions, compared against a reference distribution with
Population Stability Index and Kolmogorov-Smirnov statistics.

Scale notes
-----------
The histogram is ONE groupBy((partition, bucket)).count() — map-side
partial aggregation means the shuffle carries at most
n_partitions × n_bins rows regardless of input size (a two-level
tree combine in effect: partial per task, final per reducer). The
PSI/KS math runs on the tiny combined histogram — driver-side by
design, mirroring SURVEY.md §2.8's two-level treeAggregate plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fixed_bucket(col, lo: float, hi: float, n_bins: int):
    """Deterministic fixed-width bucket index in [0, n_bins-1].

    Expressed with floor/least/greatest only so an external SQL oracle
    (DuckDB) reproduces it bit-for-bit on the same doubles.
    """
    step = (hi - lo) / n_bins
    raw = F.floor((col - F.lit(lo)) / F.lit(step)).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def histogram(
    df: DataFrame,
    value_col: str,
    partition_col: str | None,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Per-(partition, bucket) counts. NULL values are dropped.

    Output: [<partition_col>,] bucket:bigint, n:bigint
    """
    d = df.filter(F.col(value_col).isNotNull()).withColumn(
        "bucket", fixed_bucket(F.col(value_col), lo, hi, n_bins)
    )
    keys = ([partition_col] if partition_col else []) + ["bucket"]
    return d.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def _to_dist(rows, n_bins: int) -> list[float]:
    counts = [0.0] * n_bins
    for b, n in rows:
        counts[int(b)] = float(n)
    total = sum(counts) or 1.0
    return [c / total for c in counts]


def psi(expected: list[float], actual: list[float], eps: float = 1e-6) -> float:
    """Population Stability Index between two binned distributions."""
    s = 0.0
    for e, a in zip(expected, actual):
        e = max(e, eps)
        a = max(a, eps)
        s += (a - e) * math.log(a / e)
    return s


def ks_stat(expected: list[float], actual: list[float]) -> float:
    """KS statistic (max |ΔCDF|) between two binned distributions."""
    ce = ca = 0.0
    best = 0.0
    for e, a in zip(expected, actual):
        ce += e
        ca += a
        best = max(best, abs(ce - ca))
    return best


def drift_scores(
    df: DataFrame,
    value_col: str,
    partition_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    eps: float = 1e-6,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Fully distributed per-partition PSI + KS vs the pooled corpus.

    Unlike ``drift_report`` (driver-side math on the collected
    histogram), everything here stays in the plan: the only shuffles
    are the histogram groupBy (map-side combined to ≤ partitions×bins
    rows) and the final per-partition rollup. The global distribution
    is n_bins rows and broadcast onto the densified grid.

    PSI terms are (a-e)·ln(a/e) with both sides eps-clamped — each
    term is ≥ 0, so the sum is cancellation-free and reproducible
    across engines to ~1e-15 relative.

    Output: <partition_col>, n_values:bigint, psi:double, ks:double,
    drift_passed:boolean.
    """
    from pyspark.sql import Window

    from jschon_spark.operators import _cachereg

    spark = df.sparkSession
    # the histogram (≤ partitions×bins rows) feeds three branches
    # (per-partition totals, the global distribution, the densified
    # join); persist it so the INPUT is scanned exactly once — AQE's
    # ReuseExchange only dedups some of the three otherwise
    hist = histogram(df, value_col, partition_col, lo, hi, n_bins).persist()
    _cachereg.track("drift_scores", hist)
    glob = (
        hist.groupBy("bucket")
        .agg(F.sum("n").alias("gn"))
        .withColumn("gt", F.sum("gn").over(Window.partitionBy()))
    )
    parts = hist.groupBy(partition_col).agg(F.sum("n").alias("__pt"))
    bins = spark.range(n_bins).select(F.col("id").alias("bucket"))
    grid = parts.crossJoin(F.broadcast(bins))
    filled = (
        grid.join(hist, [partition_col, "bucket"], "left")
        .join(F.broadcast(glob), ["bucket"], "left")
        .select(
            partition_col,
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("__n"),
            (F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("__pt").cast("double")).alias("__p"),
            (F.coalesce(F.col("gn"), F.lit(0)).cast("double") / F.col("gt").cast("double")).alias("__q"),
        )
    )
    pc = F.greatest(F.col("__p"), F.lit(eps))
    qc = F.greatest(F.col("__q"), F.lit(eps))
    w = (
        Window.partitionBy(partition_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    terms = filled.select(
        partition_col,
        "__n",
        ((pc - qc) * F.log(pc / qc)).alias("__psi_term"),
        F.abs(F.sum("__p").over(w) - F.sum("__q").over(w)).alias("__cdf_gap"),
    )
    return (
        terms.groupBy(partition_col)
        .agg(
            F.sum("__n").alias("n_values"),
            F.sum("__psi_term").alias("psi"),
            F.max("__cdf_gap").alias("ks"),
        )
        .withColumn("drift_passed", F.col("psi") <= F.lit(psi_threshold))
    )


def drift_report(
    df: DataFrame,
    value_col: str,
    partition_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    psi_threshold: float = 0.2,
) -> list[dict]:
    """Per-partition PSI/KS vs the global distribution.

    Returns a small driver-side list (one dict per partition):
    {partition, n, psi, ks, passed}. The heavy lifting (the histogram)
    is fully distributed; only n_partitions × n_bins counts reach the
    driver.
    """
    hist = histogram(df, value_col, partition_col, lo, hi, n_bins)
    return finish_report(hist.collect(), partition_col, n_bins, psi_threshold)


def finish_report(
    rows: list,
    partition_col: str,
    n_bins: int,
    psi_threshold: float = 0.2,
) -> list[dict]:
    """Driver-side finishing math over the collected histogram rows
    (≤ partitions × bins of them) — split out of ``drift_report`` so
    the pipeline can defer the histogram ACTION and run its scan
    concurrently with the other corpus outputs (round 5: the eager
    collect made drift a serial prelude to the whole pass)."""
    global_rows: dict[int, float] = {}
    parts: dict[object, list] = {}
    for r in rows:
        p, b, n = r[partition_col], r["bucket"], r["n"]
        global_rows[b] = global_rows.get(b, 0.0) + n
        parts.setdefault(p, []).append((b, n))
    expected = _to_dist(list(global_rows.items()), n_bins)
    out = []
    for p, pr in sorted(parts.items(), key=lambda kv: str(kv[0])):
        actual = _to_dist(pr, n_bins)
        pv = psi(expected, actual)
        out.append(
            {
                "partition": p,
                "n": int(sum(n for _, n in pr)),
                "psi": pv,
                "ks": ks_stat(expected, actual),
                "passed": pv <= psi_threshold,
            }
        )
    return out
