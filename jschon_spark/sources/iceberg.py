"""Iceberg table IO — the north-rule deployment target, import-guarded.

The sandbox image ships no Iceberg runtime jars, so this module probes
for the catalog at call time and degrades to day-partitioned parquet
with identical semantics for everything this engine needs:

  * partition layout: ``days(warc_ts)`` ≙ parquet ``day=`` directories
  * snapshot ids for checkpoint manifests: Iceberg's
    ``snapshot_id()`` ≙ ``plans.manifests.partition_snapshot_id``
    (file-listing fingerprint) on the parquet fallback
  * predicate pushdown / partition pruning work identically through
    the DataSource V2 scan on both.

On a cluster with ``spark.sql.catalog.<name>`` configured for Iceberg,
pass ``table='catalog.db.webpages'`` and the real snapshot lineage is
used automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    try:
        cls = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        return cls is not None and "iceberg" in cls.lower()
    except Exception:
        return False


def write_webpages_table(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    catalog: str = "spark_catalog",
) -> str:
    """Write the corpus as an Iceberg table partitioned by days(warc_ts),
    or as day-partitioned parquet when no Iceberg catalog is present.
    Returns 'iceberg' or 'parquet'."""
    if iceberg_available(spark, catalog):
        (
            df.writeTo(target)
            .partitionedBy(F.days(F.col("warc_ts")))
            .createOrReplace()
        )
        return "iceberg"
    (
        df.withColumn("day", F.date_format("warc_ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(target)
    )
    return "parquet"


def read_webpages_table(
    spark: SparkSession, target: str, catalog: str = "spark_catalog"
) -> DataFrame:
    """The parquet fallback KEEPS the physical ``day`` column: it is the
    partition column, and downstream day-jobs
    (pipeline.validate_corpus_checkpointed) filter on it to get
    directory-level partition pruning — a warc_ts range only skips
    row groups, not partitions, on the parquet layout."""
    if iceberg_available(spark, catalog):
        return spark.read.table(target)
    return spark.read.parquet(target)


def partition_snapshots(
    spark: SparkSession, target: str, catalog: str = "spark_catalog"
) -> dict[str, str]:
    """{partition -> snapshot id} for checkpoint manifests.

    Iceberg: one current snapshot id stamped per partition (a new
    snapshot invalidates re-run detection table-wide, conservatively).
    Parquet: per-day directory fingerprints (finer-grained resume).
    """
    if iceberg_available(spark, catalog):
        snap = (
            spark.sql(f"SELECT snapshot_id FROM {target}.snapshots ORDER BY committed_at DESC LIMIT 1")
            .collect()[0][0]
        )
        days = [
            r.day
            for r in spark.read.table(target)
            .select(F.date_format("warc_ts", "yyyy-MM-dd").alias("day"))
            .distinct()
            .collect()
        ]
        return {d: str(snap) for d in days}
    import os

    from jschon_spark.plans.manifests import partition_snapshot_id

    out = {}
    if os.path.isdir(target):
        for name in sorted(os.listdir(target)):
            if name.startswith("day="):
                out[name.split("=", 1)[1]] = partition_snapshot_id(
                    os.path.join(target, name)
                )
    return out
