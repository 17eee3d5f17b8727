"""spark-submit entrypoint for the corpus validation job.

Cluster usage (the north-rule deployment shape):

    cd /root/repo && zip -r /tmp/jschon_spark.zip jschon_spark
    spark-submit --py-files /tmp/jschon_spark.zip \
        scripts/run_validation_job.py \
        --input /data/webpages --schema page_schema.json \
        --output /data/quality --manifests /data/quality/_manifests

Local smoke (same code path):

    python scripts/run_validation_job.py --rows 100000 --output /tmp/vq

The job runs the full keyword+stats+uniqueness+referential+drift pass,
writes verdicts/violations/stats as parquet, and (with --manifests)
publishes per-day checkpoint manifests so a re-run resumes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of the webpages table")
    ap.add_argument("--rows", type=int, default=0,
                    help="generate a synthetic corpus of N rows instead of --input")
    ap.add_argument("--schema", help="JSON Schema file (default: built-in page schema)")
    ap.add_argument("--output", required=True, help="output root for parquet results")
    ap.add_argument("--manifests", help="manifest dir: enables checkpoint/resume")
    args = ap.parse_args()

    from jschon_spark.session import get_spark
    from jschon_spark.pipeline import (
        PAGE_SCHEMA,
        validate_corpus,
        validate_corpus_checkpointed,
    )
    from jschon_spark.plans.manifests import partition_snapshot_id
    from jschon_spark.sources.webpages import generate_webpages

    spark = get_spark(app_name="jschon_spark_validation")

    schema = PAGE_SCHEMA
    if args.schema:
        with open(args.schema, encoding="utf-8") as f:
            schema = json.load(f)

    if args.rows:
        docs = generate_webpages(spark, args.rows)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input or --rows is required")

    if args.manifests and args.input:
        # per-day incremental mode with lineage manifests
        from pyspark.sql import functions as F

        days = [
            r.day
            for r in docs.select(
                F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
            ).distinct().collect()
        ]
        snaps = {
            d: partition_snapshot_id(os.path.join(args.input, f"day={d}"))
            for d in days
        }
        written = validate_corpus_checkpointed(
            spark, docs, args.manifests, snaps, schema
        )
        print(json.dumps({"partitions_processed": sorted(written)}))
        return

    report = validate_corpus(spark, docs, schema)
    out = args.output
    report.verdicts.write.mode("overwrite").parquet(f"{out}/verdicts")
    report.violations.write.mode("overwrite").parquet(f"{out}/violations")
    report.partition_verdicts.write.mode("overwrite").parquet(f"{out}/partition_verdicts")
    report.stats.write.mode("overwrite").parquet(f"{out}/stats")
    report.duplicate_urls.write.mode("overwrite").parquet(f"{out}/duplicate_urls")
    report.lang_violations.write.mode("overwrite").parquet(f"{out}/lang_violations")
    with open(os.path.join("/tmp", "drift_report.json"), "w") as f:
        json.dump(report.drift, f, default=str)
    print(json.dumps(report.metrics, default=str))


if __name__ == "__main__":
    main()
