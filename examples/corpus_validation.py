"""The flagship north-rule workload at example scale: the full
keyword + stats + uniqueness + referential + drift pass over a
synthetic Common-Crawl-style page table (url, warc_ts, html, text,
lang) — one `validate_corpus` call, all outputs distributed.

At production scale the same call runs over an Iceberg table at 10^12
rows; the plan shape is identical (see BASELINE.md / tests/test_plans).
"""

import json

from jschon_spark import get_spark
from jschon_spark.pipeline import validate_corpus
from jschon_spark.sources.webpages import generate_webpages

spark = get_spark(cores=4)
docs = generate_webpages(spark, 2000)  # seed-fixed generator
report = validate_corpus(spark, docs)

print(json.dumps(report.metrics, sort_keys=True))
print("drift days:", sum(1 for d in report.drift if d["passed"]), "clean /",
      len(report.drift), "total")
worst = sorted(
    report.violations.groupBy("keyword").count().collect(),
    key=lambda r: (-r["count"], r.keyword),
)
for r in worst[:3]:
    print("violations:", r.keyword, r["count"])
