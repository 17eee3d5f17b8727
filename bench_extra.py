"""Extra benchmarks for optimization work (round 7) — NOT the driver
metric. ``bench.py`` is the frozen measured artifact; this file holds
the guide-§1 instrumentation used to isolate and attribute time:

  python bench_extra.py time <query> [query ...]     # 3 warm noop reps
  python bench_extra.py build <query> [query ...]    # driver-side plan
                                                     # construction time
  python bench_extra.py profile <query> [query ...]  # per-job/stage
                                                     # breakdown (REST)
  python bench_extra.py corpus                       # corpus pass reps

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _queries():
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    qs.update(entrymod.extra_benches())
    return qs


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from jschon_spark.session import get_spark

    extra = {}
    if mode == "profile":
        extra = {"spark.ui.enabled": "true", "spark.ui.port": "4099"}
    spark = get_spark(app_name="jschon_spark_bench_extra", cores=cpus,
                      extra_conf=extra)

    if mode == "corpus":
        from concurrent.futures import ThreadPoolExecutor

        from jschon_spark.pipeline import validate_corpus
        from jschon_spark.sources.webpages import generate_webpages

        n = int(os.environ.get("BENCH_WEBPAGES_ROWS", "4000000"))
        path = os.environ.get(
            "BENCH_CORPUS_PATH", f"/tmp/jschon_spark_bench_corpus_{n}"
        )
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            generate_webpages(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        for i in range(5):
            t0 = time.time()
            report = validate_corpus(spark, docs, collect_metrics=False)
            with ThreadPoolExecutor(max_workers=6) as pool:
                futs = [
                    pool.submit(force, df)
                    for df in (
                        report.verdicts, report.partition_verdicts,
                        report.stats, report.duplicate_urls,
                        report.lang_violations,
                    )
                ]
                futs.append(pool.submit(lambda: report.drift))
                for f in futs:
                    f.result()
            print(f"corpus rep{i}: {time.time() - t0:.3f}s", flush=True)
        return

    qs = _queries()
    if not names:
        names = list(qs)

    if mode == "time":
        for rep in range(3):
            for name in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                force(qs[name](spark, sf_dir))
                print(f"rep{rep} {name} {time.time() - t0:.3f}", flush=True)
        return

    if mode == "build":
        for name in names:
            fn = qs[name]
            fn(spark, sf_dir)  # warm imports / compile caches
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            t0 = time.time()
            df.schema
            print(f"{name:30s} build {t_build:6.3f}s analyze "
                  f"{time.time() - t0:6.3f}s", flush=True)
        return

    if mode == "profile":
        app_id = spark.sparkContext.applicationId

        def api(p):
            with urllib.request.urlopen(
                f"http://localhost:4099/api/v1/applications/{app_id}/{p}"
            ) as r:
                return json.load(r)

        from datetime import datetime

        def ts(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

        for name in names:
            force(qs[name](spark, sf_dir))  # warm rep
            before = {j["jobId"] for j in api("jobs")}
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            wall = time.time() - t0
            time.sleep(0.3)
            js = sorted(
                (j for j in api("jobs") if j["jobId"] not in before),
                key=lambda j: j["jobId"],
            )
            tot = sum(
                (ts(j["completionTime"]) - ts(j["submissionTime"]))
                .total_seconds()
                for j in js if "completionTime" in j
            )
            print(f"== {name}: wall {wall:.2f}s, {len(js)} jobs, "
                  f"sum-job {tot:.2f}s (driver gap {wall - tot:.2f}s)")
            for j in js:
                if "completionTime" not in j:
                    continue
                dur = (
                    ts(j["completionTime"]) - ts(j["submissionTime"])
                ).total_seconds()
                if dur >= 0.25:
                    print(f"   job {j['jobId']:5d} {dur:6.2f}s "
                          f"tasks={j['numCompletedTasks']:4d}")
            sys.stdout.flush()
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
