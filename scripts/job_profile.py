"""Per-query Spark JOB breakdown via the UI REST API: run each target query
once (after a warmup), then list every job it spawned with duration — the
direct evidence for "this query is N sequential jobs of fixed overhead"
versus "one heavy stage".

Usage: python scripts/job_profile.py <query> [query ...] [--sf dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    targets = args

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from bench import force

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    force(qs["token_count"](spark, sf_dir))
    force(qs["cell_roundtrip"](spark, sf_dir))

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4055/api/v1/applications/{app_id}/jobs"

    def jobs_now():
        with urllib.request.urlopen(base) as r:
            return json.load(r)

    for name in targets:
        # warm run (indexes/caches built once, like the bench's min-of-2)
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        warm = time.time() - t0
        before = {j["jobId"] for j in jobs_now()}
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        wall = time.time() - t0
        time.sleep(0.3)
        jobs = [j for j in jobs_now() if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        total_job_s = 0.0
        print(f"\n=== {name}: wall {wall:.2f}s (first run {warm:.2f}s), {len(jobs)} jobs")
        for j in jobs:
            t_sub = j.get("submissionTime", "")
            t_end = j.get("completionTime", "")
            from datetime import datetime

            def _p(s):
                return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

            dur = (_p(t_end) - _p(t_sub)).total_seconds() if t_sub and t_end else -1
            total_job_s += max(dur, 0)
            print(
                f"  job {j['jobId']:4d}  {dur:6.2f}s  stages={len(j.get('stageIds', []))}"
                f"  tasks={j.get('numTasks', 0):5d}  {j.get('name', '')[:70]}"
            )
        print(f"  sum(job durations) = {total_job_s:.2f}s; gaps (driver think) = {wall - total_job_s:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
