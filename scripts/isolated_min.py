"""Isolated per-query bench: run ONE query in a fresh SparkSession/process
and print its wall time.  The sandbox shows 10-30x one-sided scheduler noise
on identical jobs (BENCH/BASELINE.md), so regressions are only real if they
reproduce as the MIN over several isolated runs.

Usage: python scripts/isolated_min.py <query> [sf_dir]
Prints one line: {"query": ..., "sec": ..., "rows": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from bench import force

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("s2spark-isolated")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # JVM/Arrow + Python-worker warmup on unrelated queries, excluded
    force(qs["token_count"](spark, sf_dir))
    force(qs["cell_roundtrip"](spark, sf_dir))
    t0 = time.time()
    n = force(qs[query](spark, sf_dir))
    dt = time.time() - t0
    print(json.dumps({"query": query, "sec": round(dt, 3), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
