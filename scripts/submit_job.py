"""Cluster job entrypoint for spark-submit (north rule: "runs via
spark-submit --py-files on multi-executor clusters").

The library ships as a zip on --py-files; this script only assumes
``s2geometry_d_spark`` is importable and a SparkSession is provided by the
submit machinery (master/executors/conf come from spark-submit flags, NOT
from code — the same file runs unchanged on local[N] or a real cluster).

    spark-submit --master <cluster> --py-files s2geometry_d_spark.zip \\
        scripts/submit_job.py <sf_dir> [query ...]

Runs each named query (default: the flagship PIP join) and prints one JSON
line per query with row count and wall time.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or ["pip_cap_join"]

    # spark-submit owns master/deploy-mode/conf; just get the session
    spark = SparkSession.builder.appName("s2spark-submit-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # the driver contract module rides on --py-files next to the package
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        print(
            json.dumps(
                {"query": name, "rows": n, "sec": round(time.time() - t0, 3)}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
