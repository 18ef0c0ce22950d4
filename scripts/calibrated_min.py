"""Control-calibrated per-query bench: run a CONTROL query and the target
queries interleaved in ONE session, several rounds, and report per-query
minima plus the control's minimum from the same host phase.

The sandbox's noise comes in PHASES (identical warm runs 2x-5x apart
minutes later), so a target timing is only interpretable next to a control
measured in the same phase: report target_min / control_min as the
phase-normalized cost.

Usage: python scripts/calibrated_min.py <query> [query ...] [--sf dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONTROL = "pip_cap_join"
ROUNDS = 3


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    targets = args or ["knn_edge_targets", "knn_edges_maxdist"]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from bench import force

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
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
    force(qs["token_count"](spark, sf_dir))
    force(qs["cell_roundtrip"](spark, sf_dir))

    mins: dict[str, float] = {}
    for _ in range(ROUNDS):
        for name in [CONTROL, *targets]:
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            dt = time.time() - t0
            mins[name] = min(mins.get(name, float("inf")), dt)
    ctrl = mins.pop(CONTROL)
    out = {
        "control": CONTROL,
        "control_min_sec": round(ctrl, 3),
        "targets": {
            q: {"min_sec": round(v, 3), "vs_control": round(v / ctrl, 2)}
            for q, v in mins.items()
        },
        "sf_dir": sf_dir,
        "rounds": ROUNDS,
    }
    print(json.dumps(out), flush=True)
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
