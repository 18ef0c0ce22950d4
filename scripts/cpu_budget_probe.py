"""Host CPU-budget probe — the controlled experiment behind the scaling
carve-out (round-4 verdict ask #4).

Runs a pure-CPython arithmetic loop (no Spark, no I/O, no IPC) across P
processes for P in {1, 4, 8, 16, 24, 32} and reports the EFFECTIVE core
count (P x single_time / wall).  nproc says 32 and no cgroup quota is set
(cpu.cfs_quota_us = -1, cpuset 0-31), yet throughput saturates well below
P — hypervisor-level vCPU contention this guest cannot control.  The
derived ceilings bound ANY engine's measurable scaling efficiency between
process counts on this box: a Spark leg at local[C] runs ~2C runnable
processes (C JVM task threads + C Python workers), so the honest ceiling
for a local[4] -> local[16] comparison is the 8 -> 32 process row.

Writes BENCH/cpu_budget.json and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

PROCS = (4, 8, 16, 24, 32)
N = 30_000_000


def burn(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return time.time() - t0


def main() -> None:
    single = min(burn(N) for _ in range(3))
    eff_cores = {1: 1.0}
    for procs in PROCS:
        best = None
        with mp.Pool(procs) as p:
            for _ in range(2):
                t0 = time.time()
                p.map(burn, [N] * procs)
                wall = time.time() - t0
                best = wall if best is None else min(best, wall)
        eff_cores[procs] = round(procs * single / best, 2)
    ceilings = {
        # scaling efficiency ceiling from P to 4P processes
        f"{p}->{4*p}": round(eff_cores[4 * p] / (4.0 * eff_cores[p]), 3)
        for p in (4, 8)
    }
    out = {
        "single_sec": round(single, 3),
        "effective_cores": {str(k): v for k, v in eff_cores.items()},
        "scaling_ceiling_by_procs": ceilings,
        "note": (
            "pure-CPython loops, no Spark: any engine measuring scaling "
            "between process counts P and 4P on this box is bounded by "
            "these ratios"
        ),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "cpu_budget.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
