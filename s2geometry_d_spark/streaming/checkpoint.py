"""Resumable pipelines with per-partition lineage and metrics tables.

North-rule obligation (SURVEY.md §2.10): each pipeline stage writes a table
snapshot; a ``lineage`` table records (run stage, partition, status, rows,
wall time); a restarted driver anti-joins completed partitions and processes
only the remainder.  In this repo the catalog is parquet directories (the
Iceberg jars are not in the container — the layout mirrors Iceberg snapshot
semantics: immutable stage outputs + a commit marker; swap
``write_stage``/``read_stage`` for Iceberg ``writeTo`` when available).

Partition unit: a coarse S2 cell prefix (``part_cell`` token), so resume
granularity is spatial — matching how the 100 TB table is laid out.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = [
    "run_id",
    "stage",
    "partition_id",
    "status",
    "rows_out",
    "wall_ms",
    "ts",
]


@dataclass
class PipelineContext:
    spark: SparkSession
    root: str
    run_id: str

    # -- lineage ---------------------------------------------------------
    def _lineage_dir(self) -> str:
        return os.path.join(self.root, "_lineage")

    def record(self, stage: str, partition_id: str, status: str, rows_out: int, wall_ms: int):
        os.makedirs(self._lineage_dir(), exist_ok=True)
        fname = os.path.join(
            self._lineage_dir(), f"{self.run_id}_{stage}_{partition_id}.json"
        )
        with open(fname, "w") as f:
            json.dump(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "partition_id": partition_id,
                    "status": status,
                    "rows_out": rows_out,
                    "wall_ms": wall_ms,
                    "ts": time.time(),
                },
                f,
            )

    def lineage(self) -> DataFrame:
        d = self._lineage_dir()
        rows = []
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        rows.append(json.load(f))
        if not rows:
            return self.spark.createDataFrame(
                [], "run_id string, stage string, partition_id string, status string,"
                " rows_out long, wall_ms long, ts double"
            )
        return self.spark.createDataFrame(rows)

    def completed_partitions(self, stage: str) -> set[str]:
        d = self._lineage_dir()
        done = set()
        if os.path.isdir(d):
            for fn in os.listdir(d):
                if fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        rec = json.load(f)
                    if rec["stage"] == stage and rec["status"] == "done":
                        done.add(rec["partition_id"])
        return done

    # -- stage I/O ---------------------------------------------------------
    def stage_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def run_stage(
        self,
        stage: str,
        df: DataFrame,
        partition_col: str = "part_cell",
    ) -> DataFrame:
        """Execute a stage partition-by-partition with resume.

        ``df`` must carry ``partition_col``.  Completed partitions (from any
        earlier run against this root) are skipped; each finished partition
        commits its parquet output + a lineage record atomically enough for
        retry-idempotence (rewrite-then-mark).
        Returns the full stage output (resumed + fresh).
        """
        parts = [r[0] for r in df.select(partition_col).distinct().collect()]
        done = self.completed_partitions(stage)
        todo = [p for p in parts if str(p) not in done]
        out_dir = self.stage_path(stage)
        if todo:
            # ONE partitioned write for every todo partition (dynamic
            # partition overwrite leaves completed partitions' files alone)
            # instead of a driver loop of per-partition Spark jobs — at 10^4
            # partitions the loop was 10^4 sequential jobs.  Lineage records
            # commit only after the whole write succeeds; a mid-write crash
            # leaves no records, so the retry rewrites the same todo set
            # (rewrite-then-mark idempotence, unchanged).
            t0 = time.time()
            todo_df = df.filter(F.col(partition_col).isin(todo))
            (
                todo_df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(out_dir)
            )
            wall_ms = int(1000 * (time.time() - t0))
            counts = {
                str(r[0]): r[1]
                for r in self.spark.read.option("basePath", out_dir)
                .parquet(out_dir + "/*")
                .filter(F.col(partition_col).isin(todo))
                .groupBy(partition_col)
                .count()
                .collect()
            }
            for p in todo:
                self.record(stage, str(p), "done", counts.get(str(p), 0), wall_ms)
        return self.read_stage(stage)

    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.option("basePath", self.stage_path(stage)).parquet(
            self.stage_path(stage) + "/*"
        )

    # -- metrics -----------------------------------------------------------
    def metric(self, stage: str, name: str, value: float):
        self.record(stage, f"metric_{name}", "metric", int(value), 0)
