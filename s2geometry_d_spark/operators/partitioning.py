"""Explicit cell-range partitioning and skew handling (north-rule items).

* ``repartition_by_cell_range`` — Hilbert-order range partitioning: signed
  cell ids sort in Hilbert order (SURVEY.md §1.4), so rangePartitioning on
  ``cell_id`` co-locates spatially-near rows, mirroring how every reference
  index keeps data S2CellId-sorted (s2point_index.d:27).  This is the
  clustering layout for the 100 TB fact table (Iceberg sort order).
* ``write_cell_partitioned`` — parquet layout partitioned by a coarse cell
  token prefix: partition pruning for ``cell_id BETWEEN lo AND hi`` scans.
* ``salt_hot_cells`` — covering joins concentrate on dense cells; cells
  whose row count exceeds a threshold get a salt column so a downstream
  shuffle key (cell, salt) splits them across reducers without changing
  results (idempotent union of split cells, SURVEY.md §4 skew row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels


def repartition_by_cell_range(
    df: DataFrame, num_partitions: int, cell_col: str = "cell_id"
) -> DataFrame:
    """Range-partition on the signed cell id: each output partition owns a
    contiguous Hilbert interval -> spatial locality + partition pruning."""
    return df.repartitionByRange(num_partitions, F.col(cell_col))


def with_partition_token(df: DataFrame, level: int = 3, cell_col: str = "cell_id") -> DataFrame:
    """Add a coarse partition key: the level-L ancestor's token (order-
    preserving string, human-readable Iceberg/hive partition values)."""
    return df.withColumn(
        "part_cell",
        kernels.cell_token(kernels.parent_signed(F.col(cell_col), level)),
    )


def write_cell_partitioned(
    df: DataFrame, path: str, level: int = 3, cell_col: str = "cell_id"
) -> None:
    """Write parquet hive-partitioned by coarse cell + sorted by cell id
    within partitions (zone maps then prune range predicates)."""
    (
        with_partition_token(df, level, cell_col)
        .repartition(F.col("part_cell"))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .partitionBy("part_cell")
        .parquet(path)
    )


def cell_histogram(df: DataFrame, level: int, cell_col: str = "cell_id") -> DataFrame:
    return (
        df.withColumn("_pc", kernels.parent_signed(F.col(cell_col), level))
        .groupBy("_pc")
        .agg(F.count("*").alias("n_rows"))
    )


def salt_hot_cells(
    df: DataFrame,
    level: int,
    threshold: int,
    n_salts: int = 8,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Add (parent_cell, salt) columns; salt > 0 only for hot cells.

    The salt is deterministic (hash of the leaf cell id) so re-runs are
    idempotent; joins against a per-cell table replicate the small side
    across the n_salts buckets for hot cells only.
    """
    hist = cell_histogram(df, level, cell_col).filter(F.col("n_rows") > threshold)
    hot = hist.select(F.col("_pc").alias("parent_cell")).withColumn("is_hot", F.lit(True))
    out = df.withColumn("parent_cell", kernels.parent_signed(F.col(cell_col), level))
    out = out.join(F.broadcast(hot), "parent_cell", "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("is_hot").isNotNull(),
            F.pmod(F.hash(F.col(cell_col)), F.lit(n_salts)),
        ).otherwise(F.lit(0)),
    ).drop("is_hot")


def salted_cell_join(
    fact: DataFrame,
    dim: DataFrame,
    level: int,
    threshold: int,
    n_salts: int = 8,
    cell_col: str = "cell_id",
    dim_cell_col: str = "parent_cell",
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a (possibly hot-keyed) fact table against a
    per-cell dimension table — the north rule's explicit salting case.

    Cells whose fact row count exceeds ``threshold`` are HOT: their fact
    rows get a deterministic salt in [0, n_salts) and the matching dim rows
    are REPLICATED across all salts, so the shuffle key (parent_cell, salt)
    splits each hot cell across n_salts reducers; cold cells join on salt 0
    with no replication.  Result rows are identical to the unsalted join
    (asserted by tests/test_pipeline_resume.py::test_salted_cell_join_*).

    ``how`` is restricted to inner/left-flavored joins: under right/full
    outer joins the dim rows replicated across n_salts salts would each
    surface as a duplicate unmatched output row, breaking the
    unsalted-join equivalence (ADVICE round-4)."""
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_cell_join: how={how!r} unsupported — hot-cell dim rows "
            "are replicated across salts, so right/full outer joins would "
            "emit n_salts duplicate unmatched dim rows; use inner or a "
            "left-flavored join"
        )
    hist = cell_histogram(fact, level, cell_col).filter(F.col("n_rows") > threshold)
    hot = hist.select(F.col("_pc").alias("parent_cell")).withColumn(
        "is_hot", F.lit(True)
    )
    f = (
        fact.withColumn("parent_cell", kernels.parent_signed(F.col(cell_col), level))
        .join(F.broadcast(hot), "parent_cell", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot").isNotNull(),
                F.pmod(F.hash(F.col(cell_col)), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )
    d = dim.withColumnRenamed(dim_cell_col, "parent_cell") if dim_cell_col != "parent_cell" else dim
    d = (
        d.join(F.broadcast(hot), "parent_cell", "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("is_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("salt", F.explode("_salts"))
        .drop("_salts", "is_hot")
    )
    return f.join(d, ["parent_cell", "salt"], how).drop("salt")
