"""Structured Streaming: continuous cell assignment + windowed rollups.

The reference is a batch library (SURVEY.md §2.10); this is the engine's
streaming surface for the same cell math: a micro-batched event stream gets
leaf cells from the Arrow kernel, then a watermarked tumbling-window count
per coarse cell — the streaming form of the tile/occupancy rollup.  The
same plan runs with Trigger.AvailableNow for deterministic tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import kernels

_MULT1 = 2654435761
_MULT2 = 2246822519
_MOD = 1000003


def _placed(events: DataFrame) -> DataFrame:
    """Deterministic event placement (same int-hash scheme as the fact
    table) + leaf cell assignment."""
    lat = F.degrees(
        F.asin(2.0 * (((F.col("event_id") * _MULT1 + 12345) % _MOD) / float(_MOD)) - 1.0)
    )
    lng = 360.0 * (((F.col("event_id") * _MULT2 + 678901) % _MOD) / float(_MOD)) - 180.0
    out = events.withColumn("lat", lat).withColumn("lng", lng)
    return out.withColumn("cell_id", kernels.cell_from_latlng(F.col("lat"), F.col("lng")))


def cell_occupancy_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    level: int = 4,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream(parquet) -> cell assignment -> watermarked windowed count
    per level-L cell.  Caller attaches writeStream (tests use AvailableNow +
    memory sink)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # parquet TIMESTAMP_NTZ is not a valid event-time column; normalize
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    placed = _placed(stream)
    keyed = placed.withColumn(
        "parent_cell", kernels.parent_signed(F.col("cell_id"), level)
    )
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "parent_cell")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "parent_cell",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def cell_distinct_entities_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    level: int = 4,
    entity_mod: int = 97,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CUSTOM STATEFUL operator via ``applyInPandasWithState``: running
    per-cell distinct-entity count maintained in group state across
    micro-batches (the custom-stateful surface the built-in windowed aggs
    can't express — e.g. sessionization, dedup-in-stream, sketches).

    State per level-L cell = the sorted set of entity ids seen so far (at
    production scale the exact set swaps for a serialized HLL/theta sketch
    with the same state plumbing; the fixture cardinalities are small).
    Emits (parent_cell, n_distinct, n_events) per updated group per batch
    (Update mode; the LAST emission per cell is the running total).
    """
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        # source option (NOT a sink option): bounds each micro-batch
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    placed = _placed(stream)
    keyed = placed.withColumn(
        "parent_cell", kernels.parent_signed(F.col("cell_id"), level)
    ).withColumn("entity_id", F.col("event_id") % entity_mod)

    out_schema = T.StructType(
        [
            T.StructField("parent_cell", T.LongType(), False),
            T.StructField("n_distinct", T.LongType(), False),
            T.StructField("n_events", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("entities", T.ArrayType(T.LongType()), True),
            T.StructField("n_events", T.LongType(), True),
        ]
    )

    def update(key, pdfs, state):
        (cell,) = key
        if state.exists:
            entities, n_events = state.get
            seen = set(entities)
        else:
            seen, n_events = set(), 0
        for pdf in pdfs:
            seen.update(int(e) for e in pdf["entity_id"])
            n_events += len(pdf)
        state.update((sorted(seen), n_events))
        yield pd.DataFrame(
            {"parent_cell": [cell], "n_distinct": [len(seen)], "n_events": [n_events]}
        )

    return keyed.groupBy("parent_cell").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def pip_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    regions: list,
) -> DataFrame:
    """STREAMING point-in-region join: readStream -> cell kernel ->
    covering membership probe -> single-pass exact predicates.

    Works unchanged on a stream because the whole PIP plan is map-only on
    the fact side (broadcast covering kernel + native predicates — no
    shuffle, no stateful operator): the batch operator IS the streaming
    operator, which is the payoff of the covering-join design."""
    from ..operators.spatial_join import points_in_regions

    stream = spark.readStream.schema(schema).parquet(source_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    placed = _placed(stream)
    return points_in_regions(placed, regions).select("region_id", "event_id")


def pip_batch(events: DataFrame, regions: list) -> DataFrame:
    """The identical computation as a batch plan (oracle for the stream)."""
    from ..operators.spatial_join import points_in_regions

    return points_in_regions(_placed(events), regions).select("region_id", "event_id")


def cell_distinct_entities_batch(
    events: DataFrame, level: int = 4, entity_mod: int = 97
) -> DataFrame:
    """The identical computation as a batch plan (oracle for the stream)."""
    placed = _placed(events)
    keyed = placed.withColumn(
        "parent_cell", kernels.parent_signed(F.col("cell_id"), level)
    ).withColumn("entity_id", F.col("event_id") % entity_mod)
    return keyed.groupBy("parent_cell").agg(
        F.countDistinct("entity_id").alias("n_distinct"),
        F.count(F.lit(1)).alias("n_events"),
    )


def cell_occupancy_batch(events: DataFrame, level: int = 4, window: str = "1 hour") -> DataFrame:
    """The identical computation as a batch plan (oracle for the stream)."""
    placed = _placed(events)
    keyed = placed.withColumn(
        "parent_cell", kernels.parent_signed(F.col("cell_id"), level)
    )
    return (
        keyed.groupBy(F.window("ts", window).alias("w"), "parent_cell")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "parent_cell",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )
