"""Structured Streaming surface.

The reference is batch-with-resume (pickle checkpoints), which maps to
batch + lineage (engine/spark/lineage.py) — but a transcript firehose is
naturally a stream, so the engine also exposes the same extraction and
a windowed-aggregation operator as Structured Streaming jobs with
watermarked event-time windows and Trigger.AvailableNow (gives exactly
the reference's resume semantics via the checkpointLocation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_event_window_counts(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "stream_counts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source stream → watermarked tumbling-window counts → memory
    sink, run to completion with availableNow (batch-equivalent result,
    streaming execution path)."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(events_path)
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum → exact, deterministic across engines/partitions
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_extract_turns(
    spark: SparkSession,
    transcripts_path: str,
    checkpoint_dir: str,
    output_path: str,
) -> None:
    """Streaming flavour of the extraction pipeline: same per-turn parse
    (stateless map ⇒ identical semantics), file sink + checkpoint gives
    idempotent resume."""
    from engine.spark import pipeline

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = (
        spark.readStream.schema(schema).format("parquet").load(transcripts_path)
    )
    turns = pipeline.extract_turns(src)
    q = (
        turns.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
