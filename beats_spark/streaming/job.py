"""Structured Streaming variant of the pipeline (SURVEY.md §2.10).

The reference is a continuous shipper: harvester tails files, the
memqueue batches (flush at 2048 events or 1 s), outputs ACK, the
registrar checkpoints. The Spark-native restatement:

  file/table stream source      ← harvester tailing
  micro-batch trigger           ← memqueue flush thresholds
  foreachBatch fan-out write    ← per-output workers + bulk sinks
  checkpointLocation            ← registrar data.json
  watermark + windowed aggs     ← ignore_older / metrics over time
  session windows               ← multiline timeout flush (5 s gap)

``foreachBatch`` reuses the exact batch router (one partitionBy write
per micro-batch), so batch and streaming share one code path — and
the streaming checkpoint gives the same at-least-once + idempotent
replace contract the manifest gives the batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.router import PART_COL, with_partition_id
from ..plans.pipeline import Pipeline
from ..schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Parquet-directory stream source (the harvester analog: new files
    under the path are discovered per trigger, like scan_frequency)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def run_stream(
    spark: SparkSession,
    pipeline: Pipeline,
    input_path: str,
    output_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """parse → enrich → route each micro-batch, fan-out append to the
    per-sink layout. Returns the started StreamingQuery."""
    stream = read_transcript_stream(spark, input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = pipeline.transform(with_partition_id(batch_df, pipeline.n_buckets))
        (
            routed.repartition(F.col("sink"), F.col(PART_COL))
            .sortWithinPartitions("sink", PART_COL, "conv_id", "turn_idx")
            .write.mode("append")
            .partitionBy("sink", PART_COL)
            .parquet(f"{output_root}/data")
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_sink_counts(
    routed_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-sink tallies over event-time tumbling windows with a
    watermark bounding late data (the reference's ignore_older) —
    the streaming form of the pipeline observer counters."""
    return (
        routed_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "sink")
        .agg(F.count("*").alias("events_published"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "sink",
            "events_published",
        )
    )


def sessionized_multiline(
    stream: DataFrame,
    gap: str = "5 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming multiline combine (multiline.go timeout flush): turns
    of one conversation within a session gap collapse into one
    document, emitted when the watermark passes the gap."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s.text,
                ),
                "\n",
            ).alias("doc"),
            F.count("*").alias("n_turns"),
        )
        .select(
            "conv_id",
            F.col("sess.start").alias("session_start"),
            "n_turns",
            F.length("doc").alias("doc_chars"),
        )
    )
