"""Incremental / streaming processing patterns (SURVEY.md §2.10).

The reference has no streams — its restartable batch loop
(/root/reference/run_inference.py:101-128: query undone rows, process,
flag done, repeat) is a hand-rolled micro-batch executor. Two
Spark-native replacements:

1. incremental_batch: stateless anti-join remainder (operators.relational
   .incremental_remainder) — idempotent, exactly the ON-CONFLICT
   restartability semantics, no flags to persist.
2. available_now_stream: Structured Streaming with Trigger.AvailableNow
   over a file source — Spark's checkpoint tracks what's been processed
   (replacing the has_image/inference_ran flag columns), and the same
   query graduates to a continuous stream by changing only the trigger.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def available_now_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    output_dir: str,
) -> None:
    """Process-everything-pending-then-stop over a parquet directory —
    the streaming form of the reference's restartable inference loop.
    Re-running picks up only new files (checkpoint = the done-set).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = transform(stream)
    (
        out.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", output_dir)
        .outputMode("append")
        .start()
        .awaitTermination()
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    works identically on a batch DataFrame (q21_time_bucket is the batch
    twin) and a readStream source with late-data handling.
    """
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: keep the first event per
    key, dropping re-deliveries that arrive within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` stores each key only until the
    watermark passes it, so state is O(keys per horizon) instead of
    O(all keys ever) — the property that lets a dedup stream run forever
    at 100 TB/day ingest. (Plain ``dropDuplicates`` on a stream grows
    state without bound; the batch twin of this operator is
    operators.dedup.exact_dedup.) At-least-once sources (Kafka, file
    redelivery) become effectively-once for any downstream agg.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
