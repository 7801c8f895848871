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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def available_now_stream(
    spark: SparkSession,
    source_dir: str,
    schema=None,
    transform: Callable[[DataFrame], DataFrame] = None,
    checkpoint_dir: str = None,
    output_dir: str = None,
) -> None:
    """Process-everything-pending-then-stop over a parquet directory —
    the streaming form of the reference's restartable inference loop.
    Re-running picks up only new files (checkpoint = the done-set).

    ``schema=None`` (preferred) sniffs the schema from a batch read of
    the same directory, so the stream always tracks what's on disk. A
    caller-supplied schema is VALIDATED against the files when any
    exist: a column typed differently on disk raises instead of letting
    the file source silently mis-decode it (the q70/r4 failure mode —
    a stale LongType schema read timestamp_ntz data as 1970-epoch
    longs with no error). An empty source dir trusts the caller schema
    (nothing to validate yet; the stream needs one to start).
    """
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    else:
        from pyspark.errors import AnalysisException

        try:
            on_disk = {
                f.name: f.dataType.simpleString()
                for f in spark.read.parquet(source_dir).schema.fields
            }
        except AnalysisException as ex:
            # ONLY the two empty-source shapes skip validation (nothing
            # on disk to validate against — the stream still needs the
            # caller schema to start). Anything else (corrupt footer,
            # permission error) must propagate: swallowing it would
            # silently skip the very drift guard this function exists
            # for and start the stream on an unverified schema.
            marker = str(ex)  # the error class is embedded, e.g. "[PATH_NOT_FOUND] ..."
            if not any(
                m in marker
                for m in ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND", "Unable to infer")
            ):
                raise
            on_disk = None  # empty/missing dir: nothing to validate against
        if on_disk is not None:
            fields = (
                schema.fields
                if hasattr(schema, "fields")
                else spark.createDataFrame([], schema).schema.fields
            )
            drift = {
                f.name: (f.dataType.simpleString(), on_disk[f.name])
                for f in fields
                if f.name in on_disk
                and f.dataType.simpleString() != on_disk[f.name]
            }
            if drift:
                raise TypeError(
                    "available_now_stream: caller schema disagrees with "
                    f"the files in {source_dir}: "
                    + ", ".join(
                        f"{c} declared {d} but stored {a}"
                        for c, (d, a) in sorted(drift.items())
                    )
                    + " — a drifted schema silently mis-decodes; pass "
                    "schema=None to track the files"
                )
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


def streaming_register_sketch(
    events: DataFrame,
    item: Column,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed HLL registers over a stream: distinct-cardinality
    profiling with BOUNDED state — at most 4096 registers per open
    window, regardless of event rate (the batch sketch's constant-
    state property carried into Structured Streaming).

    Deployment shape: the STREAM materializes registers (this one
    stateful watermarked aggregation — append mode emits each
    window's registers once the watermark closes it); the ESTIMATE is
    computed on READ with the stateless batch `hll_estimate` over the
    register sink, because a second chained stateful aggregation is
    exactly what streaming restricts. Registers from the sink also
    `hll_merge` across windows/days for rollups — the sink IS the
    profile store. Streaming registers are bit-identical to batch
    registers over the same events (max is order-insensitive), which
    is how the test pins correctness.
    """
    from solarpaneldatawrangler_spark.operators.sketches import hll_bucket_rho

    bucket, rho = hll_bucket_rho(item)
    return (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(F.window(ts_col, window).alias("w"), F.col("bucket"))
        .agg(F.max("rho").alias("rho"))
        .select(F.col("w.start").alias("window_start"), "bucket", "rho")
    )
