"""Tests: salted skew join correctness, bucketed write, and the
applyInPandasWithState stateful streaming operator."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.skew import salted_join
from solarpaneldatawrangler_spark.streaming.stateful import streaming_running_stats


def test_salted_join_matches_plain_join(spark, sf_dir):
    from solarpaneldatawrangler_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders").limit(2000)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            cust,
            "c_custkey",
            salt_buckets=8,
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.c_mktsegment, r.n) for r in plain.collect()} == {
        (r.c_mktsegment, r.n) for r in salted.collect()
    }


def test_stateful_running_stats_across_batches(spark, tmp_path):
    """Drive applyInPandasWithState with a real micro-batch stream: two
    parquet files arriving as separate batches; state must carry over."""
    src = tmp_path / "stream_src"
    src.mkdir()
    chk = str(tmp_path / "chk")

    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = streaming_running_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [("a", 4.0)], "event_type string, value double"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT * FROM stateful_out"
    ).collect()
    # last update for key 'a' must include state from batch1 (count 3, sum 7)
    # (index access: Row.count is the tuple method, not the column)
    last_a = [r for r in rows if r.key == "a"][-1]
    assert last_a["count"] == 3 and last_a.total == 7.0 and last_a.max_value == 4.0
    last_b = [r for r in rows if r.key == "b"][-1]
    assert last_b["count"] == 1 and last_b.total == 10.0


def test_streaming_dedup_drops_redeliveries_across_batches(spark, tmp_path):
    """Two micro-batches where batch2 redelivers a batch1 event (same
    key, inside the watermark): the duplicate must not be emitted; the
    genuinely-new key must be."""
    import datetime as dt

    from solarpaneldatawrangler_spark.streaming.incremental import streaming_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp"

    spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(seconds=30))], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = streaming_dedup(stream, ["event_id"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch2: event 1 redelivered (dup, 45s later, within watermark)
        # plus a new event 3
        spark.createDataFrame(
            [(1, t0 + dt.timedelta(seconds=45)), (3, t0 + dt.timedelta(seconds=60))],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))
        q.processAllAvailable()
    finally:
        q.stop()

    ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert ids == [1, 2, 3]
