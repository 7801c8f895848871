"""Schema-drift guards (round-6 hardening of the r4 q70 failure):
the testdata generator has changed events.ts types across generations
(TIMESTAMP(NANOS)-as-bigint, then timestamp_ntz); a hardcoded schema
mis-decoded one generation into silent 1970-epoch windows. These tests
feed type-shifted events files through every timestamp-consuming path
and assert correct rows or a LOUD error — never silent garbage."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.sources.star import (
    load_table,
    normalize_event_ts,
)

T0 = dt.datetime(2026, 3, 1, 12, 0, 0)


def _write_events(spark, path, ts_sql_type):
    """A tiny events table whose ts column is stored as the given type,
    with wall clocks in 2026 — a 1970 reading is unambiguous drift."""
    base = spark.createDataFrame(
        [
            (1, 10, "purchase", 5.0, T0),
            (2, 10, "error", 1.0, T0 + dt.timedelta(minutes=30)),
            (3, 11, "purchase", 2.0, T0 + dt.timedelta(hours=2)),
        ],
        "event_id long, user_id long, event_type string, value double, ts timestamp",
    )
    if ts_sql_type == "bigint":
        # epoch-nano longs: what TIMESTAMP(NANOS) parquet arrives as
        # under spark.sql.legacy.parquet.nanosAsLong
        base = base.withColumn(
            "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
        )
    elif ts_sql_type != "timestamp":
        base = base.withColumn("ts", F.col("ts").cast(ts_sql_type))
    base.coalesce(1).write.mode("overwrite").parquet(str(path))


@pytest.mark.parametrize("stored", ["bigint", "timestamp_ntz", "timestamp"])
def test_known_generations_decode_to_2026(spark, tmp_path, stored):
    p = tmp_path / f"events_{stored}"
    _write_events(spark, p, stored)
    df = normalize_event_ts(spark.read.parquet(str(p)))
    assert dict(df.dtypes)["ts"] == "timestamp"
    years = sorted(
        r[0] for r in df.select(F.year("ts")).distinct().collect()
    )
    assert years == [2026], f"{stored} generation decoded to {years}"
    # wall clock preserved exactly (UTC session): min event is T0
    lo = df.agg(F.min("ts")).collect()[0][0]
    assert lo == T0


def test_unknown_ts_type_fails_loudly(spark, tmp_path):
    p = tmp_path / "events_str"
    _write_events(spark, p, "string")
    with pytest.raises(TypeError, match="arrived as 'string'"):
        normalize_event_ts(spark.read.parquet(str(p)))


def test_missing_ts_column_fails_loudly(spark):
    df = spark.range(3).select(F.col("id").alias("event_id"))
    with pytest.raises(TypeError, match="absent"):
        normalize_event_ts(df)


def test_load_table_normalizes_real_events(spark, sf_dir):
    """Whatever generation the driver's current testdata is, load_table
    must surface tz-aware timestamps in a sane year (not 1970)."""
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    lo, hi = ev.agg(F.min(F.year("ts")), F.max(F.year("ts"))).collect()[0]
    assert lo > 2000 and hi < 2100, f"events decoded into years {lo}..{hi}"


def test_q70_rejects_unknown_ts_generation(spark, tmp_path):
    """The streaming entry must REFUSE a new ts type, not stream 1970s
    (the exact r4 failure shape, now with a third type-shift)."""
    from solarpaneldatawrangler_spark.plans import CATALOG

    _write_events(spark, tmp_path / "events.parquet", "string")
    with pytest.raises(TypeError, match="arrived as 'string'"):
        CATALOG["q70_streaming_window"].fn(spark, str(tmp_path))


def test_available_now_stream_rejects_drifted_caller_schema(spark, tmp_path):
    """A stale caller schema (long ts over an ntz file — r4's silent
    killer) must raise, naming the drifted column."""
    from solarpaneldatawrangler_spark.streaming.incremental import (
        available_now_stream,
    )

    src = tmp_path / "src"
    _write_events(spark, src, "timestamp_ntz")
    with pytest.raises(TypeError, match="ts declared bigint but stored timestamp_ntz"):
        available_now_stream(
            spark,
            str(src),
            schema="event_id long, user_id long, event_type string, "
            "value double, ts bigint",
            transform=lambda df: df,
            checkpoint_dir=str(tmp_path / "chk"),
            output_dir=str(tmp_path / "out"),
        )


def test_available_now_stream_propagates_corrupt_source(spark, tmp_path):
    """A validation-read failure that is NOT 'empty dir' (here: a corrupt
    parquet footer) must propagate instead of being swallowed as
    nothing-to-validate — the stream must never start on an unverified
    schema (ADVICE r6: the old blanket except skipped the guard)."""
    from solarpaneldatawrangler_spark.streaming.incremental import (
        available_now_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "part-0000.parquet").write_bytes(b"this is not a parquet file")
    chk = tmp_path / "chk"
    with pytest.raises(Exception) as ei:
        available_now_stream(
            spark,
            str(src),
            schema="event_id long, ts timestamp",
            transform=lambda df: df,
            checkpoint_dir=str(chk),
            output_dir=str(tmp_path / "out"),
        )
    assert "nothing to validate" not in str(ei.value)
    # fast-fail proof: the failure came from the validation read, before
    # the stream (and its checkpoint) ever started
    assert not chk.exists()


def test_available_now_stream_accepts_empty_source_dir(spark, tmp_path):
    """An EXISTING but empty source dir is the legitimate skip case:
    nothing on disk to validate, the caller schema starts the stream."""
    from solarpaneldatawrangler_spark.streaming.incremental import (
        available_now_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    available_now_stream(
        spark,
        str(src),
        schema="event_id long, ts timestamp",
        transform=lambda df: df,
        checkpoint_dir=str(tmp_path / "chk"),
        output_dir=str(tmp_path / "out"),
    )


def test_available_now_stream_sniffs_schema_when_none(spark, tmp_path):
    from solarpaneldatawrangler_spark.streaming.incremental import (
        available_now_stream,
    )

    src = tmp_path / "src"
    _write_events(spark, src, "timestamp")
    out = tmp_path / "out"
    available_now_stream(
        spark,
        str(src),
        schema=None,
        transform=lambda df: df.filter(F.col("event_type") == "purchase"),
        checkpoint_dir=str(tmp_path / "chk"),
        output_dir=str(out),
    )
    got = spark.read.parquet(str(out))
    assert got.count() == 2
    assert dict(got.dtypes)["ts"] == "timestamp"
