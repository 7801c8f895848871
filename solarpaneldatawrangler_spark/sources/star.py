"""Parquet readers for the driver star schema (TESTDATA.md).

Columnar parquet scans give Catalyst predicate pushdown + column pruning
for free; every query in the catalog reads through here.

Loaded tables are memoized per (application, sf_dir, table): reusing
the analyzed DataFrame skips repeated footer reads / schema resolution
when a catalog run touches the same table dozens of times. The memo
reuses PLANS only — physical scans stay lazy and pushdown-capable.
Setting SPARK_GRAFT_CACHE_TABLES=1 additionally persists each table in
memory (bench mode: pays one materialization, then every query reads
columnar cache instead of parquet; leave off when asserting scan-level
plan shapes).
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAR_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def ensure_session_confs(spark: SparkSession) -> None:
    """Self-defense for externally-created sessions (the driver harness
    builds its own SparkSession without our factory): events.parquet is
    TIMESTAMP(NANOS) — unreadable unless nanosAsLong is on — and every
    timestamp comparison against the DuckDB oracle assumes UTC. Both are
    runtime-settable SQL confs; read back after setting and WARN when
    they didn't stick (a silent non-UTC session would diverge from the
    oracle with no diagnostic)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # read-only conf in some environments; verify below
    problems = []
    try:
        if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            problems.append("spark.sql.session.timeZone != UTC")
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "") != "true":
            problems.append("spark.sql.legacy.parquet.nanosAsLong != true")
    except Exception:
        return  # conf unreadable: nothing more we can check
    if problems:
        warnings.warn(
            "session confs could not be applied (" + "; ".join(problems) + "): "
            "timestamp results may diverge from the UTC oracle and "
            "events.parquet (TIMESTAMP NANOS) may fail to read",
            RuntimeWarning,
            stacklevel=2,
        )


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event timestamp to a tz-aware TIMESTAMP or fail
    LOUDLY — never decode silently into 1970s.

    The driver's testdata generator has shipped events.ts as parquet
    TIMESTAMP(NANOS) (a bigint of epoch nanos under nanosAsLong) in one
    generation and timestamp_ntz in another; round 4's q70 broke because
    a hardcoded LongType stream schema mis-decoded the ntz generation
    into 1970-epoch windows with no error. This is the single
    schema-drift chokepoint for every timestamp-consuming query (batch
    via load_table, streaming via q70 / available_now_stream): the three
    types that have shipped convert explicitly, anything else raises
    with the observed type.

    Works on batch AND streaming DataFrames (schema-only inspection).
    """
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    t = types.get(col)
    if t is None:
        raise TypeError(
            f"normalize_event_ts: column {col!r} absent; events schema "
            f"drifted to {types}"
        )
    if t == "timestamp":
        return df
    if t == "bigint":
        # epoch nanos -> micro-precision timestamp (integer div: nanos
        # exceed 2^53, double arithmetic would lose +-1us)
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
        )
    if t == "timestamp_ntz":
        # watermarks/session math demand tz-aware TIMESTAMP; the session
        # TZ is pinned UTC (ensure_session_confs), so the cast preserves
        # the wall clock exactly
        return df.withColumn(col, F.col(col).cast("timestamp"))
    raise TypeError(
        f"normalize_event_ts: events.{col} arrived as {t!r}; known "
        "generations are TIMESTAMP(NANOS)-as-bigint, timestamp_ntz, and "
        "timestamp. The testdata generator changed again — add the new "
        "type here deliberately instead of letting it mis-decode."
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        app_id = "unknown"
    key = (app_id, sf_dir, name)
    cached = _MEMO.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    if os.environ.get("SPARK_GRAFT_CACHE_TABLES") == "1":
        df = df.cache()
    _MEMO[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star table as a temp view for spark.sql queries."""
    for name in STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
