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

# bench-mode cache layout (r17): ONLY the tables whose operators are
# compute-bound PER ROW (the text battery over documents, the BLAS /
# hash kernels over embeddings) get hash-repartitioned by primary id —
# for them one cached partition serializes seconds of per-row work per
# core. The relational tables (lineitem/orders/events/...) carry
# shuffle-light scan+agg queries whose sf-scale cached footprint is a
# few MB: measured at sf0.1, spreading them over 32 partitions only
# added task-scheduling + 32x32 shuffle-block overhead (q12 0.22 ->
# 0.43 s, q20 0.17 -> 0.46 s), so they keep the scan layout — at real
# scale their file splits provide the parallelism anyway.
_CACHE_PART_KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# minimum input bytes per cached partition: below this, task
# scheduling + shuffle-block fan-out cost more than the parallelism
# returns (measured at sf0.1: q50's light md5-agg was flat at <= 8
# partitions and 2.5x slower at 32, while q52's text battery kept
# winning — scripts/r17_cache_layout_ab.py + the nparts sweep in
# OPTIMIZATION_r17.md). At real scale bytes/64KB >> cores and the
# defaultParallelism cap governs.
_CACHE_REPART_MIN_BYTES_PER_PART = 64 * 1024


def _table_bytes(path: str) -> int:
    try:
        if os.path.isdir(path):
            return sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.is_file()
            )
        return os.path.getsize(path)
    except OSError:
        return 0


def _repartition_for_cache(
    spark: SparkSession, df: DataFrame, sf_dir: str, name: str
) -> DataFrame:
    """Bench-mode cache LAYOUT (r17, guide §2/§6 — flagged as a bench
    harness change in OPTIMIZATION_r17.md): the driver's testdata
    parquet is ONE ROW GROUP per table, so the raw scan — and the
    in-memory cache built directly on it — is a single partition, and
    every downstream per-row computation ran on one core regardless of
    $SPARK_GRAFT_CPUS (the r16 scaling block's flat 8-vs-32-core ratios
    were exactly this). Hash-repartitioning by the table's primary id
    BEFORE persisting spreads the cached batches across the executor
    cores: n = min(defaultParallelism, bytes / 64KB-per-partition) —
    the per-partition floor keeps toy-scale tables from fragmenting
    into pure scheduling overhead, the core cap (derived from
    $SPARK_GRAFT_CPUS) governs at scale. As a §2.4 bonus, the cached
    relation keeps hashpartitioning(id), so id-equi-joins over cached
    tables can skip an exchange. Deterministic
    (hash of the id, never rand), so retried tasks reproduce the same
    layout. Row VALUES are untouched; correctness runs (cache off)
    never take this path."""
    key = _CACHE_PART_KEYS.get(name)
    if key is None:
        return df
    size = _table_bytes(f"{sf_dir}/{name}.parquet")
    n = min(
        spark.sparkContext.defaultParallelism,
        max(1, size // _CACHE_REPART_MIN_BYTES_PER_PART),
    )
    if n <= 1:
        return df
    return df.repartition(n, key)


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
        df = _repartition_for_cache(spark, df, sf_dir, name).cache()
    _MEMO[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star table as a temp view for spark.sql queries."""
    for name in STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
