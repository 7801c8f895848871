"""Parquet readers for the driver star schema (TESTDATA.md).

Columnar parquet scans give Catalyst predicate pushdown + column pruning
for free; every query in the catalog reads through here.
"""

from __future__ import annotations

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


def ensure_session_confs(spark: SparkSession) -> None:
    """Self-defense for externally-created sessions (the driver harness
    builds its own SparkSession without our factory): events.parquet is
    TIMESTAMP(NANOS) — unreadable unless nanosAsLong is on — and every
    timestamp comparison against the DuckDB oracle assumes UTC. Both are
    runtime-settable SQL confs."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # read-only conf in some environments; session.py sets both


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as a long of
        # epoch nanos — convert to a real timestamp (micro precision)
        field = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        if field.get("ts") == "bigint":
            # integer div: ts/1000 via double loses +-1us (epoch nanos
            # exceed 2^53, beyond double's exact-integer range)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star table as a temp view for spark.sql queries."""
    for name in STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
