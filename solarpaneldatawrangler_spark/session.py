"""SparkSession factory.

Tuned for the driver's local[N] harness but with cluster-scale defaults:
AQE on (runtime join re-planning, partition coalescing, skew-join
splitting), shuffle partitions sized to cores locally (on a real cluster
you'd set this to 2-3x total cores or rely on AQE coalescing), UTC
session timezone so timestamp semantics match the DuckDB oracle, and
Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def get_spark(
    app_name: str = "spark-wrangler",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else 32.
    ``shuffle_partitions`` defaults to ``cpus`` — right-sized for local
    mode; AQE coalesces further at runtime.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # SPARK_GRAFT_MASTER (r14): lets the local-cluster smoke run the
    # same engine on REAL separate executor JVMs (e.g.
    # "local-cluster[2,4,2048]") — flushes single-JVM assumptions
    # (py4j planner probes, localCheckpoint executor-loss semantics)
    # without touching any call site. Default unchanged: local[N].
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which Spark refuses by default; read as long + convert in sources.star
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
