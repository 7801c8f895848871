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
        # r17 (guide §6): maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/minPartitionNum)) — the 4 MB
        # openCost default FLOORS the split size, so a small-but-
        # compute-heavy table (sf-scale documents: ~6 MB of text whose
        # per-row cost is the whole q52 battery) scanned as 1-2 tasks
        # no matter how many row groups or cores. 128 KB still prevents
        # absurd fragment packing of many-small-file stores, and at
        # 100 TB totalBytes/minPartitionNum >> openCost so the value is
        # inert. Env-overridable for deployments.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(128 * 1024)),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if not master.startswith("local["):
        _ship_package(spark)
    return spark


_SHIPPED_APP_IDS: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor python workers (r14, caught by
    the local-cluster smoke): in local[*] the workers inherit the
    driver's sys.path, but on ANY multi-process master — local-cluster
    and real clusters alike — executor-spawned python workers cannot
    import solarpaneldatawrangler_spark, so every pandas-UDF closure
    that references a module function dies with ModuleNotFoundError
    (q51/q52/q59... — the Arrow paths). addPyFile of a package zip is
    the standard --py-files deployment story and works on every
    cluster manager; idempotent per Spark application."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APP_IDS:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Stage the zip inside the SparkContext's OWN per-app temp dir (r15;
    # Utils.createTempDir registers a JVM shutdown hook that removes it,
    # so nothing leaks per application). It must NOT be deleted eagerly:
    # the driver's file server serves addPyFile content FROM THE
    # REGISTERED PATH for the app's whole lifetime — deleting it after
    # the call broke every executor fetch with "Stream .../pkg.zip was
    # not found" (caught by the r15 fault-injection smoke; executors
    # retried 4x and failed the stage).
    d = getattr(spark.sparkContext, "_temp_dir", None)
    cleanup_at_exit = False
    if not d or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="spark_graft_pyfiles_")
        cleanup_at_exit = True
    zip_path = shutil.make_archive(
        os.path.join(d, "solarpaneldatawrangler_spark_pkg"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir="solarpaneldatawrangler_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    if cleanup_at_exit:
        import atexit

        atexit.register(shutil.rmtree, d, ignore_errors=True)
    _SHIPPED_APP_IDS.add(app_id)


def _is_single_host_master(master: str) -> bool:
    """True for masters whose driver and executors share one
    filesystem: bare ``local``, ``local[N]``/``local[*]``, and
    ``local-cluster[n,c,m]`` (separate JVMs, same host). Everything
    else (spark://, yarn, k8s://, mesos) is multi-machine."""
    return master == "local" or master.startswith(
        ("local[", "local-cluster[")
    )


def prewarm(spark: SparkSession, warmup_dir: str | None = None) -> None:
    """One-time per-JVM warmup for deployments (r14, VERDICT item 7).

    A fresh JVM's first real query pays whole-stage-codegen compiler
    warmup, JIT, parquet-reader, broadcast and shuffle infra setup on
    top of its own plan+scan: measured on q01 at sf0.1, the first run
    costs 2.451s vs 0.341s converged, and running THIS generic warmup
    first (4.7s, synthetic data only — no user table touched) cuts the
    first real query to 0.785s (-68%); the residual is the query's own
    plan codegen + scan, which no generic warmup can pay in advance
    (bench_out/r14_fresh_warmup.json, best-of-3 interleaved arms).
    On a real cluster this runs once per executor lifetime, amortized
    across every query that follows; the bench's value_fresh_jvm pass
    deliberately does NOT call it — that series measures the raw
    first-run a deployment pays without it.

    Cluster safety (r15, ADVICE): the codegen/JIT/broadcast/shuffle
    phases use in-memory frames (spark.range) and are safe on ANY
    master. The parquet-reader phase needs a path every executor can
    reach, so a driver-local tempdir is only valid on single-host
    masters (local[*] / local-cluster[*]); on multi-machine clusters
    pass ``warmup_dir`` on shared storage (HDFS/S3/NFS) or the parquet
    phase is skipped rather than failing against a path the executors
    cannot see."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    spark.range(2_000_000).selectExpr("sum(id * 3 + 1)").collect()
    base = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    dim = spark.range(7).select(F.col("id").alias("k"))
    base.join(F.broadcast(dim), "k").groupBy("k").count().collect()
    base.repartition(8, "k").groupBy("k").count().collect()

    # bare "local" (single thread, no bracket) is just as single-host
    # as local[N]/local-cluster[...] — r16 ADVICE: startswith alone
    # misclassified it as multi-machine and silently skipped the
    # parquet-reader warmup phase
    single_host = _is_single_host_master(spark.sparkContext.master)
    made_tmp = False
    if warmup_dir is None and single_host:
        warmup_dir = tempfile.mkdtemp(prefix="spark_graft_prewarm_")
        made_tmp = True
    if warmup_dir is None:
        return  # multi-machine master, no shared dir given
    try:
        base.write.mode("overwrite").parquet(warmup_dir)
        spark.read.parquet(warmup_dir).groupBy("k").count().collect()
    finally:
        if made_tmp:
            shutil.rmtree(warmup_dir, ignore_errors=True)
