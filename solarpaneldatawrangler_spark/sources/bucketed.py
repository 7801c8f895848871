"""Bucketed (pre-shuffled, co-located) table layout — the pay-once
shuffle-elimination mechanism for repeated joins/aggregations on a
stable key.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders on
the order key, admission probes on a fingerprint key, embeddings ⋈
documents on doc_id) is the shuffle: every repetition of the join
re-hashes and re-transfers both sides across the cluster. Spark's
bucketed tables move that cost to WRITE time, once: `bucketBy(n, key)`
hash-partitions rows into n buckets inside each table, records the
bucket spec in the catalog, and every later scan exposes
`HashPartitioning(key, n)` as its output partitioning — so a
sort-merge join of two tables bucketed on the same key with the same
bucket count runs with ZERO Exchange on either side, and a
`groupBy(key)` over one bucketed table aggregates without any shuffle
at all. With `sortBy(key)`, one file per bucket, AND
`spark.sql.legacy.bucketedTableScan.outputOrdering=true` the SMJ's
per-side Sort is elided too — the join becomes a pure streaming merge
of pre-sorted co-located files (Spark stopped reporting bucketed-scan
ordering by default in 3.0 because multiple files per bucket would
force a costly file-merge; this module's one-file-per-bucket writes
make the conf safe to enable). (Reference parallel: the SQLite schema's
PRIMARY KEY B-trees — solardb.py:33-66 — give it free key-ordered
access; bucketing is the distributed analog, declared once at layout
time instead of maintained per-insert.)

Rules this module enforces (each is a silent-performance-cliff
otherwise):

- **One file per bucket**: the writer emits one file per bucket PER
  TASK, so an unpartitioned write of a 1000-partition DataFrame
  produces 1000×n tiny files and — worse — multiple files per bucket,
  which voids the sorted-scan guarantee and reinstates the SMJ Sort.
  `write_bucketed` repartitions on the bucket key first (n_buckets
  partitions → exactly one file per non-empty bucket).
- **Same bucket count on both sides**: mismatched counts fall back to
  a shuffle on one side (Spark only prunes the Exchange when the
  partitioning matches the required distribution). `colocated_join`
  reads both specs from the catalog and raises on mismatch instead of
  silently shuffling.
- **Path-anchored tables**: `option("path", ...)` keeps the data in
  the caller's directory (HDFS/S3-resolvable), with the session
  catalog holding only the bucket-spec metadata; re-registering after
  a restart is `register_bucketed`.

Scale note: n_buckets is a LAYOUT constant, chosen once per table
(rule of thumb: total_size / target_bucket_size, with
target_bucket_size sized to an executor's comfortable scan unit,
128-512 MB). It bounds the join's parallelism, so at 100 TB prefer
thousands of buckets; AQE cannot re-split a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet bucketed table named ``table`` with
    data files under ``path``.

    Repartitions on the bucket column first so each bucket is exactly
    one file (see module docstring), and sorts within buckets on the
    same column by default so downstream sort-merge joins skip their
    Sort. ``mode='overwrite'`` replaces an existing same-name table
    (the memoized-builder idiom the catalog queries use)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(n_buckets, bucket_col)
        .write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.mode(mode).saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int]:
    """(bucket columns, bucket count) from the catalog's table
    metadata. Raises ValueError for a non-bucketed table — callers use
    this to refuse a 'co-located' join that would silently shuffle."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"table {table} is not bucketed")
    cols = [
        c.strip().strip("`")
        for c in info["Bucket Columns"].strip("[]").split(",")
    ]
    return cols, int(info["Num Buckets"])


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    right_on: str | list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys with the
    co-location PRECONDITIONS CHECKED: each side bucketed on its join
    key with equal bucket counts — the configuration under which
    Spark's sort-merge join needs no Exchange on either side (FK names
    may differ per side, the lineitem.l_orderkey = orders.o_orderkey
    shape; hash partitioning on each side's own key satisfies its half
    of the join's required distribution). A mismatch raises — the
    silent alternative is a plan that looks like a bucketed join and
    shuffles anyway. The join itself is the plain DataFrame join:
    Catalyst does the Exchange elision; this helper only refuses the
    configurations where it can't."""
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        lkeys
        if right_on is None
        else [right_on] if isinstance(right_on, str) else list(right_on)
    )
    lcols, ln = bucket_spec(spark, left_table)
    rcols, rn = bucket_spec(spark, right_table)
    if lcols != lkeys or rcols != rkeys:
        raise ValueError(
            f"co-located join needs each side bucketed on its join key: "
            f"{left_table} is bucketed on {lcols} (need {lkeys}), "
            f"{right_table} on {rcols} (need {rkeys})"
        )
    if ln != rn:
        raise ValueError(
            f"bucket counts differ ({left_table}: {ln}, {right_table}: "
            f"{rn}) — Spark would shuffle one side; rewrite one table"
        )
    left, right = spark.table(left_table), spark.table(right_table)
    if rkeys == lkeys:
        return left.join(right, lkeys, how)
    import functools

    cond = functools.reduce(
        lambda x, y: x & y,
        [left[a] == right[b] for a, b in zip(lkeys, rkeys)],
    )
    return left.join(right, cond, how)
