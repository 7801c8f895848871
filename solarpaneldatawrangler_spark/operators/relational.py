"""Core relational operator idioms (SURVEY.md §2.2-2.7).

The reference expresses these as SQLAlchemy query builders over SQLite
(/root/reference/solardb.py); here each is a composable
DataFrame -> DataFrame transform. Catalyst provides predicate pushdown,
column pruning, and TakeOrderedAndProject top-k automatically — the
hand-rolled optimizations inventoried in SURVEY.md §4 disappear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def priority_scan(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    n: int,
    predicate: Column | None = None,
) -> DataFrame:
    """Top-k priority feed (SURVEY.md O1; reference
    /root/reference/solardb.py:215-221 served by a secondary index).

    orderBy().limit() plans as TakeOrderedAndProject — a true
    distributed top-k: each partition keeps its local k, the driver
    merges k*num_partitions rows, no global sort. At 100 TB this is a
    single narrow pass. Callers should include a unique tiebreaker in
    ``order_cols`` so the k-boundary is deterministic.
    """
    if predicate is not None:
        df = df.filter(predicate)
    return df.orderBy(*order_cols).limit(n)


def dedup_by_key(
    df: DataFrame, key: Sequence[str], order_col: str | Column | None = None
) -> DataFrame:
    """Insert-time PK dedup (SURVEY.md U3; reference ON CONFLICT IGNORE,
    /root/reference/solardb.py:50-51).

    With ``order_col``: deterministic winner (min by order) via a
    map-side-combinable min_by aggregation — NOT dropDuplicates, whose
    survivor depends on partition scan order.
    """
    if order_col is None:
        return df.dropDuplicates(list(key))
    order_col = F.col(order_col) if isinstance(order_col, str) else order_col
    payload = [c for c in df.columns if c not in key]
    agg = df.groupBy(*key).agg(
        *[F.min_by(c, order_col).alias(c) for c in payload]
    )
    return agg.select(*df.columns)


def upsert_by_key(
    existing: DataFrame, incoming: DataFrame, key: Sequence[str]
) -> DataFrame:
    """ON-CONFLICT-IGNORE upsert: keep every existing row, append only
    incoming rows whose key is unseen (reference persist_coords,
    /root/reference/solardb.py:83-97). left_anti + unionByName; at scale
    this is the MERGE-less idempotent-append pattern — the incoming side
    is typically small, so Catalyst broadcasts the probe.
    """
    key = list(key)
    fresh = dedup_by_key(incoming, key).join(
        existing.select(*key), on=key, how="left_anti"
    )
    return existing.unionByName(fresh.select(*existing.columns))


def incremental_remainder(
    universe: DataFrame, done: DataFrame, key: Sequence[str]
) -> DataFrame:
    """Restartable incremental processing (SURVEY.md §2.2 P10/§4): rows
    not yet processed = universe anti-join done-set on key. Replaces the
    reference's persisted boolean flags (inner_coords_calculated,
    inference_ran) with a stateless anti-join — idempotent under retry.
    """
    return universe.join(done.select(*key), on=list(key), how="left_anti")


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number window (SURVEY.md W1/W2).

    One shuffle on the group key; with AQE skew handling a hot group
    splits at runtime. Callers include a unique tiebreaker for
    determinism.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the value columns of
    the LATEST right row with right.ts <= left.ts within the same ``by``
    group (inclusive at equal timestamps).

    Spark has no native as-of join; the scalable plan is the union-tag
    trick: tag sides, union, ONE window per by-group ordered by
    (ts, side) with last(..., ignorenulls) carrying right values forward.
    Cost: a single shuffle on ``by`` — no range join, no per-row probe;
    this beats bucketize-and-filter whenever both sides share the
    partition key (cf. the merge_asof pattern in pyspark_guide).
    """
    by = list(by)
    lcols = left.columns
    l_tagged = left
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tagged = l_tagged.withColumn("_side", F.lit(1))
    r_tagged = right.select(
        *by,
        F.col(ts_col),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    # right rows (side 0) sort before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col("_side"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def exact_sum(col: str | Column, scale: int = 2) -> Column:
    """Order-insensitive exact monetary sum: cast to decimal(18,scale)
    before summing so the result is identical regardless of partition
    merge order (double sums differ in the last ulps between runs and
    engines), then back to double for a stable output schema.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(col: str | Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(22,{scale})")).cast("double") / F.count(c)


def range_join_binned(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Interval (range) join: every pair where
    ``lo <= left.ts < hi`` — WITHOUT an equi-key, the case Spark plans
    as BroadcastNestedLoopJoin (O(n*m) probes) or, unbroadcastable, a
    cartesian.

    The scale plan is bin bucketing (the published range-join
    optimization used by Sedona-style spatial joins, here on the time
    axis): discretize into ``bin_seconds`` buckets, explode each
    interval to the buckets it spans, tag each left row with its ONE
    bucket, shuffle equi-join on the bucket, post-filter the exact
    predicate. Each qualifying pair meets in exactly one bucket (the
    left row's), so no dedup pass is needed. O(n + m * span/bin)
    shuffled rows instead of n*m probes; at 100 TB the join is an
    ordinary hash/sort-merge exchange.

    Pick ``bin_seconds`` near the median interval length: too small
    explodes intervals wide, too large piles unrelated rows into one
    bucket (a hot bin skews the shuffle — AQE skew-join splits it).
    Intervals are half-open; empty/inverted (hi <= lo) intervals drop.
    Column names must be disjoint between the two inputs (alias first).
    """
    w_us = int(bin_seconds) * 1_000_000
    if w_us <= 0:
        raise ValueError("bin_seconds must be positive")

    def _bin(c: Column) -> Column:
        # exact integer floor-div on epoch micros: x - x % w is a
        # multiple of w, and both operands are < 2^53 so the double
        # divide is exact
        x = F.unix_micros(c)
        return ((x - x % F.lit(w_us)) / F.lit(w_us)).cast("long")

    lo, hi, ts = F.col(lo_col), F.col(hi_col), F.col(ts_col)
    binned_intervals = intervals.filter(hi > lo).withColumn(
        "_rj_bin",
        # half-open upper bound: the last bucket an interval can meet
        # a row in is the one containing hi - 1 microsecond
        F.explode(
            F.sequence(_bin(lo), _bin(F.timestamp_micros(F.unix_micros(hi) - 1)))
        ),
    )
    binned_left = left.withColumn("_rj_bin", _bin(ts))
    return (
        binned_intervals.join(binned_left, "_rj_bin")
        .where((ts >= lo) & (ts < hi))
        .drop("_rj_bin")
    )
