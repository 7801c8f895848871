"""Bucketed-table co-location (sources/bucketed.py): the plan-level
guarantees the layout pays for — zero Exchange on a same-spec join,
zero Exchange on a bucket-key aggregation, Sort elision under the
legacy outputOrdering conf with one file per bucket — plus the refusal
contracts (mismatched counts / keys raise instead of silently
shuffling) and result parity with the plain shuffled join."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.sources.bucketed import (
    bucket_spec,
    colocated_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bucketed"))
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("lv")
    )
    right = spark.range(0, 1000).select(
        (F.col("id") * 2).alias("rk"), (F.col("id") % 3).alias("rv")
    )
    write_bucketed(left, "t_bl_left", f"{d}/left", "k", 4)
    write_bucketed(right, "t_bl_right", f"{d}/right", "rk", 4)
    yield "t_bl_left", "t_bl_right", d
    for t in ("t_bl_left", "t_bl_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_spec_roundtrip(spark, tables):
    lt, rt, _ = tables
    assert bucket_spec(spark, lt) == (["k"], 4)
    assert bucket_spec(spark, rt) == (["rk"], 4)


def test_one_file_per_bucket(tables):
    """write_bucketed repartitions on the key first: exactly one data
    file per non-empty bucket, not one per (bucket, writer task) —
    the invariant Sort elision and probe-cost bounds rest on."""
    _, _, d = tables
    files = glob.glob(os.path.join(d, "left", "*.parquet"))
    assert len(files) == 4, sorted(os.path.basename(f) for f in files)


def test_colocated_join_no_exchange_and_matches_shuffled_join(spark, tables):
    lt, rt, _ = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, "k", "rk")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        got = sorted((r["k"], r["lv"], r["rv"]) for r in j.collect())
        want = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in spark.table(lt)
            .join(spark.table(rt), F.col("k") == F.col("rk"))
            .collect()
        )
        assert got == want and len(got) == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sort_elision_with_output_ordering_conf(spark, tables):
    """With one file per bucket + sortBy at write time, enabling
    spark.sql.legacy.bucketedTableScan.outputOrdering removes the SMJ's
    per-side Sort: the join is a pure streaming merge of pre-sorted
    co-located files."""
    lt, rt, _ = tables
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        plan = _plan(colocated_join(spark, lt, rt, "k", "rk"))
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_bucket_key_aggregation_no_exchange(spark, tables):
    """groupBy on the bucket column aggregates with ZERO shuffle: the
    bucketed scan's HashPartitioning already satisfies the agg's
    required distribution, so partial and final agg fuse over the scan."""
    lt, _, _ = tables
    agg = spark.table(lt).groupBy("k").agg(F.sum("lv").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_mismatched_bucket_count_refused(spark, tables, tmp_path):
    lt, _, _ = tables
    other = spark.range(0, 100).select(F.col("id").alias("rk"))
    write_bucketed(other, "t_bl_other", f"{tmp_path}/other", "rk", 8)
    try:
        with pytest.raises(ValueError, match="bucket counts differ"):
            colocated_join(spark, lt, "t_bl_other", "k", "rk")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bl_other")


def test_wrong_key_and_unbucketed_refused(spark, tables, tmp_path):
    lt, rt, _ = tables
    with pytest.raises(ValueError, match="bucketed on"):
        colocated_join(spark, lt, rt, "lv", "rk")
    plain = spark.range(5).select(F.col("id").alias("rk"))
    plain.write.mode("overwrite").option(
        "path", f"{tmp_path}/plain"
    ).saveAsTable("t_bl_plain")
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            colocated_join(spark, lt, "t_bl_plain", "k", "rk")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bl_plain")
