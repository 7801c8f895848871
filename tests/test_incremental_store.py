"""Incremental exact dedup against the partitioned fingerprint store
(dedup.write_fingerprint_store / incremental_new_docs): DuckDB oracle
for the admission semantics, measured partition pruning, append flow."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.dedup import (
    incremental_new_docs,
    write_fingerprint_store,
)
from solarpaneldatawrangler_spark.sources.star import load_table
from tests.oracle_harness import compare, run_oracle

_FP_SQL = "md5(regexp_replace(trim(lower({c})), '\\s+', ' ', 'g'))"


def test_admission_matches_duckdb(spark, sf_dir, tmp_path):
    store = str(tmp_path / "fpstore")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    write_fingerprint_store(corpus, store)
    got = incremental_new_docs(docs, store).select("doc_id")
    want = run_oracle(
        f"""
        SELECT b.doc_id
        FROM documents b
        WHERE {_FP_SQL.format(c='b.text')} NOT IN (
            SELECT {_FP_SQL.format(c='c.text')}
            FROM documents c WHERE c.doc_id % 2 = 0
        )
        """,
        sf_dir,
    )
    compare(got, want, "incremental_new_docs")
    # and nothing from an already-ingested batch is re-admitted
    assert incremental_new_docs(corpus, store).count() == 0


def test_store_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    store = str(tmp_path / "fpstore")
    write_fingerprint_store(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), store
    )
    n_partitions = len(glob.glob(os.path.join(store, "bucket=*")))
    assert n_partitions > 16, "store too coarse for a pruning test"
    # a 3-doc batch can hash into at most 3 buckets
    batch = spark.createDataFrame(
        [(1, "completely new a"), (2, "completely new b"), (3, "completely new c")],
        "doc_id long, text string",
    )
    out = incremental_new_docs(batch, store)
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the IN-filter must reach the scan as a partition filter, and the
    # anti-join must not degrade to a nested loop
    assert "bucket" in plan
    assert "CartesianProduct" not in plan
    # file-level proof: the probed partition dirs are a strict subset
    probed = {
        r[0]
        for r in batch.select(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.regexp_replace(
                                F.trim(F.lower("text")), r"\s+", " "
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(64),
            )
        ).collect()
    }
    assert len(probed) <= 3 < n_partitions


def test_append_mode_accumulates(spark, tmp_path):
    store = str(tmp_path / "fpstore")
    b1 = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, "beta"), (4, "gamma")], "doc_id long, text string")
    write_fingerprint_store(b1, store)
    admitted = incremental_new_docs(b2, store)
    assert sorted(r.doc_id for r in admitted.collect()) == [4]  # beta known
    # ingest the admitted rows, then nothing in b2 is new anymore
    write_fingerprint_store(admitted, store, mode="append")
    assert incremental_new_docs(b2, store).count() == 0
