"""Bounded persist registry (r16 ADVICE: dedup._banded_keys persisted
its shingle relation but nothing ever unpersisted it — CacheManager
holds strong plan-keyed refs, so incremental dedup over changing
batches accumulated MEMORY_AND_DISK entries unboundedly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.cachereg import (
    register_persisted,
    registered_count,
)


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_changing_inputs_stay_bounded(spark):
    """10 distinct persisted plans through a max_entries=3 scope: only
    the 3 newest stay registered AND cached; evictees' storage is
    actually freed (the original leak)."""
    scope = "test-bounded"
    kept = []
    for i in range(10):
        df = (
            spark.range(50 + i)
            .select((F.col("id") * (i + 1)).alias("v"))
            .persist()
        )
        df.count()  # materialize so the cache entry really exists
        kept.append(register_persisted(df, scope, max_entries=3))
    assert registered_count(scope) == 3
    # the three survivors are still cached; earlier ones are not
    assert [bool(d.storageLevel.useMemory) for d in kept[-3:]] == [True] * 3
    assert [bool(d.storageLevel.useMemory) for d in kept[:7]] == [False] * 7


def test_identical_rebuilds_share_one_slot_and_stay_cached(spark):
    """The bench's repeat loops rebuild the SAME plan: semanticHash
    dedup must refresh the slot, not consume one per rebuild — naive
    handle-age eviction would unpersist the one shared CacheManager
    entry the hot loop is reusing."""
    scope = "test-identical"

    def build():
        return (
            spark.range(100).select((F.col("id") % 7).alias("k")).persist()
        )

    first = build()
    first.count()
    for _ in range(6):
        register_persisted(build(), scope, max_entries=3)
    assert registered_count(scope) == 1
    # the shared entry survived all six registrations
    assert first.storageLevel.useMemory


def test_dedup_banded_keys_registers_its_shingle_relation(spark):
    """Wire-through: repeated _banded_keys builds over CHANGING inputs
    must not grow the registry past its cap."""
    from solarpaneldatawrangler_spark.operators.cachereg import _MAX_PER_SCOPE
    from solarpaneldatawrangler_spark.operators.dedup import _banded_keys

    for i in range(_MAX_PER_SCOPE + 3):
        df = spark.createDataFrame(
            [(j, f"alpha beta gamma delta {i} {j}") for j in range(5)],
            "doc_id long, text string",
        )
        banded, sh, sig = _banded_keys(
            df, "text", "doc_id", 16, 4, 3, reproducible=True
        )
        banded.count()
    assert registered_count("dedup-shingles") <= _MAX_PER_SCOPE
