"""Deterministic stratified sampling for training-data pipelines.

Corpus curation downsamples by stratum (source, language, quality
band) with per-stratum rates — e.g. keep 10% of commoncrawl but 100%
of wikipedia. Spark's ``sampleBy`` draws from an RNG seeded per
partition, so membership changes under repartitioning and can't be
reproduced by another engine. Here membership is a pure function of
the row: hash the id, take a bucket in [0, 1), keep if bucket < rate.

- reruns, retries, and different cluster layouts select the SAME rows
  (sampling decisions are join-stable: other tables can be filtered to
  the same sample by id)
- the md5 path replays in any engine
  (DuckDB: ('0x'||substr(md5(id),1,8))::BIGINT / 2^32 < rate), so
  sampled pipelines stay oracle-checkable end-to-end
- the xxhash64 path is the faster JVM-only variant for production
- expression-only (no shuffle, no RNG state): the filter runs inside
  the scan stage and pushes into partition pruning where the stratum
  column is a partition key
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.functions.text import md5_long

_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, reproducible: bool = True) -> Column:
    """Uniform double in [0, 1) derived from the row id — md5-based when
    ``reproducible`` (cross-engine), xxhash64 otherwise (fast path)."""
    if reproducible:
        h = md5_long(id_col.cast("string"))
    else:
        h = F.pmod(F.xxhash64(id_col.cast("string")), F.lit(_BUCKETS))
    return h.cast("double") / F.lit(float(_BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    reproducible: bool = True,
) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate(stratum). Rows whose
    stratum is missing from ``rates`` get ``default_rate`` (0 = drop).

    Deterministic: membership depends only on (id, stratum rate), never
    on partitioning, task retries, or execution order.
    """
    bucket = hash_bucket(F.col(id_col), reproducible)
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(bucket < rate)
