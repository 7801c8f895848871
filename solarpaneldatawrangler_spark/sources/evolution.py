"""Schema evolution (SURVEY.md §1.4): the Spark-native replacement for
the reference's alembic migration chain
(/root/reference/alembic/versions/*— add-column migrations over the
slippy_tiles table).

Parquet data lakes don't ALTER TABLE; generations of files simply carry
different schemas. Two composable patterns cover every reference
migration (all of which are additive column changes):

- read_evolving: one scan over many generations with mergeSchema —
  Spark unions the parquet footers' schemas; columns missing in old
  files read as NULL. Schema merging is footer-only work, so a 100 TB
  lake pays nothing extra at scan time beyond the usual footer reads.
- union_generations: unionByName(allowMissingColumns=True) over
  already-loaded DataFrames — the same semantics when generations live
  in separate tables/sources rather than one directory tree.

Defaults backfill NULLs with typed defaults where the reference
migration declared one (e.g. inference_timestamp default-0,
alembic/versions/*_add_inference_timestamp*.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read N parquet generations as ONE DataFrame whose schema is the
    union of all generation schemas (old rows get NULL for columns they
    predate)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def union_generations(*generations: DataFrame) -> DataFrame:
    """Union DataFrames with evolving schemas by column NAME, padding
    missing columns with NULL — order-independent, no positional
    surprises."""
    if not generations:
        raise ValueError("no generations given")
    out = generations[0]
    for g in generations[1:]:
        out = out.unionByName(g, allowMissingColumns=True)
    return out


def with_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """Backfill evolution NULLs with the migration's declared default
    (column is created when absent entirely)."""
    for name, value in defaults.items():
        if name in df.columns:
            df = df.withColumn(name, F.coalesce(F.col(name), F.lit(value)))
        else:
            df = df.withColumn(name, F.lit(value))
    return df
