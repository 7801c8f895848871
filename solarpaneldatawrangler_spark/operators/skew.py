"""Skew-handling join utilities (SURVEY.md §4 scale risks).

The reference-domain skew case: one huge city means one `polygon_name`
key carries 10-100x the tiles of the others, so a plain hash join stalls
on one straggler task. Two mitigations, both deterministic:

1. AQE skew-join splitting (on by default in session.py) — handles it at
   runtime when statistics reveal the skew.
2. Explicit salting (this module) — for when the skewed side must join a
   NON-broadcastable dimension, or AQE's thresholds don't trigger:
   the fact side gets a deterministic salt in [0, n); the dimension side
   is exploded n ways; the join key becomes (key, salt). One extra
   narrow map on the big side, n-fold duplication of the small side —
   no stragglers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew on the fact side.

    The salt is derived from a hash of the fact row's full tuple (stable,
    no rand()), so results are deterministic and the hot key spreads over
    ``salt_buckets`` tasks.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    salted_fact = fact.withColumn("_salt", salt)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(salted_dim, keys + ["_salt"], how)
    return out.drop("_salt")


def bucketed_table_write(
    df: DataFrame, name: str, key: str, buckets: int = 32, sort_col: str | None = None
) -> None:
    """Bucketed, optionally sorted, managed-table write: later equi-joins
    and aggregations on ``key`` between tables bucketed the same way
    skip their shuffle entirely (SURVEY §1.4: replaces the reference's
    centroid_index with a storage layout)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)
