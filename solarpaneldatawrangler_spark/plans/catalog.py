"""Named query catalog: the driver-facing registry behind
__spark_entry__.queries() / oracle_sql().

Each entry pairs a Spark DataFrame builder (spark, sf_dir) -> DataFrame
with an equivalent ANSI-SQL oracle string DuckDB can run over the same
parquet tables. Column names/aliases MUST match between the two — the
driver sorts columns by name before value-hashing.

Determinism rules every query here follows:
- any LIMIT has a total order with a unique tiebreaker;
- double aggregations go through exact decimal sums (operators.relational
  .exact_sum) so partition merge order can't change the value;
- per-row double math uses only IEEE-deterministic ops (+,-,*,/ sqrt)
  or is rounded before output where transcendentals are involved.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver runs a weaker rows-only check
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}

# The driver runs the oracle correctness gate at THIS scale factor.
# Oracle strings are built at import time, so any oracle that embeds
# data-dependent literals (q67's trained centroids) must train on this
# dir — and is only meaningful when the gate runs against it.
# Env-overridable (r12) so scripts/sf1_sweep.py can rebuild every
# data-dependent oracle against a scaled dir and run the strict mirror
# there; the driver never sets it, so gate behavior is unchanged.
import os as _os

ORACLE_SF_DIR = _os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)
if "SPARK_GRAFT_ORACLE_SF_DIR" in _os.environ:
    # loud one-liner (r12 ADVICE): a leaked override silently retrains
    # every data-dependent VALUES oracle against a different dir and
    # turns the gate red with no indication of why — make a red gate
    # immediately attributable to the non-default oracle dir
    import sys as _sys

    print(
        "NOTICE: SPARK_GRAFT_ORACLE_SF_DIR override active — "
        f"data-dependent oracles train on {ORACLE_SF_DIR!r}, not the "
        "default /root/testdata/sf0.01; a red correctness gate run "
        "against a different sf dir is expected, not a regression",
        file=_sys.stderr,
    )


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco
