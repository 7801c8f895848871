"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (O1 priority scan) on sf0.001.
queries()      — every implemented operator from SURVEY.md §2, keyed by
                 catalog name (solarpaneldatawrangler_spark.plans).
oracle_sql()   — matching DuckDB SQL per query (None-oracle queries
                 would be omitted and get a rows-only driver check;
                 as of r12 every catalog entry carries an oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path; make the package importable
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solarpaneldatawrangler_spark.plans import CATALOG  # noqa: E402
from solarpaneldatawrangler_spark.sources.star import ensure_session_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: O1 top-k priority scan (SURVEY.md §7 step 1) at sf0.001."""
    ensure_session_confs(spark)
    return CATALOG["q01_priority_scan"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in sorted(CATALOG.items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(CATALOG.items())
        if spec.oracle is not None
    }
