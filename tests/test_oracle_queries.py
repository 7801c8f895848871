"""Every catalog query with an oracle must match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from solarpaneldatawrangler_spark.plans import CATALOG
from tests.oracle_harness import compare, run_oracle

ORACLE_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = CATALOG[name]
    got = spec.fn(spark, sf_dir)
    want = run_oracle(spec.oracle, sf_dir)
    compare(got, want, name, strict=True)  # mirror == driver exactness


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = CATALOG[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names


def test_compare_fails_on_int_vs_float_dtype_divergence(spark):
    """Mirror-fidelity regression (r10's q24 red): DuckDB HUGEINT
    reaches pandas as float64, so the driver hashed oracle 2279.0
    against Spark's long 2279 while the mirror's isclose path stayed
    green. compare() must now FAIL on any integral-vs-float dtype-kind
    divergence, making that class locally reproducible."""
    import pandas as pd

    got = spark.createDataFrame([(1, 10), (2, 20)], "k int, v long")
    # what fetchdf renders for a HUGEINT column: float64, values equal
    want_float = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    with pytest.raises(AssertionError, match="dtype-kind divergence"):
        compare(got, want_float, "hugeint_regression")
    # kind-matched sides still pass
    want_int = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    compare(got, want_int, "hugeint_regression_ok")


def test_no_oracle_column_types_as_hugeint(sf_dir):
    """Static sweep of every catalog oracle (the ADVICE alternative to
    the dtype-kind guard): DESCRIBE each oracle's result in DuckDB and
    fail on any HUGEINT (INT128) column. HUGEINT is what un-cast
    SUM(BIGINT) produces, it reaches pandas as float64, and the driver
    then hashes x.0 against Spark's long x — the r10 q24 red. The
    dtype-kind guard catches the divergence at compare time; this
    catches the un-cast aggregate at the SQL level even where the
    paired Spark column happens to be float too."""
    import duckdb

    from tests.oracle_harness import STAR_TABLES

    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = []
    for name in ORACLE_QUERIES:
        desc = con.execute(f"DESCRIBE {CATALOG[name].oracle}").fetchall()
        for col, typ, *_ in desc:
            if "HUGEINT" in typ.upper():
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns typed HUGEINT (cast the aggregate, e.g. "
        f"CAST(SUM(x) AS BIGINT)): {offenders}"
    )
