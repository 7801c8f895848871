"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, sort columns by name,
compare row multisets (exact for non-floats, tiny-tolerance for floats
so genuinely nondeterministic queries are caught while IEEE-identical
math passes)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from solarpaneldatawrangler_spark.sources.star import STAR_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # decimals, bytes -> canonical types
            df[c] = df[c].map(
                lambda v: float(v)
                if type(v).__name__ == "Decimal"
                else (v.hex() if isinstance(v, (bytes, bytearray)) else v)
            )
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def compare(
    spark_df,
    oracle_df: pd.DataFrame,
    name: str,
    rtol: float = 1e-9,
    strict: bool = False,
) -> None:
    """``strict=True`` replicates the DRIVER's exactness: float cells
    must be bit-identical (repr-equal) across engines, no isclose — an
    r11 full-catalog sweep proved every hashed query IS cell-exact at
    sf0.01, so the catalog mirror runs strict and a future query that
    silently leans on tolerance fails locally before the driver sees
    it. Non-catalog goldens keep the tolerant default.

    ``spark_df`` may be a pre-collected pandas DataFrame (r13: the sf1
    sweep times the Spark collect separately from the oracle replay, so
    it collects first and hands the pandas frame here)."""
    got = _normalize(
        spark_df if isinstance(spark_df, pd.DataFrame) else spark_df.toPandas()
    )
    want = _normalize(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # Driver-fidelity guard: the driver hashes values as rendered, so an
        # integral column on one side vs float on the other (e.g. DuckDB
        # HUGEINT -> fetchdf float64, the q24/r10 regression) hashes
        # 2279 vs 2279.0 and goes red even when isclose passes. Fail the
        # mirror on any int-vs-float dtype-kind divergence.
        gk, wk = g.dtype.kind, w.dtype.kind
        if ("f" in (gk, wk)) and (gk in "iu" or wk in "iu"):
            raise AssertionError(
                f"{name}: col {c} dtype-kind divergence spark={g.dtype} "
                f"oracle={w.dtype} — integral vs float hashes differ on the "
                f"driver (HUGEINT/float64 class); cast the oracle SQL "
                f"(e.g. CAST(... AS BIGINT)) or the Spark column so kinds agree"
            )
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            for i, (a, b) in enumerate(zip(g, w)):
                if pd.isna(a) and pd.isna(b):
                    continue
                if strict:
                    assert repr(a) == repr(b), (
                        f"{name}: col {c} row {i}: {a!r} != {b!r} — "
                        "engines diverge in float BITS; the driver's "
                        "exact value hash would go red. Make the query "
                        "engine-exact (round/cast in BOTH engines)"
                    )
                    continue
                assert a is not None and b is not None and math.isclose(
                    float(a), float(b), rel_tol=rtol, abs_tol=1e-12
                ), f"{name}: col {c} row {i}: {a} != {b}"
        else:
            ga, wa = g.astype(str).tolist(), w.astype(str).tolist()
            assert ga == wa, (
                f"{name}: col {c} differs; first diff at "
                f"{next(i for i in range(len(ga)) if ga[i] != wa[i])}: "
                f"{[x for x in zip(ga, wa) if x[0] != x[1]][:3]}"
            )
