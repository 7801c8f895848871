"""mixture_order: stride-scheduling guarantees, the map-only rank_col
path, and plan shape."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from solarpaneldatawrangler_spark.operators.mixing import (
    mixture_case_sql,
    mixture_order,
)


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (i, ["a", "b", "c"][i % 3]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_order(df, {"a": 4, "b": 2}, default_weight=1)
    return (
        out.orderBy("mix_key", "source", "doc_id")
        .select("source", "src_rank", "weight", "mix_key")
        .collect()
    )


def test_prefix_share_stays_within_o1(mixed):
    """Stride scheduling's defining property: in EVERY prefix of the
    key-sorted stream, each source's count is within ~1 of its target
    share — the property an RNG-shuffled mix only has in expectation."""
    total_w = {"a": 4, "b": 2, "c": 1}
    W = sum(total_w.values())
    supply = 100  # docs per source in the fixture
    # the share bound holds while every source still has docs; the
    # highest-weight source drains first, at n = supply * W / w_max
    horizon = int(supply * W / max(total_w.values()))
    seen = {s: 0 for s in total_w}
    for n, row in enumerate(mixed, start=1):
        seen[row.source] += 1
        if n > horizon:
            continue
        for s, w in total_w.items():
            assert abs(seen[s] - n * w / W) <= 1.0 + 1e-9, (
                f"prefix {n}: {s} has {seen[s]}, target {n * w / W:.2f}"
            )
    assert seen == {s: supply for s in total_w}


def test_within_source_order_is_id_order(mixed):
    """Each source's docs appear in ascending src_rank (id order) —
    the schedule interleaves, it never reorders within a source."""
    last = {}
    for row in mixed:
        assert row.src_rank == last.get(row.source, -1) + 1
        last[row.source] = row.src_rank


def test_rank_col_path_matches_window_path(spark):
    """A precomputed per-source ordinal (the map-only 100 TB path)
    produces byte-identical output to the window path."""
    rows = [(i, "ab"[i % 2]) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    via_window = mixture_order(df, {"a": 3}).collect()
    pre = df.withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
        - 1,
    )
    via_rank = (
        mixture_order(pre, {"a": 3}, rank_col="pos").collect()
    )
    assert sorted(map(tuple, via_window)) == sorted(map(tuple, via_rank))


def test_rank_col_path_is_map_only(spark, sf_dir):
    from solarpaneldatawrangler_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "pos", F.col("doc_id")
    )
    out = mixture_order(docs, {"src0": 4}, rank_col="pos")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_weights_validated():
    # mixture_order validates before touching the DataFrame, so a None
    # df is fine for the error path
    with pytest.raises(ValueError, match="positive ints"):
        mixture_order(None, {"a": 0})
    with pytest.raises(ValueError, match="positive ints"):
        mixture_order(None, {"a": "2"})  # mixed types must not TypeError


def test_case_sql_matches_python_lcm():
    w_case, s_case, lcm = mixture_case_sql({"a": 4, "b": 6}, 1)
    assert lcm == math.lcm(4, 6, 1) == 12
    assert "WHEN 'a' THEN 3" in s_case and "WHEN 'b' THEN 2" in s_case
    assert s_case.endswith("ELSE 12 END")
    assert "WHEN 'a' THEN 4" in w_case and w_case.endswith("ELSE 1 END")


def test_prefix_bound_property_arbitrary_weights():
    """The O(1) prefix-share bound is a property of the key formula
    itself, for ANY weights — pinned by hypothesis over the same exact
    integer keys mixture_order emits ((2i+1) * lcm/w), simulated
    driver-side with ample supply so no source exhausts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=9), min_size=2,
                 max_size=5)
    )
    def check(ws):
        L = math.lcm(*ws)
        W = sum(ws)
        supply = 20 * max(ws)
        horizon = int(supply * W / max(ws))
        stream = sorted(
            ((2 * i + 1) * (L // w), s, i)
            for s, w in enumerate(ws)
            for i in range(supply)
        )
        seen = [0] * len(ws)
        for n, (_k, s, _i) in enumerate(stream[:horizon], start=1):
            seen[s] += 1
            for j, w in enumerate(ws):
                # <= 1 when keys are distinct; key TIES (strides whose
                # multiples collide, e.g. [1,1,1,5]) cluster up to
                # len(ws) emissions at one virtual time and the
                # within-tie source order adds <1 more deviation
                assert abs(seen[j] - n * w / W) <= 2.0 + 1e-9, (ws, n, j)

    check()


def test_mixture_case_sql_escapes_quoted_source_names():
    """A source name containing a single quote (o'reilly) must emit a
    doubled-quote SQL literal — an unescaped arm is malformed SQL or,
    worse, a semantically different CASE than the Spark chain."""
    import duckdb

    from solarpaneldatawrangler_spark.operators.mixing import (
        mixture_case_sql,
    )

    w_case, s_case, lcm = mixture_case_sql({"o'reilly": 4, "plain": 2})
    assert "'o''reilly'" in w_case and "'o''reilly'" in s_case
    rows = duckdb.connect().execute(
        f"SELECT {w_case} AS w, {s_case} AS s FROM (VALUES ('o''reilly'), "
        "('plain'), ('other')) t(source) ORDER BY source"
    ).fetchall()
    assert rows == [(4, lcm // 4), (1, lcm), (2, lcm // 2)]
