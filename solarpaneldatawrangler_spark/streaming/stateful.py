"""Custom stateful streaming operator (SURVEY.md §2.10):
applyInPandasWithState — the Spark-native form of the reference's
mutable per-tile progress flags (has_image / inference_ran /
panel_softmax written back row-at-a-time, /root/reference/solardb.py:224-228).

The operator below maintains a per-key running aggregate (count, sum,
max) across micro-batches: the streaming twin of the reference's
"running average tiles/s" metric and of any incremental per-polygon
progress tracking. State lives in the state store (checkpointed,
exactly-once); no external mutable table needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count long, total double, max_value double"
OUTPUT_SCHEMA = "key string, count long, total double, max_value double"


def running_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running (count, sum, max) over a stream of value batches."""
    if state.exists:
        count, total, max_value = state.get
    else:
        count, total, max_value = 0, 0.0, float("-inf")
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_value = max(max_value, float(pdf["value"].max()))
    state.update((count, total, max_value))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "count": [count],
            "total": [total],
            "max_value": [max_value],
        }
    )


def streaming_running_stats(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Attach the stateful operator to a (possibly streaming) DataFrame
    with columns (key_col, value). Output mode must be 'update'."""
    return (
        events.selectExpr(f"{key_col} as key", "value")
        .groupBy("key")
        .applyInPandasWithState(
            running_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
