"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stream semantics the built-in windowed aggregates
can't express (SURVEY §2.8 "custom stateful operators"): state lives in
Spark's state store per group, the Python kernel sees Arrow batches per
key per micro-batch. Used here for a running per-user profile (count,
value sum, last-seen) that persists across micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("last", StringType()),
    ]
)


def _update_profile(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, last = state.get if state.exists else (0, 0.0, "")
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        mx = str(pdf["ts"].max())
        last = max(last, mx)
    state.update((n, s, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [s], "last_ts": [last]}
    )


def running_user_profile(stream_df: DataFrame) -> DataFrame:
    """Per-user running profile maintained in the state store.

    Input: streaming events (user_id, ts, value, ...). Output mode must be
    'update'. State is per user_id; at scale the group shuffle is the only
    exchange and state store size is O(distinct users).
    """
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
