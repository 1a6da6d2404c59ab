"""Custom stateful streaming operator via ``applyInPandasWithState``.

Native windows cover tumbling/session aggregation; this operator covers
what they can't: an arbitrary per-key running state machine that survives
across micro-batches. Example implemented here: per-user running stats
with gap-based session counting — state is (event count, value sum, last
event epoch, session count), updated per batch, emitting one row per key
per batch.

State is bounded per key (4 scalars), so the state store scales linearly
with distinct keys regardless of event volume.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_epoch", T.DoubleType()),
        T.StructField("n_sessions", T.LongType()),
    ]
)

SESSION_GAP_SECONDS = 30 * 60


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_events, total_value, last_epoch, n_sessions = state.get
    else:
        n_events, total_value, last_epoch, n_sessions = 0, 0.0, None, 0

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("ts")
    if len(rows):
        import numpy as np

        epochs = np.array([t.timestamp() for t in rows["ts"]], dtype=np.float64)
        prev = np.concatenate(
            ([last_epoch if last_epoch is not None else -np.inf], epochs[:-1])
        )
        # one vectorized gap scan instead of a per-row Python loop
        n_sessions += int((epochs - prev > SESSION_GAP_SECONDS).sum())
        n_events += len(rows)
        total_value += float(rows["value"].astype(float).sum())
        last_epoch = float(epochs[-1])

    state.update((n_events, total_value, last_epoch, n_sessions))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "total_value": [round(total_value, 6)],
            "n_sessions": [n_sessions],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user stats machine to a streaming frame.

    ``events`` needs (user_id long, ts timestamp, value double). Output
    mode must be ``update``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
