"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md training-data streaming surface).

The reference is strictly batch; its incrementality is stage-wise. This is
the streaming-native form of the batch sessionizer (`rel_events_sessionize`):
per-user GroupState carries (last event time, session count, event count)
across micro-batches, so a session spanning a batch boundary is NOT double
counted — the semantics match the batch window/lag formulation exactly when
events arrive in timestamp order per user (the test feeds time-ordered file
chunks; out-of-order arrival would need a watermark + buffer, which the
gap-closing variant below does not attempt).

SCALE: state is per user_id (a few longs), partitioned by the shuffle on
user_id; each micro-batch touches only the users present in it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("last_tsec", LongType(), True),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming (user_id, tsec, event_id) → running (user_id, n_sessions,
    n_events), one update row per user per micro-batch.

    A new session starts when the gap to the user's previous event exceeds
    ``gap_seconds`` — identical to the batch lag-window formulation. Rows
    within a micro-batch are sorted by (tsec, event_id) inside the group
    (micro-batch shuffles do not preserve order).
    """

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_tsec, n_sessions, n_events = state.get
        else:
            last_tsec, n_sessions, n_events = None, 0, 0
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["tsec", "event_id"])
        for tsec in rows["tsec"]:
            tsec = int(tsec)
            if last_tsec is None or tsec - last_tsec > gap_seconds:
                n_sessions += 1
            last_tsec = tsec
            n_events += 1
        state.update((last_tsec, int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_sessions": [int(n_sessions)],
                "n_events": [int(n_events)],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
