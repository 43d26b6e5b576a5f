"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.I / north-star custom stateful ops).

``running_user_totals`` maintains per-key running aggregates across
micro-batches — the building block for custom counters, anomaly
flags, or enrichment state that Spark's built-in windowed aggregates
can't express.  State is a single fixed-width tuple per key, so the
store stays bounded by key cardinality at 100 TB; Arrow carries each
group's rows to Python in batches (never row-at-a-time).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_total bigint, v_total double"
STATE_SCHEMA = "n bigint, v double"


def _update(key, batches, state: GroupState):
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, round(v, 6)))
    yield pd.DataFrame({"user_id": [key[0]], "n_total": [n], "v_total": [round(v, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) emitted every micro-batch the
    user appears in; state persists across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
