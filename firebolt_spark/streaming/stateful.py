"""Custom stateful streaming operators — applyInPandasWithState.

The reference keeps no cross-event state (SURVEY §1.1: "no shared state
between events other than what a node keeps privately"); node-private
state (e.g. the ES sink's doc counter) dies with the process. Here,
genuinely stateful per-key streaming operators are first-class via
``applyInPandasWithState``: checkpointed state, watermark-driven
timeouts, Arrow-batched updates.

``running_counter`` is the canonical shape: per-key event counts +
last-seen timestamp, emitting an update row per key per batch, state
expiring after ``ttl`` of processing-time inactivity. ``sessionize``
is the worked example of growing the update body: event-time gap
sessions with closed-session emission and open-session snapshots.
The same skeleton builds rate trackers, dedup-within-horizon, CDC
reconcilers, etc.

Scale: state lives in the state store partitioned by key — the same
hash shuffle as any groupBy; per-key state here is O(1) bytes, so keys,
not events, bound memory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


SESSION_OUTPUT_SCHEMA = (
    "key STRING, session_start BIGINT, session_end BIGINT, "
    "n_events BIGINT, closed BOOLEAN"
)
SESSION_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT"


def fold_session(
    ts: list[int],
    start: int,
    last: int | None,
    n: int,
    gap_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int]]:
    """Pure session fold (unit-testable core of ``sessionize``): fold
    sorted timestamps into the open (start, last, n) state. Returns
    (closed_sessions, open_state).

    Late-data policy: an out-of-order event anywhere inside the open
    session's reach — ``t >= start - gap_us`` — is counted into it
    WITHOUT moving ``session_start``/``session_end``; only events
    older than ``start - gap_us`` (a horizon no extension of the open
    session can reach: any session containing them closed before this
    one began) are dropped.
    """
    closed: list[tuple[int, int, int]] = []
    for t in ts:
        if last is None:
            last = t
        elif t < start - gap_us:
            # genuinely too late: beyond the open session's reach — drop
            # instead of silently rewinding the open session
            continue
        elif t - last > gap_us:
            closed.append((start, last, n))
            start, n = t, 0
            last = t
        else:
            # in-session or in-gap late event: count, never rewind
            last = max(last, t)
        n += 1
    return closed, (start, last, n)


def sessionize(
    sdf: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_seconds: int = 30,
    idle_timeout_ms: int = 60_000,
    emit_policy: str = "snapshot",
) -> DataFrame:
    """Per-key event-time sessionization with cross-batch state.

    A session is a maximal run of a key's events with no inter-event
    gap above ``gap_seconds`` (event time, microseconds). Sessions that
    close — because a later event arrives past the gap, or the key goes
    idle for ``idle_timeout_ms`` of processing time — are emitted with
    ``closed=true``; each batch also emits the current open session as
    a ``closed=false`` snapshot (update-mode consumers overwrite it).

    Complements the native ``session_window`` aggregation
    (``streaming/eventtime.py``): use this form when the per-session
    logic outgrows an aggregation (custom emit policy, session-scoped
    counters, early snapshots). State is one (start, last, n) triple
    per key in the state store — keys, not events, bound memory; the
    shuffle is the same hash-by-key as any groupBy.

    Late-data policy (there is no watermark on this path): an event
    arriving out of order anywhere inside the open session's reach
    (``t >= session_start - gap``) is counted into it WITHOUT moving
    the session boundaries; an event older than that is dropped — no
    extension of the open session can contain it, and merging it would
    silently rewind the session.

    ``emit_policy`` controls early emission of OPEN sessions:

    - ``"snapshot"`` (default): every batch that touches a key also
      emits its open session as a ``closed=false`` row — update-mode
      consumers (dashboards) always see the live session.
    - ``"closed_only"``: only closed sessions are emitted — append-like
      consumption with no retractions to reconcile, and the smallest
      output volume (the 100 TB default: one row per session, ever).
    """
    gap_us = gap_seconds * 1_000_000
    if emit_policy not in ("snapshot", "closed_only"):
        raise ValueError(
            f"emit_policy must be 'snapshot' or 'closed_only', got {emit_policy!r}"
        )

    def update(
        key: Tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(start: int, last: int, n: int, closed: bool) -> dict:
            return {
                "key": key[0],
                "session_start": start,
                "session_end": last,
                "n_events": n,
                "closed": closed,
            }

        if state.hasTimedOut:
            (start, last, n) = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n, True)])
            return
        ts: list[int] = []
        for pdf in batches:
            ts.extend(int(v) for v in pdf["ts_us"])
        ts.sort()
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], None, 0
        closed, (start, last, n) = fold_session(ts, start, last, n, gap_us)
        out = [row(s, e, c, True) for (s, e, c) in closed]
        state.update((start, last, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if emit_policy == "snapshot":
            out.append(row(start, last, n, False))
        if out:
            yield pd.DataFrame(out)

    keyed = sdf.select(
        F.col(key_col).cast("string").alias("key"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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
