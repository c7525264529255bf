"""Offset planning — maxpartitionlag catch-up + parallel recovery ranges.

Rebuild of the reference's offset-capped catch-up and recovery
bookkeeping (reference node/kafkaconsumer/kafkaconsumer.go:336-384,
recoverytracker.go:17-262) as pure, testable planning functions plus a
distributed interval-merge operator.

The reference's semantics: on partition assignment, if the consumer is
more than ``maxpartitionlag`` behind the high watermark, skip to
``high - maxpartitionlag`` (deliberate data skip to return to realtime,
kafkaconsumer.go:362-374) and file a recovery request for the skipped
range ``[committed, high - maxlag)``; a second, rate-limited consumer
back-fills that range with ``recovery=true`` (recoveryconsumer.go).
Overlapping recovery requests are merged (recoverytracker.go:86-96).

In Spark: the live query gets ``startingOffsets`` per-partition JSON;
the backfill is a bounded batch (or rate-capped streaming) query over
``startingOffsets``/``endingOffsets`` with ``maxOffsetsPerTrigger`` as
the token bucket (SURVEY §2.1 S3/S4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class RecoveryRange:
    """A recovery request: back-fill [from_offset, to_offset) on one
    partition (reference recoverytracker.go:25-30)."""

    partition_id: int
    from_offset: int
    to_offset: int


def plan_assignment(
    committed: dict[int, int],
    high_watermarks: dict[int, int],
    max_partition_lag: int,
) -> tuple[dict[int, int], list[RecoveryRange]]:
    """Compute starting offsets + recovery ranges for an assignment.

    Mirrors calculateAssignmentOffsets (kafkaconsumer.go:336-384): per
    partition, lag = high - committed; if lag > maxlag, start at
    high - maxlag and file a recovery range for the skipped gap.
    ``committed`` maps partition → next offset to read (absent = start
    from 0 high-watermark semantics handled by caller).
    """
    starting: dict[int, int] = {}
    ranges: list[RecoveryRange] = []
    for pid, high in sorted(high_watermarks.items()):
        cur = committed.get(pid, 0)
        if max_partition_lag > 0 and high - cur > max_partition_lag:
            start = high - max_partition_lag
            starting[pid] = start
            ranges.append(RecoveryRange(pid, cur, start))
        else:
            starting[pid] = cur
    return starting, ranges


def starting_offsets_json(topic: str, starting: dict[int, int]) -> dict:
    """Kafka source ``startingOffsets`` JSON value for one topic."""
    return {topic: {str(p): o for p, o in sorted(starting.items())}}


def merge_ranges(ranges: list[RecoveryRange]) -> list[RecoveryRange]:
    """Driver-side merge of overlapping/adjacent ranges per partition
    (reference recoverytracker.go:86-96 AddRecoveryRequest)."""
    out: list[RecoveryRange] = []
    by_part: dict[int, list[RecoveryRange]] = {}
    for r in ranges:
        by_part.setdefault(r.partition_id, []).append(r)
    for pid in sorted(by_part):
        cur_from: int | None = None
        cur_to: int | None = None
        for r in sorted(by_part[pid], key=lambda r: (r.from_offset, r.to_offset)):
            if cur_from is None:
                cur_from, cur_to = r.from_offset, r.to_offset
            elif r.from_offset <= cur_to:
                cur_to = max(cur_to, r.to_offset)
            else:
                out.append(RecoveryRange(pid, cur_from, cur_to))
                cur_from, cur_to = r.from_offset, r.to_offset
        if cur_from is not None:
            out.append(RecoveryRange(pid, cur_from, cur_to))
    return out


def merge_intervals(
    df: DataFrame,
    partition_col: str = "partition_id",
    from_col: str = "from_offset",
    to_col: str = "to_offset",
) -> DataFrame:
    """Distributed gaps-and-islands interval merge — the recovery
    tracker's overlap merge as a window-function DataFrame op (so the
    same bookkeeping scales to millions of ranges).

    An island starts where ``from`` exceeds the running max of previous
    ``to``s; islands are numbered by a running sum of starts; the merged
    range is min(from)..max(to) per island. One shuffle on the partition
    key; both windows reuse that partitioning (no second exchange).
    """
    order = Window.partitionBy(partition_col).orderBy(from_col, to_col)
    prev_max = (
        F.max(to_col)
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
    )
    with_start = df.withColumn(
        "_is_start",
        F.when(prev_max.isNull() | (F.col(from_col) > prev_max), 1).otherwise(0),
    )
    grouped = with_start.withColumn(
        "_grp",
        F.sum("_is_start").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grouped.groupBy(partition_col, "_grp")
        .agg(
            F.min(from_col).alias(from_col),
            F.max(to_col).alias(to_col),
        )
        .drop("_grp")
    )
