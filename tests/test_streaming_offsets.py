"""Offset planning — the rebuild of calculateAssignmentOffsets and the
recovery tracker's range merge (reference kafkaconsumer_test.go:148
TestCalculateOffsets, recoverytracker_test.go:19 TestAddRecoveryRequest)."""

from __future__ import annotations

from firebolt_spark.streaming.offsets import (
    RecoveryRange,
    merge_intervals,
    merge_ranges,
    plan_assignment,
    starting_offsets_json,
)


def test_lag_under_cap_starts_at_committed():
    starting, ranges = plan_assignment(
        committed={0: 900}, high_watermarks={0: 1000}, max_partition_lag=200
    )
    assert starting == {0: 900}
    assert ranges == []


def test_lag_over_cap_skips_and_files_recovery():
    # kafkaconsumer.go:362-374: start at high - maxlag, recover the gap
    starting, ranges = plan_assignment(
        committed={0: 100, 1: 950}, high_watermarks={0: 1000, 1: 1000},
        max_partition_lag=200,
    )
    assert starting == {0: 800, 1: 950}
    assert ranges == [RecoveryRange(0, 100, 800)]


def test_zero_lag_cap_disables_skipping():
    starting, ranges = plan_assignment(
        committed={0: 0}, high_watermarks={0: 10_000_000}, max_partition_lag=0
    )
    assert starting == {0: 0} and ranges == []


def test_starting_offsets_json_shape():
    assert starting_offsets_json("t", {1: 5, 0: 7}) == {"t": {"0": 7, "1": 5}}


def test_merge_ranges_overlap_and_adjacent():
    # recoverytracker.go:86-96 overlap merge semantics
    merged = merge_ranges(
        [
            RecoveryRange(0, 10, 20),
            RecoveryRange(0, 15, 30),   # overlaps
            RecoveryRange(0, 30, 40),   # adjacent (30 <= 30) merges
            RecoveryRange(0, 50, 60),   # gap → new island
            RecoveryRange(1, 5, 6),
        ]
    )
    assert merged == [
        RecoveryRange(0, 10, 40),
        RecoveryRange(0, 50, 60),
        RecoveryRange(1, 5, 6),
    ]


def test_merge_intervals_distributed_matches_driver_side(spark):
    rows = [
        (0, 10, 20), (0, 15, 30), (0, 30, 40), (0, 50, 60),
        (1, 5, 6), (1, 100, 200), (1, 150, 160),
    ]
    df = spark.createDataFrame(
        rows, "partition_id INT, from_offset BIGINT, to_offset BIGINT"
    )
    got = {
        (r["partition_id"], r["from_offset"], r["to_offset"])
        for r in merge_intervals(df).collect()
    }
    expect = {
        (p.partition_id, p.from_offset, p.to_offset)
        for p in merge_ranges([RecoveryRange(*r) for r in rows])
    }
    assert got == expect
