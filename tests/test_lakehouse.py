"""IdempotentBatchWriter: replaying a batch must replace, not append —
the rewrite half of the exactly-once story (the replay half is
test_streaming.test_mid_batch_crash_replays_batch_to_idempotent_sink)."""

from __future__ import annotations

import pytest

from firebolt_spark.sinks.lakehouse import (
    IdempotentBatchWriter,
    delta_available,
)


def test_replayed_batch_replaces_not_appends(spark, tmp_path):
    path = str(tmp_path / "idem")
    writer = IdempotentBatchWriter(path)
    b0 = spark.createDataFrame([(i,) for i in range(5)], "event_id BIGINT")

    writer(b0, 0)
    writer(b0, 0)  # replay of the SAME batch (crash-before-commit case)
    got = sorted(r["event_id"] for r in writer.read(spark).collect())
    assert got == [0, 1, 2, 3, 4]  # replaced, not duplicated


def test_distinct_batches_accumulate(spark, tmp_path):
    path = str(tmp_path / "accum")
    writer = IdempotentBatchWriter(path)
    writer(spark.createDataFrame([(1,)], "event_id BIGINT"), 0)
    writer(spark.createDataFrame([(2,)], "event_id BIGINT"), 1)
    # replay batch 0 with corrected content: only batch 0's slice changes
    writer(spark.createDataFrame([(10,)], "event_id BIGINT"), 0)
    got = sorted(r["event_id"] for r in writer.read(spark).collect())
    assert got == [2, 10]


def test_empty_replay_clears_the_batch_slice(spark, tmp_path):
    """A replayed batch that now produces ZERO rows must still clear its
    old slice — dynamic partition overwrite alone would keep the stale
    rows (it only replaces partitions present in the incoming frame)."""
    path = str(tmp_path / "empty_replay")
    writer = IdempotentBatchWriter(path)
    writer(spark.createDataFrame([(1,)], "event_id BIGINT"), 0)
    writer(spark.createDataFrame([(2,)], "event_id BIGINT"), 1)
    empty = spark.createDataFrame([], "event_id BIGINT")
    writer(empty, 0)  # corrected replay: batch 0 is now empty
    got = sorted(r["event_id"] for r in writer.read(spark).collect())
    assert got == [2]


def test_partition_layout_prunes_other_batches(spark, tmp_path):
    """The batch-id partitioning is the idempotence mechanism AND keeps
    the rewrite O(batch), not O(table): each batch is its own directory."""
    path = str(tmp_path / "layout")
    writer = IdempotentBatchWriter(path)
    for b in range(3):
        writer(spark.createDataFrame([(b,)], "event_id BIGINT"), b)
    dirs = sorted(p.name for p in (tmp_path / "layout").iterdir() if p.is_dir())
    assert dirs == ["_batch_id=0", "_batch_id=1", "_batch_id=2"]


def test_backend_pinned_to_existing_layout_across_restarts(spark, tmp_path):
    """A restarted writer (fresh instance, auto-detect) must follow the
    layout already at the path, not the new session's capability —
    mixed Delta/parquet writes would corrupt the table (ADVICE r3)."""
    path = str(tmp_path / "pin")
    IdempotentBatchWriter(path)(
        spark.createDataFrame([(1,)], "event_id BIGINT"), 0
    )
    # simulate restart: new writer, auto-detect; path holds parquet
    restarted = IdempotentBatchWriter(path)
    assert restarted._backend(spark) is False
    restarted(spark.createDataFrame([(2,)], "event_id BIGINT"), 1)
    got = sorted(r["event_id"] for r in restarted.read(spark).collect())
    assert got == [1, 2]
    # a fake _delta_log at a path must hard-stop a delta-less session
    delta_path = tmp_path / "was_delta"
    (delta_path / "_delta_log").mkdir(parents=True)
    w = IdempotentBatchWriter(str(delta_path))
    if not delta_available(spark):
        with pytest.raises(RuntimeError, match="Delta"):
            w._backend(spark)
    else:  # pragma: no cover - delta-present environment
        assert w._backend(spark) is True


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_backend_replace_where(spark, tmp_path):
    path = str(tmp_path / "delta_idem")
    writer = IdempotentBatchWriter(path, use_delta=True)
    b0 = spark.createDataFrame([(1,)], "event_id BIGINT")
    writer(b0, 0)
    writer(b0, 0)
    assert [r["event_id"] for r in writer.read(spark).collect()] == [1]
