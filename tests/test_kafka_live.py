"""Live-broker Kafka e2e drills (VERDICT r6 "Next #2").

The file-backed twins in tests/test_streaming_e2e.py prove every engine
code path (planner, KafkaSource frame handling, runner, DLQ, metrics)
over a fake wire; what they cannot prove is the transport binding
itself — startingOffsets against broker-reported watermarks, the
``maxpartitionlag`` cap on a real backlog, produce→consume round-trips.
These drills close exactly that gap, mirroring the reference's
integration suite (/root/reference/inttest/integration_test.go:28-112
TestEndToEnd 90/6/4 counts; :125-212 TestRecovery 2,400-event
envelope).

Skipped-with-reason unless ``KAFKA_BOOTSTRAP`` is set. To run green
(docs/kafka_runbook.md §1, §6):

1. Broker up (docker compose, apache/kafka KRaft image is enough).
2. Spark Kafka connector on the classpath, e.g.::

       export PYSPARK_SUBMIT_ARGS="--packages \
         org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> \
         pyspark-shell"

3. ``KAFKA_BOOTSTRAP=localhost:9092 python -m pytest \
   tests/test_kafka_live.py -v``

Topics are uniquely suffixed per run so a long-lived broker never
bleeds state between runs. The end-to-end drill works on auto-created
topics; the recovery drill needs a 4-partition input topic (created on
the fly when the broker allows explicit-partition produce, otherwise it
skips with the runbook pointer).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from firebolt_spark import Pipeline
from firebolt_spark.sinks.elasticsearch import FileBackedBulkClient
from firebolt_spark.sources import KafkaSource
from firebolt_spark.streaming.recovery import (
    RecoveryOrchestrator,
    RecoveryTracker,
)
from firebolt_spark.streaming.runner import StreamingPipelineRunner

from tests.test_streaming_e2e import _produce_test_data

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    BOOTSTRAP is None,
    reason=(
        "live-broker drill: set KAFKA_BOOTSTRAP=host:9092 with a running "
        "broker and the Spark Kafka connector on the classpath "
        "(docs/kafka_runbook.md §6) — the file-backed twins in "
        "test_streaming_e2e.py cover these paths in CI"
    ),
)

# the reference's testconfig.yaml shape (inttest/testdata/
# testconfig.yaml) with the live source parametrized: sync branch
# filter -> error split (DLQ) -> produce; async branch filter ->
# [error split -> produce, index-request -> elasticsearch]
LIVE_YAML = """
application: inttest-live
source:
  name: kafka
  params:
    brokers: {brokers}
    topic: {topic}
    starting_offsets: {starting_offsets}
    max_offsets_per_trigger: 100000
nodes:
  - name: filter
    id: filternode
    params: {{predicate: "CAST(payload AS STRING) <> 'filter me'"}}
    children:
      - name: raise_when
        id: errornode
        params: {{predicate: "CAST(payload AS STRING) = 'error time'",
                 message: "'error time is not a valid event'"}}
        error_handler:
          name: error_kafka_producer
          id: errorkafkaproducer
          params: {{topic: {err_topic}}}
        children:
          - name: kafka_producer
            id: kafkaproducer
            params: {{topic: {out_topic}}}
  - name: filter
    id: asyncfilternode
    params: {{predicate: "CAST(payload AS STRING) <> 'filter me'"}}
    children:
      - name: raise_when
        id: asyncerrornode
        params: {{predicate: "CAST(payload AS STRING) = 'error time'",
                 message: "'error time is not a valid event'"}}
        children:
          - name: kafka_producer
            id: asynckafkaproducer
            params: {{topic: {async_topic}}}
      - name: project
        id: indexrequestbuilder
        params:
          exprs:
            - "'inttest' AS index"
            - "concat('doc-', partition, '-', offset) AS doc_id"
            - "CAST(payload AS STRING) AS body"
        children:
          - name: elasticsearch
            id: es
            params: {{batch_size: 25}}
"""


def _require_connector(spark):
    """Probe the Kafka data source; skip (not fail) when the connector
    jar is absent — the env var promises a broker, not a classpath."""
    probe = f"fb-probe-{uuid.uuid4().hex[:8]}"
    try:
        (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("subscribe", probe)
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest")
            .load()
            .count()
        )
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        if "Failed to find data source" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            pytest.skip(
                "Spark Kafka connector not on the classpath — launch with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
                "<spark-version> (docs/kafka_runbook.md §0)"
            )
        raise  # broker named but unreachable: a real failure, surface it


def _produce(spark, topic: str, rows, with_partition: bool) -> None:
    """Batch-produce via Spark's own Kafka sink (no extra client deps).
    rows: (partition, value bytes)."""
    if with_partition:
        df = spark.createDataFrame(
            [(p, v) for p, v in rows], "partition INT, value BINARY"
        )
    else:
        df = spark.createDataFrame([(v,) for _, v in rows], "value BINARY")
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )


def _read_all(spark, topic: str):
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )


def _mix_rows(count: int):
    """The reference's produceTestData mix as (partition, value)."""
    return [(r[2], r[1]) for r in _produce_test_data(count)]


def _kafka_writer_sink(node_id: str, counts: dict):
    """Counting sink that ALSO produces the node's (topic, value) rows
    to the real broker — the producer nodes emit per-row topic columns
    Spark's Kafka sink honors natively."""

    def sink(df, batch_id):
        counts[node_id] = counts.get(node_id, 0) + df.count()
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .save()
        )

    return sink


def test_end_to_end_counts_against_live_broker(spark, tmp_path):
    """TestEndToEnd twin (integration_test.go:28-112): 100 records
    (90 syslog / 6 'filter me' / 4 'error time') through the full
    two-branch pipeline over a REAL broker: consume from the in topic,
    produce 90 to out, dead-letter 4 to err, produce 90 to async-out,
    bulk-index 94 — then consume the out/err topics back and count."""
    _require_connector(spark)
    sfx = uuid.uuid4().hex[:8]
    in_topic = f"fb-e2e-in-{sfx}"
    out_topic = f"fb-e2e-out-{sfx}"
    err_topic = f"fb-e2e-err-{sfx}"
    async_topic = f"fb-e2e-async-{sfx}"

    rows = _mix_rows(100)
    try:
        # near-even spread like the reference's non-sticky partitioner —
        # needs the topic to exist with 4 partitions
        _produce(spark, in_topic, rows, with_partition=True)
    except Exception:  # noqa: BLE001 - auto-created topic has 1 partition
        _produce(spark, in_topic, rows, with_partition=False)

    pipeline = Pipeline.from_yaml(
        LIVE_YAML.format(
            brokers=BOOTSTRAP,
            topic=in_topic,
            starting_offsets="earliest",
            out_topic=out_topic,
            err_topic=err_topic,
            async_topic=async_topic,
        )
    )
    spool = str(tmp_path / "es-spool")

    def walk(nodes):
        for rt in nodes:
            yield rt
            yield from walk(rt.children)
            if rt.error_handler is not None:
                yield rt.error_handler

    es_rt = next(rt for rt in walk(pipeline.roots) if rt.id == "es")
    es_rt.operator.client_factory = lambda: FileBackedBulkClient(spool_dir=spool)

    counts: dict[str, int] = {}
    runner = StreamingPipelineRunner(
        pipeline,
        sinks={
            nid: _kafka_writer_sink(nid, counts)
            for nid in ("kafkaproducer", "errorkafkaproducer", "asynckafkaproducer")
        },
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query = runner.start(spark, trigger={"availableNow": True}, query_name=f"live-{sfx}")
    try:
        assert query.awaitTermination(180)
    finally:
        query.stop()

    # node-level counts (the reference's channel counts)
    assert counts["kafkaproducer"] == 90
    assert counts["errorkafkaproducer"] == 4
    assert counts["asynckafkaproducer"] == 90
    m = runner.metrics
    assert m.rows_in == 100
    assert m.node("filternode").success == 94
    assert m.node("errornode").error + m.node("asyncerrornode").error == 8

    # transport-level counts: consume the produced topics back from the
    # broker — the round-trip the file-backed twin cannot make
    assert _read_all(spark, out_topic).count() == 90
    assert _read_all(spark, err_topic).count() == 4
    assert _read_all(spark, async_topic).count() == 90
    # dead letters carry the reference's error envelope
    err_rows = (
        _read_all(spark, err_topic)
        .select(F.col("value").cast("string").alias("v"))
        .collect()
    )
    for r in err_rows:
        payload = json.loads(r["v"])
        assert payload["error"]["message"] == "error time is not a valid event"
    # elasticsearch: all 94 unfiltered docs through the real bulk path
    assert len(FileBackedBulkClient(spool_dir=spool).indexed_ids()) == 94


def test_recovery_envelope_against_live_broker(spark, tmp_path):
    """TestRecovery twin (integration_test.go:125-212): 4,000 records
    exist BEFORE startup (~1,000/partition on 4 partitions); the live
    consumer starts lag-capped at 100/partition (400 rows) and the
    recovery consumer back-fills the newest 500/partition (2,000 rows)
    as bounded batches through the SAME pipeline — total processed is
    exactly 2,400 (passed + filtered + errored), 500 recovered per
    partition, every recovery row stamped recovery=true."""
    _require_connector(spark)
    sfx = uuid.uuid4().hex[:8]
    in_topic = f"fb-rec-in-{sfx}"

    rows = _mix_rows(4000)
    try:
        _produce(spark, in_topic, rows, with_partition=True)
    except Exception:  # noqa: BLE001
        pytest.skip(
            "recovery drill needs a 4-partition input topic — create "
            f"'{in_topic}' with --partitions 4 first (docs/kafka_runbook.md §1)"
        )

    # broker-reported high watermarks per partition
    high = {
        int(r["partition"]): int(r["hw"])
        for r in _read_all(spark, in_topic)
        .groupBy("partition")
        .agg((F.max("offset") + 1).alias("hw"))
        .collect()
    }
    assert set(high) == {0, 1, 2, 3} and sum(high.values()) == 4000

    # single-branch pipeline (testconfig-withRecovery.yaml shape) —
    # counting sinks; the out-topic round trip is the e2e drill's job
    pipeline = Pipeline.from_yaml(
        LIVE_YAML.format(
            brokers=BOOTSTRAP,
            topic=in_topic,
            starting_offsets="earliest",  # overridden by the planner below
            out_topic=f"fb-rec-out-{sfx}",
            err_topic=f"fb-rec-err-{sfx}",
            async_topic=f"fb-rec-async-{sfx}",
        )
    )
    orch = RecoveryOrchestrator(
        pipeline,
        RecoveryTracker(spark, str(tmp_path / "tracker")),
        max_partition_lag=100,      # maxpartitionlag
        max_records_per_partition=500,  # parallelrecoverymaxrecords
    )
    plan = orch.plan(committed={}, high_watermarks=high)
    assert plan.starting_offsets == {p: high[p] - 100 for p in high}
    assert all(r.to_offset - r.from_offset == 500 for r in plan.ranges)

    # live query from the capped offsets — 100/partition = 400 rows
    counts: dict[str, int] = {}

    def counting_sink(nid):
        def sink(df, batch_id):
            counts[nid] = counts.get(nid, 0) + df.count()

        return sink

    live_src = KafkaSource(
        {
            "brokers": BOOTSTRAP,
            "topic": in_topic,
            "starting_offsets": {
                in_topic: {str(p): o for p, o in plan.starting_offsets.items()}
            },
        }
    )
    runner = StreamingPipelineRunner(
        pipeline,
        sinks={
            nid: counting_sink(nid)
            for nid in ("kafkaproducer", "errorkafkaproducer",
                        "asynckafkaproducer")
        },
        checkpoint_dir=str(tmp_path / "ckpt-rec"),
    )
    query = runner.start(
        spark,
        source_df=live_src.load(spark),
        trigger={"availableNow": True},
        query_name=f"live-rec-{sfx}",
    )
    try:
        assert query.awaitTermination(180)
    finally:
        query.stop()
    assert runner.metrics.rows_in == 400  # the lag cap against real watermarks

    # bounded recovery backfills through the real Kafka batch source —
    # one per range, rate-limitable via maxOffsetsPerTrigger at scale
    recovered_per_partition: dict[int, int] = {}
    recovery_processed = 0
    for rng in plan.ranges:
        src = KafkaSource(
            {
                "brokers": BOOTSTRAP,
                "topic": in_topic,
                "batch": True,
                "recovery": True,
                "starting_offsets": {in_topic: {str(rng.partition_id): rng.from_offset}},
                "ending_offsets": {in_topic: {str(rng.partition_id): rng.to_offset}},
            }
        )
        backfill = src.load(spark)
        result = orch.run_backfill_batch(spark, backfill, rng)
        n = backfill.count()
        recovered_per_partition[rng.partition_id] = (
            recovered_per_partition.get(rng.partition_id, 0) + n
        )
        assert backfill.filter(~F.col("recovery")).count() == 0
        # the same DAG processed the backfill (pass-count bounded by rows)
        assert result.outputs["filternode"].count() <= n
        recovery_processed += n
        result.unpersist()
    assert recovered_per_partition == {p: 500 for p in range(4)}

    # the reference's envelope: live 400 + recovered 2,000 == 2,400
    assert runner.metrics.rows_in + recovery_processed == 2400
    assert not orch.tracker.pending()  # every range completed
