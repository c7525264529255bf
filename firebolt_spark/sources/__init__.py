"""Sources — batch and streaming roots of a pipeline.

The reference's Source contract pushes Events onto a channel (reference
node/source.go:9-16); here a source is a factory producing a DataFrame
(batch) or streaming DataFrame, with the Event envelope stamped
(event.ensure_envelope). The Kafka consumer maps onto Spark's native
Kafka source; its ``maxpartitionlag`` catch-up semantics live in
streaming/offsets.py (reference kafkaconsumer.go:336-384).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebolt_spark.event import ensure_envelope
from firebolt_spark.registry import Registry


class ParquetSource:
    """Batch parquet scan with envelope stamping.

    Params: path (required); created_col — column to use as event time;
    columns — optional projection (pruned at the scan).
    """

    def __init__(self, params: dict[str, Any]):
        self.path = params["path"]
        self.created_col = params.get("created_col")
        self.columns = params.get("columns")

    def load(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.path)
        if self.columns:
            df = df.select(*self.columns)
        return ensure_envelope(df, created=self.created_col)


class FileSource:
    """Generic file scan (parquet/json/csv/orc/text), batch or streaming.

    Params: path, format (default parquet); options — reader options
    (e.g. header for csv); schema — DDL string (required for streaming
    file sources, recommended for csv/json so the scan never pays an
    inference pass); created_col; streaming (default False).
    """

    def __init__(self, params: dict[str, Any]):
        self.path = params["path"]
        self.format = params.get("format", "parquet")
        self.options = dict(params.get("options") or {})
        self.schema = params.get("schema")
        self.created_col = params.get("created_col")
        self.streaming = bool(params.get("streaming", False))

    def load(self, spark: SparkSession) -> DataFrame:
        reader = (spark.readStream if self.streaming else spark.read).format(
            self.format
        )
        if self.schema:
            reader = reader.schema(self.schema)
        for k, v in self.options.items():
            reader = reader.option(k, str(v))
        df = reader.load(self.path)
        return ensure_envelope(df, created=self.created_col)


class MemorySource:
    """Literal rows for tests (the reference's SimpleSource analogue,
    internal/testnodetypes.go:85-131). Params: rows — list of dicts;
    schema — DDL string."""

    def __init__(self, params: dict[str, Any]):
        self.rows = params["rows"]
        self.schema = params.get("schema")

    def load(self, spark: SparkSession) -> DataFrame:
        df = (
            spark.createDataFrame(self.rows, schema=self.schema)
            if self.schema
            else spark.createDataFrame(self.rows)
        )
        return ensure_envelope(df)


class RateSource:
    """Streaming rate source for tests. Params: rows_per_second."""

    def __init__(self, params: dict[str, Any]):
        self.rps = int(params.get("rows_per_second", 100))

    def load(self, spark: SparkSession) -> DataFrame:
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rps)
            .load()
            .withColumnRenamed("timestamp", "created")
            .withColumn("payload", F.col("value").cast("string"))
        )
        return df.withColumn("recovery", F.lit(False))


class KafkaSource:
    """Streaming Kafka consumer (reference node/kafkaconsumer/
    kafkaconsumer.go:27-437 → spark.readStream.format('kafka')).

    Params: brokers, topic (required); starting_offsets — either a mode
    string or a per-partition dict (produced by
    streaming.offsets.starting_offsets_with_lag_cap for the
    ``maxpartitionlag`` semantics, kafkaconsumer.go:336-384);
    max_offsets_per_trigger — paced catch-up / recovery rate limiting
    (replaces the reference's token bucket, recoveryconsumer.go:108);
    recovery — stamp recovery=true (recoveryconsumer.go:311-315).
    """

    def __init__(self, params: dict[str, Any]):
        self.brokers = params["brokers"]
        self.topic = params["topic"]
        self.starting_offsets = params.get("starting_offsets", "latest")
        self.ending_offsets = params.get("ending_offsets")
        self.max_offsets_per_trigger = params.get("max_offsets_per_trigger")
        self.recovery = bool(params.get("recovery", False))
        self.batch = bool(params.get("batch", False))

    def load(self, spark: SparkSession) -> DataFrame:
        import json

        reader = (spark.read if self.batch else spark.readStream).format("kafka")
        reader = reader.option("kafka.bootstrap.servers", self.brokers).option(
            "subscribe", self.topic
        )
        so = self.starting_offsets
        reader = reader.option(
            "startingOffsets", so if isinstance(so, str) else json.dumps(so)
        )
        if self.ending_offsets is not None:
            eo = self.ending_offsets
            reader = reader.option(
                "endingOffsets", eo if isinstance(eo, str) else json.dumps(eo)
            )
        if self.max_offsets_per_trigger:
            reader = reader.option(
                "maxOffsetsPerTrigger", str(self.max_offsets_per_trigger)
            )
        df = reader.load()
        # value []byte is the payload; Created=ingest time, like
        # kafkaconsumer.go:220-224 stamping Created: time.Now().
        return df.select(
            F.col("value").alias("payload"),
            F.col("partition"),
            F.col("offset"),
            F.col("timestamp").alias("created"),
            F.lit(self.recovery).alias("recovery"),
        )


def register_builtin_source_types(registry: Registry) -> None:
    registry.register_source_type("parquet", ParquetSource, None)
    registry.register_source_type("file", FileSource, None)
    registry.register_source_type("memory", MemorySource, None)
    registry.register_source_type("rate", RateSource, None)
    registry.register_source_type("kafka", KafkaSource, None)
