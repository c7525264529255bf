"""Fixture-table catalog — schema-aware loading of the test corpus.

Centralizes reading the driver's parquet fixtures (`TESTDATA.md`:
region nation customer supplier part orders lineitem events documents
embeddings) with the one normalization they need: their timestamp
columns are parquet TIMESTAMP(NANOS), which Spark reads as BIGINT under
``spark.sql.legacy.parquet.nanosAsLong`` — we convert to TimestampType
(microsecond precision, truncating) right at the scan so every
downstream operator sees real timestamps. Column pruning and filter
pushdown still reach the parquet scan: the conversion is a projection,
not a materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns that are event-time timestamps in each fixture table.
TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


REQUIRED_RUNTIME_CONFS = {
    # fixtures carry TIMESTAMP(NANOS) parquet — Spark must read them as longs
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp semantics (oracle treats naive ts as UTC)
    "spark.sql.session.timeZone": "UTC",
    # engine error protocol: NULL-on-bad-cast, errors via _error routing
    "spark.sql.ansi.enabled": "false",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply the runtime-settable confs this engine's semantics depend
    on. Called from every load path so the engine behaves identically
    under a caller-provided SparkSession (e.g. the driver's) that was
    built without firebolt_spark.session.get_spark."""
    for k, v in REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # non-settable in this runtime → leave as-is
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, converting nanos-long columns to timestamps."""
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in TIMESTAMP_COLS.get(name, []):
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            # TIMESTAMP(NANOS) read as BIGINT: integer DIV keeps full
            # precision (float division would lose bits above 2^53)
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
        elif isinstance(dt, TimestampNTZType):
            # micros-NTZ parquet: reinterpret as UTC instant (session tz
            # is UTC) so unix_micros & friends apply — same convention
            # the DuckDB oracle uses for naive timestamps
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
