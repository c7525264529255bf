"""firebolt_spark — a PySpark-native streaming/batch event-pipeline engine.

A from-scratch rebuild of the capabilities of digitalocean/firebolt (a Go
streaming event-processing framework; see /root/reference) on idiomatic
Spark: DataFrames + Structured Streaming + Catalyst. It is NOT a port — the
reference's per-event push tree maps onto declarative DataFrame transforms,
wide operations (joins/aggs/windows) come from Spark SQL, and the engine
adds LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
    session    — tuned SparkSession builder (AQE, Arrow, UTC)
    event      — the Event envelope (payload cols + created/recovery)
    errors     — FBError / EventError dead-letter envelope + normalization
    registry   — operator registry with declared consumes/produces schemas
    config     — YAML pipeline config parsing + static validation
    pipeline   — DAG builder / batch executor (tree fan-out, error routing)
    operators/ — per-event transforms, filters, fanout, dedup, similarity,
                 text analysis, multimodal plumbing
    sources/   — batch + streaming sources (parquet, kafka, rate, memory)
    sinks/     — parquet/kafka sinks, Elasticsearch-style bulk sink
    streaming/ — offset planning (maxpartitionlag, parallel recovery),
                 streaming runner, metrics listener
    queries/   — the declared oracle-checked query surface (SURVEY §2.9,
                 relational capability suite, LLM pipeline operators)
"""

from firebolt_spark.session import get_spark
from firebolt_spark.registry import get_registry, Registry
from firebolt_spark.pipeline import Pipeline

__all__ = ["get_spark", "get_registry", "Registry", "Pipeline"]
__version__ = "0.1.0"
