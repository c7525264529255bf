"""The flagship end-to-end pipeline (driver smoke check).

The firebolt logging pipeline re-expressed (reference inttest/
testdata/testconfig.yaml → SURVEY §5.3): source → filter →
error-split (dead letters to an error producer) → parse/project.
Runs through the engine's YAML Pipeline builder — this is the M1
"minimum end-to-end slice" exercising envelope, registry, validation,
tree fan-out, filter protocol, error routing, and two sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from firebolt_spark.catalog import load_table
from firebolt_spark.pipeline import Pipeline

_PIPELINE_YAML = """
application: flagship
source:
  name: parquet
  params: {path: "%(events_path)s"}
nodes:
  - name: filter
    id: keep
    params: {predicate: "NOT startswith(event_type, 'filter')"}
    children:
      - name: raise_when
        id: errsplit
        params:
          predicate: "startswith(event_type, 'err')"
          message: "concat('failed on event ', event_id)"
        error_handler:
          name: error_kafka_producer
          id: dlq
          params: {topic: errors}
        children:
          - name: project
            id: enrich
            params:
              exprs:
                - event_id
                - user_id
                - event_type
                - value
                - "get_json_object(props, '$.k') AS k"
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    source_df = load_table(spark, sf_dir, "events")
    pipeline = Pipeline.from_yaml(
        _PIPELINE_YAML % {"events_path": f"{sf_dir}/events.parquet"}
    )
    result = pipeline.run_batch(spark, source_df=source_df)
    return result.outputs["enrich"].drop("created", "recovery")
