"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in the ``firebolt_spark`` package (this repo);
this module only aggregates the declared query surface:
- ``firebolt_spark.queries.reference`` — SURVEY §2.9 reference parity
- ``firebolt_spark.queries.relational`` — SURVEY §2.10/M3 capability suite
- ``firebolt_spark.queries.llm`` — M6 LLM-data-pipeline operators
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the firebolt-style event pipeline end-to-end on sf0.001 —
    filter → error-split (dead letters routed) → parse/project, returning
    the ok branch (SURVEY §7.1 M1)."""
    from firebolt_spark.queries.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from firebolt_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from firebolt_spark.queries import all_oracle_sql

    return all_oracle_sql()
