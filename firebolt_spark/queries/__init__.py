"""The declared, oracle-checked query surface of the engine."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE)
    return out


def _modules():
    from firebolt_spark.queries import reference

    mods = [reference]
    for name in ("relational", "llm"):
        try:
            mods.append(
                __import__(f"firebolt_spark.queries.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods
