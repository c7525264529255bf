"""Reusable engine functions — DataFrame-level utilities shared by
operators, queries, and user pipelines.

These capture the reference's recurring dataflow idioms as composable
Spark functions (each one shuffle-conscious and AQE-friendly):

- ``compact_lww``     — last-write-wins compaction (the control-topic
  replay semantics, reference message/kakfamessagereceiver.go:195-236);
- ``newest_per_key``  — keep the newest N rows per key (the
  maxpartitionlag catch-up shape, kafkaconsumer.go:336-384);
- ``dead_letter_split`` — the error-split protocol re-exported;
- ``canonical_json``  — deterministic JSON for envelope payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from firebolt_spark.errors import split_errors as dead_letter_split  # noqa: F401


def newest_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    n: int = 1,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the newest ``n`` rows per key group, ordered by ``order_col``
    descending. One shuffle on the key; rank computed within partitions.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n)
    return out.withColumnRenamed("_rn", "rn") if keep_rank else out.drop("_rn")


def compact_lww(
    df: DataFrame,
    keys: list[str],
    order_col: str = "offset",
    ack_col: str | None = "ack",
) -> DataFrame:
    """Last-write-wins compaction: latest row per key by ``order_col``,
    optionally dropping acknowledged rows — exactly the reference's
    startup replay of the compacted message topic (keep only latest per
    ``messagetype-key``, drop acknowledged)."""
    latest = newest_per_key(df, keys, order_col, n=1)
    if ack_col is not None and ack_col in df.columns:
        latest = latest.filter(~F.col(ack_col))
    return latest


def canonical_json(*cols: Column | str) -> Column:
    """Deterministic JSON of the given columns (field order = call
    order; Spark's to_json is stable for a fixed struct)."""
    return F.to_json(F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols]))
