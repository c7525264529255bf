"""Idempotent batch-rewrite sink — exactly-once effect on replay.

The runner's checkpointed foreachBatch gives at-least-once delivery
(reference parity is T4; the reference itself only guarantees
at-least-once, transport/kafkaconsumer semantics). A sink that
OVERWRITES per batch id — instead of appending — upgrades that to an
exactly-once *effect*: replaying an uncommitted batch rewrites the same
target slice, so duplicates cannot accumulate (the mid-batch-crash test
in tests/test_streaming.py proves the replay; this module makes the
rewrite idempotent).

Two backends, picked automatically:

- **Delta Lake** (``delta`` importable and the session configured with
  its catalog): ``replaceWhere`` on the batch-id column — a
  transactional replace, also safe under concurrent readers.
- **Parquet dynamic partition overwrite** (always available): the frame
  is written partitioned by ``_batch_id`` with
  ``partitionOverwriteMode=dynamic``, so a replayed batch replaces
  exactly its own partition directory and nothing else.

At 100 TB the same pattern holds: the batch id is a tiny partition key
(one directory per trigger), compaction happens downstream, and readers
prune on real predicates — the `_batch_id` layer exists purely for
idempotent replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "_batch_id"


def delta_available() -> bool:
    """True iff the delta-spark package is importable. The sandbox
    container does not ship it; a real deployment that installs
    ``delta-spark`` (and configures the Delta catalog extensions) gets
    the transactional backend with no code change."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class IdempotentBatchWriter:
    """foreachBatch-compatible sink: ``writer(df, batch_id)`` replaces
    the batch's slice of ``path`` instead of appending.

    Usage with the streaming runner::

        writer = IdempotentBatchWriter(str(out_path))
        StreamingPipelineRunner(pipeline, sinks={"out": writer})

    ``read(spark)`` returns the current table contents without the
    bookkeeping column.
    """

    def __init__(self, path: str, use_delta: bool | None = None):
        self.path = path
        self.use_delta = delta_available() if use_delta is None else use_delta

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        stamped = df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        if self.use_delta:
            (
                stamped.write.format("delta")
                .mode("overwrite")
                .option("replaceWhere", f"{BATCH_COL} = {int(batch_id)}")
                .save(self.path)
            )
        else:
            (
                stamped.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BATCH_COL)
                .parquet(self.path)
            )

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("delta") if self.use_delta else spark.read
        df = (
            reader.load(self.path)
            if self.use_delta
            else reader.parquet(self.path)
        )
        return df.drop(BATCH_COL)
