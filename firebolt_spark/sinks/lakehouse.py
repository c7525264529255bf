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


def delta_available(spark: SparkSession | None = None) -> bool:
    """True iff the delta-spark package is importable AND (when a
    session is given) the session was built with the Delta SQL
    extension — a pip-installed package on a session without
    ``spark.sql.extensions`` configured cannot execute Delta writes, so
    auto-detection must check both or the writer would pick a backend
    that fails at runtime instead of falling back to parquet."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is None:
        return True
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        ext = ""
    return "DeltaSparkSessionExtension" in ext


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
        self.use_delta = use_delta  # None → auto-detect on first write

    def _path_exists(self, spark: SparkSession, path: str) -> bool:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(jsc.hadoopConfiguration()).exists(p)

    def _backend(self, spark: SparkSession) -> bool:
        """Auto-detection is pinned to what is ALREADY at the path: a
        target written as Delta in one run must never be extended as
        plain parquet by a restart whose session lacks the Delta
        extension (and vice versa) — that would corrupt the table
        layout (ADVICE r3). Only a genuinely fresh path consults
        session capability."""
        if self.use_delta is None:
            if self._path_exists(spark, f"{self.path}/_delta_log"):
                if not delta_available(spark):
                    raise RuntimeError(
                        f"{self.path} is a Delta table but this session "
                        "has no Delta support — refusing to write "
                        "parquet into it; restart with the Delta "
                        "extension configured"
                    )
                self.use_delta = True
            elif self._path_exists(spark, self.path):
                self.use_delta = False  # pre-existing parquet layout
            else:
                self.use_delta = delta_available(spark)
        return self.use_delta

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        use_delta = self._backend(df.sparkSession)
        stamped = df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        if use_delta:
            (
                stamped.write.format("delta")
                .mode("overwrite")
                .option("replaceWhere", f"{BATCH_COL} = {int(batch_id)}")
                .save(self.path)
            )
            return
        if df.isEmpty():
            # dynamic partition overwrite only replaces partitions
            # PRESENT in the incoming frame — a replayed batch that now
            # produces zero rows must still clear its old slice or the
            # replace contract silently degrades to keep-old
            self._delete_partition(df.sparkSession, int(batch_id))
            return
        (
            stamped.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(self.path)
        )

    def _delete_partition(self, spark: SparkSession, batch_id: int) -> None:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{BATCH_COL}={batch_id}")
        fs = p.getFileSystem(jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)

    def read(self, spark: SparkSession) -> DataFrame:
        """Current table contents (bookkeeping column dropped). Parquet
        backend: reading before any non-empty batch was written raises
        Spark's cannot-infer-schema error — there is no schema to serve
        yet."""
        use_delta = self._backend(spark)
        reader = spark.read.format("delta") if use_delta else spark.read
        df = reader.load(self.path) if use_delta else spark.read.parquet(self.path)
        return df.drop(BATCH_COL)
