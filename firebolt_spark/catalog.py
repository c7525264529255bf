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


# A parquet scan cannot be more parallel than its row-group count, and
# compact fixture/dimension files are routinely ONE row group — so every
# per-row expression over them (md5 shingles, LSH dots, window tiling)
# runs on a single core no matter how many the session has. Queries
# whose cost IS that per-row work opt in via :func:`spread_small_input`:
# below this on-disk size the scan is round-robin repartitioned up to
# the session's default parallelism (capped so each task keeps >=
# _MIN_ROWS rows — scheduling overhead dominates below that). The
# shuffle moves at most this many bytes (trivial); above the threshold
# the native split machinery already yields real parallelism and the
# scan is returned untouched — at warehouse scale the condition is
# simply never true, so the 100 TB plan shape is unchanged. Measured at
# sf0.1 (r17): a BLANKET load_table repartition was a net loss — the
# extra exchange is a pure ~0.2-0.5 s AQE-barrier tax on shuffle-light
# queries — while the opted-in heavy queries gain 0.3-1.8 s each, so
# the spread is a per-query decision, never a default.
# Set to 0 to disable (plan-pin tests do, to assert the at-scale shape).
SMALL_INPUT_CONF = "spark.firebolt.scan.smallInputMaxBytes"
SMALL_INPUT_DEFAULT = str(64 * 1024 * 1024)
_MIN_ROWS_PER_TASK = 64


def _small_input_partitions(spark: SparkSession, path: str) -> int:
    """Target partition count for a small single-file (or few-file)
    parquet input, or 0 to leave the scan alone. Reads only footer
    metadata; any failure (missing file, exotic layout) degrades to 0."""
    try:
        threshold = int(
            spark.conf.get(SMALL_INPUT_CONF, SMALL_INPUT_DEFAULT) or 0
        )
    except Exception:
        threshold = 0
    if threshold <= 0:
        return 0
    try:
        if os.path.isdir(path):
            files = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        else:
            files = [path]
        size = sum(os.path.getsize(f) for f in files)
        if size > threshold:
            return 0
        import pyarrow.parquet as pq

        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        target = min(
            spark.sparkContext.defaultParallelism,
            max(rows // _MIN_ROWS_PER_TASK, 0),
        )
        return target if target > max(1, len(files)) else 0
    except Exception:
        return 0


def spread_small_input(
    spark: SparkSession, df: DataFrame, sf_dir: str, name: str
) -> DataFrame:
    """Round-robin repartition a SMALL fixture table across the
    session's cores — the opt-in for queries whose dominant cost is
    per-row expression work over a compact (often single-row-group)
    input that the scan machinery cannot split. Results are unaffected
    (no operator in this engine depends on physical row placement —
    keep-first rules, samples and numbering all order on explicit
    keys). A no-op above ``SMALL_INPUT_CONF`` bytes or below the
    rows-per-task floor, so at warehouse scale the plan is unchanged.
    Note that NOTHING pushes through the spread from above — that is
    the point of the barrier below (ADVICE r17 #2).

    The always-true nondeterministic filter above the repartition is a
    deliberate PUSHDOWN BARRIER: Catalyst happily pushes deterministic
    projections and filters through a repartition to shrink the
    exchange — which re-serializes exactly the per-row work this spread
    exists to parallelize back into the single-task scan stage
    (measured r17: q_quality_selection's whole Gopher gate ran as a
    0.97 s one-task Filter under the exchange). Deterministic
    predicates cannot be reordered across a nondeterministic filter,
    so everything the query computes stays on the spread side. The
    trade (documented, deliberate): source-side predicate pushdown
    from above is blocked too — callers opt in precisely when per-row
    compute, not scan selectivity, dominates; at warehouse scale the
    whole spread (and the barrier with it) vanishes under the byte
    threshold, so at-scale pushdown is untouched."""
    n = _small_input_partitions(
        spark, os.path.join(sf_dir, f"{name}.parquet")
    )
    if not n:
        return df
    return df.repartition(n).filter(F.monotonically_increasing_id() >= 0)


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
