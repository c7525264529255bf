"""SURVEY §2.9 declared queries — the reference-parity oracle contract.

Every operator in the reference's inventory (SURVEY §2) with
batch-expressible semantics is pinned here by a canonical query with two
implementations: a Spark DataFrame program (the engine under test) and
an equivalent DuckDB SQL string (the oracle). The driver hash-matches
row counts, schemas, and values at sf0.01.

Cross-engine determinism rules used throughout:
- timestamps are emitted as ``unix_micros`` BIGINT (the fixtures are
  nanosecond parquet; both engines truncate ns→µs identically for
  positive epochs);
- aggregate doubles are ``round(x, 2)``; raw column doubles pass through
  exactly (both engines read the same parquet bits);
- every computed column is aliased identically on both sides (the
  driver's compare sorts columns by name).

The ``messages`` and ``recovery_requests`` inputs (FIXTURES.md §1.6-1.7)
are derived deterministically from ``events`` with integer-only
arithmetic, expressed identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from firebolt_spark.catalog import load_table
from firebolt_spark.errors import ERR_UNKNOWN
from firebolt_spark.operators.core import FilterNode, RaiseWhenNode
from firebolt_spark.streaming.offsets import merge_intervals


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _ts_us(col: str = "ts") -> F.Column:
    return F.unix_micros(F.col(col))


# ---------------------------------------------------------------------------
# derived control-plane inputs (FIXTURES.md §1.6-1.7)

def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted control-topic fixture derived from events."""
    e = _events(spark, sf_dir)
    return e.select(
        F.col("event_id").alias("offset"),
        F.col("event_type").alias("message_type"),
        (F.col("user_id") % 50).cast("string").alias("key"),
        (F.col("event_id") % 7 == 0).alias("ack"),
    )


_MESSAGES_SQL = """
    SELECT event_id AS "offset",
           event_type AS message_type,
           CAST(user_id % 50 AS VARCHAR) AS "key",
           (event_id % 7 = 0) AS ack
    FROM events
"""


def _recovery_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recovery-range fixture derived from events (overlapping ranges)."""
    e = _events(spark, sf_dir).filter(F.col("event_id") % 37 == 0)
    frm = (F.col("event_id") * 10) % 100000
    return e.select(
        (F.col("user_id") % 4).cast("int").alias("partition_id"),
        frm.alias("from_offset"),
        (frm + 50 + (F.col("event_id") % 200)).alias("to_offset"),
    )


_RECOVERY_REQUESTS_SQL = """
    SELECT CAST(user_id % 4 AS INTEGER) AS partition_id,
           (event_id * 10) % 100000 AS from_offset,
           (event_id * 10) % 100000 + 50 + (event_id % 200) AS to_offset
    FROM events
    WHERE event_id % 37 = 0
"""


# ---------------------------------------------------------------------------
# §2.1 sources / scans

def q_s2_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-S2 source fidelity: every row, exact values (kafkaconsumer →
    payload passthrough, reference kafkaconsumer.go:213-233)."""
    return _events(spark, sf_dir).select(
        "event_id",
        _ts_us().alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


Q_S2_SQL = """
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
"""


def q_s3_lag_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-S3 maxpartitionlag analogue: newest N per partition key
    (kafkaconsumer.go:362-374 keeps only the last maxlag offsets)."""
    from firebolt_spark.functions import newest_per_key

    e = _events(spark, sf_dir).select("event_id", "user_id")
    return newest_per_key(e, ["user_id"], "event_id", n=100, keep_rank=True)


Q_S3_SQL = """
    SELECT event_id, user_id, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
    )
    WHERE rn <= 100
"""


def q_s4_recovery_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-S4 bounded offset-range backfill stamped recovery=true
    (recoveryconsumer.go:311-315)."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id").between(1000, 1999))
        .select("event_id", F.lit(True).alias("recovery"))
    )


Q_S4_SQL = """
    SELECT event_id, true AS recovery
    FROM events
    WHERE event_id BETWEEN 1000 AND 1999
"""


def q_s5_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-S5 recovery-range overlap merge (recoverytracker.go:86-96) via
    the engine's distributed gaps-and-islands operator."""
    return merge_intervals(_recovery_requests(spark, sf_dir)).select(
        "partition_id", "from_offset", "to_offset"
    )


Q_S5_SQL = f"""
    WITH r AS ({_RECOVERY_REQUESTS_SQL}),
    o AS (
        SELECT partition_id, from_offset, to_offset,
               max(to_offset) OVER (
                   PARTITION BY partition_id ORDER BY from_offset, to_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max
        FROM r
    ),
    s AS (
        SELECT *, CASE WHEN prev_max IS NULL OR from_offset > prev_max
                       THEN 1 ELSE 0 END AS is_start
        FROM o
    ),
    g AS (
        SELECT *, sum(is_start) OVER (
                   PARTITION BY partition_id ORDER BY from_offset, to_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS grp
        FROM s
    )
    SELECT partition_id, min(from_offset) AS from_offset, max(to_offset) AS to_offset
    FROM g
    GROUP BY partition_id, grp
"""


def q_s6_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-S6 control-topic replay via the engine's LWW compaction
    function: latest per (message_type, key) by offset, drop
    acknowledged (kakfamessagereceiver.go:195-236)."""
    from firebolt_spark.functions import compact_lww

    m = _messages(spark, sf_dir)
    return compact_lww(m, ["message_type", "key"], "offset", "ack").select(
        "message_type", "key", "offset"
    )


Q_S6_SQL = f"""
    WITH m AS ({_MESSAGES_SQL})
    SELECT message_type, "key", "offset"
    FROM (
        SELECT m.*, row_number() OVER (
                   PARTITION BY message_type, "key" ORDER BY "offset" DESC
               ) AS rn
        FROM m
    )
    WHERE rn = 1 AND NOT ack
"""


# ---------------------------------------------------------------------------
# §2.2 projections / per-event transforms

def q_p2_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-P2 payload parse (syslogparser.go:25-40 analogue): extract JSON
    fields from the props column, absent path → NULL not error."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("n"),
    )


Q_P2_SQL = """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS n
    FROM events
"""


def q_p4_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-P4 project-to-JSON (jsonbuilder.go:37-61)."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.to_json(F.struct("user_id", "event_type")).alias("doc"),
    )


Q_P4_SQL = """
    SELECT event_id,
           '{"user_id":' || user_id || ',"event_type":"' || event_type || '"}' AS doc
    FROM events
"""


def q_p5_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-P5 conditional struct shape (docbuilder.go:73-89's deliberate
    numeric-vs-object branch on pid < 100), flattened for hashing."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.when(F.col("user_id") < 25, F.col("user_id")).alias("program_numeric"),
        F.when(F.col("user_id") >= 25, F.col("user_id")).alias("obj_user_id"),
        F.when(F.col("user_id") >= 25, F.col("event_type")).alias("obj_event_type"),
    )


Q_P5_SQL = """
    SELECT event_id,
           CASE WHEN user_id < 25 THEN user_id END AS program_numeric,
           CASE WHEN user_id >= 25 THEN user_id END AS obj_user_id,
           CASE WHEN user_id >= 25 THEN event_type END AS obj_event_type
    FROM events
"""


def q_p7_docid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-P7 running doc-counter assignment (testnodetypes.go:412-430) via
    the engine's two-phase global numbering (no single-task window)."""
    from firebolt_spark.functions import global_row_number

    e = _events(spark, sf_dir).select("event_type", "event_id")
    return global_row_number(e, ["event_id"], out_col="doc_num").select(
        "event_type", "doc_num"
    )


Q_P7_SQL = """
    SELECT event_type,
           CAST(row_number() OVER (ORDER BY event_id) AS INTEGER) AS doc_num
    FROM events
"""


# ---------------------------------------------------------------------------
# §2.3 filters + §2.5 error routing

_FILTER_PREDICATE = "NOT startswith(event_type, 'err')"


def q_f1_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-F1 filter-by-nil protocol via the engine's FilterNode
    (node/node.go:184-188; testnodetypes.go:150-165 prefix filter)."""
    node = FilterNode({"predicate": _FILTER_PREDICATE})
    return node.transform(_events(spark, sf_dir)).select("event_id", "event_type")


Q_F1_SQL = """
    SELECT event_id, event_type
    FROM events
    WHERE NOT starts_with(event_type, 'err')
"""


def q_e1_error_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-E1 error split (node.go:178-196): one input partitioned totally
    and disjointly into ok + dlq branches, via the engine's RaiseWhenNode
    + split protocol; branches unioned with a discriminator column."""
    from firebolt_spark.errors import split_errors

    e = _events(spark, sf_dir)
    node = RaiseWhenNode(
        {"predicate": "startswith(event_type, 'err')", "message": "'so erroneous'"}
    )
    ok, dlq = split_errors(node.transform(e))
    ok_out = ok.select(
        "event_id",
        F.lit("ok").alias("branch"),
        F.lit(None).cast("string").alias("error_msg"),
    )
    dlq_out = dlq.select(
        "event_id",
        F.lit("dlq").alias("branch"),
        F.col("_error.message").alias("error_msg"),
    )
    return ok_out.unionAll(dlq_out)


Q_E1_SQL = """
    SELECT event_id, 'ok' AS branch, CAST(NULL AS VARCHAR) AS error_msg
    FROM events WHERE NOT starts_with(event_type, 'err')
    UNION ALL
    SELECT event_id, 'dlq' AS branch, 'so erroneous' AS error_msg
    FROM events WHERE starts_with(event_type, 'err')
"""


def q_e2_error_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-E2 EventError JSON normalization (error.go:29-47): plain errors
    render as {"code":"ERR_UNKNOWN","message":...}."""
    e = _events(spark, sf_dir).filter(F.expr("startswith(event_type, 'err')"))
    return e.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("event_json"),
        F.to_json(
            F.struct(
                F.lit(ERR_UNKNOWN).alias("code"),
                F.concat(F.lit("failed on event "), F.col("event_id").cast("string")).alias(
                    "message"
                ),
            )
        ).alias("error_json"),
    )


Q_E2_SQL = """
    SELECT event_id,
           '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
               AS event_json,
           '{"code":"ERR_UNKNOWN","message":"failed on event ' || event_id || '"}'
               AS error_json
    FROM events
    WHERE starts_with(event_type, 'err')
"""


# ---------------------------------------------------------------------------
# §2.4 fanout

def q_x1_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-X1 FanoutNode 1→N (node/node.go:30-33) as explode."""
    from firebolt_spark.operators.core import FanoutNode

    e = _events(spark, sf_dir)
    node = FanoutNode({"expr": "array(value, value * 2)", "alias": "x"})
    return node.transform(e).select("event_id", "x")


Q_X1_SQL = """
    SELECT event_id, u.x
    FROM events, UNNEST([value, value * 2]) AS u(x)
"""


def q_x2_tree_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-X2 replicated tree fan-out (executor.go:183-186): two children
    aggregate the identical parent row-set; both results in one row."""
    parent = _events(spark, sf_dir).filter(F.expr(_FILTER_PREDICATE))
    child_a = parent.agg(F.count(F.lit(1)).alias("cnt"))
    child_b = parent.agg(F.round(F.sum("value"), 2).alias("sum_value"))
    return child_a.crossJoin(child_b)


Q_X2_SQL = """
    WITH parent AS (
        SELECT * FROM events WHERE NOT starts_with(event_type, 'err')
    )
    SELECT (SELECT count(*) FROM parent) AS cnt,
           (SELECT round(sum(value), 2) FROM parent) AS sum_value
"""


# ---------------------------------------------------------------------------
# §2.6 sinks (payload-construction semantics)

def q_k1_produce_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-K1 ProduceRequest mapping (kafkaproducer.go:94-106): per-row
    topic + serialized value; bytes identity with Q-P4's JSON."""
    e = _events(spark, sf_dir)
    value = F.to_json(F.struct("user_id", "event_type"))
    return e.select(
        F.concat(F.lit("topic-"), F.col("event_type")).alias("topic"),
        value.alias("value_str"),
        F.length(F.encode(value, "UTF-8")).alias("value_bytes"),
    )


Q_K1_SQL = """
    SELECT 'topic-' || event_type AS topic,
           '{"user_id":' || user_id || ',"event_type":"' || event_type || '"}'
               AS value_str,
           CAST(length('{"user_id":' || user_id || ',"event_type":"'
               || event_type || '"}') AS INTEGER) AS value_bytes
    FROM events
"""


def q_k2_index_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-K2 IndexRequest envelope (elasticsearch.go:14-19 as built by
    testnodetypes.go:412-430: doc_id = '<n>:<value>', doc = {id, value}),
    flattened for hashing."""
    from firebolt_spark.functions import global_row_number

    e = _events(spark, sf_dir).select("event_type", "event_id")
    numbered = global_row_number(e, ["event_id"], out_col="_rn")
    return numbered.select(
        F.lit("inttest").alias("index"),
        F.lit("").alias("mapping_type"),
        F.concat(F.col("_rn").cast("string"), F.lit(":"), F.col("event_type")).alias(
            "doc_id"
        ),
        F.col("event_type").alias("doc_id_field"),
        F.col("event_type").alias("doc_value"),
    )


Q_K2_SQL = """
    SELECT 'inttest' AS index,
           '' AS mapping_type,
           CAST(row_number() OVER (ORDER BY event_id) AS VARCHAR)
               || ':' || event_type AS doc_id,
           event_type AS doc_id_field,
           event_type AS doc_value
    FROM events
"""


# ---------------------------------------------------------------------------
# custom join operators (engine extensions: as-of + range joins)

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment: each event picks the latest 'rate update'
    (events with event_id % 5 = 0) for its user at or before its time.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from firebolt_spark.operators.joins import asof_join

    e = _events(spark, sf_dir).select(
        "event_id", "user_id", _ts_us().alias("ts_us"), "value"
    )
    left = e.filter(F.col("event_id") % 5 != 0).select(
        "event_id", "user_id", "ts_us"
    )
    right = e.filter(F.col("event_id") % 5 == 0).select(
        "user_id", F.col("ts_us").alias("rts"), F.col("value").alias("rate")
    )
    out = asof_join(
        left, right, on="ts_us", by=["user_id"], right_cols=["rate"],
        right_on="rts",
    )
    return out.select("user_id", "ts_us", "event_id", "rate", "_asof_time")


Q_ASOF_SQL = """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
    l AS (SELECT event_id, user_id, ts_us FROM e WHERE event_id % 5 <> 0),
    r0 AS (SELECT user_id, ts_us AS rts, value AS rate FROM e WHERE event_id % 5 = 0),
    r AS (SELECT user_id, rts, rate FROM (
            SELECT r0.*, row_number() OVER (
                PARTITION BY user_id, rts ORDER BY rate DESC) AS rn FROM r0)
          WHERE rn = 1)
    SELECT l.user_id, l.ts_us, l.event_id, r.rate, r.rts AS _asof_time
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts_us >= r.rts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via the engine's binned range join:
    events (by id) against the derived recovery ranges, partition-keyed.
    Result multiset identical to the naive BETWEEN join."""
    from firebolt_spark.operators.joins import range_join_binned

    points = _events(spark, sf_dir).select(
        "event_id", (F.col("user_id") % 4).cast("int").alias("partition_id")
    )
    intervals = _recovery_requests(spark, sf_dir)
    out = range_join_binned(
        points,
        intervals,
        point_col="event_id",
        from_col="from_offset",
        to_col="to_offset",
        by=["partition_id"],
        bin_width=128,
    )
    return out.select("partition_id", "event_id", "from_offset", "to_offset")


Q_RANGE_JOIN_SQL = f"""
    WITH r AS ({_RECOVERY_REQUESTS_SQL}),
    p AS (SELECT event_id, CAST(user_id % 4 AS INTEGER) AS partition_id FROM events)
    SELECT p.partition_id, p.event_id, r.from_offset, r.to_offset
    FROM p JOIN r
      ON p.partition_id = r.partition_id
     AND p.event_id BETWEEN r.from_offset AND r.to_offset
"""


QUERIES = {
    "q_s2_scan": q_s2_scan,
    "q_s3_lag_cap": q_s3_lag_cap,
    "q_s4_recovery_scan": q_s4_recovery_scan,
    "q_s5_interval_merge": q_s5_interval_merge,
    "q_s6_compaction": q_s6_compaction,
    "q_p2_parse": q_p2_parse,
    "q_p4_json_build": q_p4_json_build,
    "q_p5_conditional": q_p5_conditional,
    "q_p7_docid": q_p7_docid,
    "q_f1_filter": q_f1_filter,
    "q_e1_error_split": q_e1_error_split,
    "q_e2_error_json": q_e2_error_json,
    "q_x1_fanout": q_x1_fanout,
    "q_x2_tree_fanout": q_x2_tree_fanout,
    "q_k1_produce_request": q_k1_produce_request,
    "q_k2_index_request": q_k2_index_request,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
}

ORACLE = {
    "q_s2_scan": Q_S2_SQL,
    "q_s3_lag_cap": Q_S3_SQL,
    "q_s4_recovery_scan": Q_S4_SQL,
    "q_s5_interval_merge": Q_S5_SQL,
    "q_s6_compaction": Q_S6_SQL,
    "q_p2_parse": Q_P2_SQL,
    "q_p4_json_build": Q_P4_SQL,
    "q_p5_conditional": Q_P5_SQL,
    "q_p7_docid": Q_P7_SQL,
    "q_f1_filter": Q_F1_SQL,
    "q_e1_error_split": Q_E1_SQL,
    "q_e2_error_json": Q_E2_SQL,
    "q_x1_fanout": Q_X1_SQL,
    "q_x2_tree_fanout": Q_X2_SQL,
    "q_k1_produce_request": Q_K1_SQL,
    "q_k2_index_request": Q_K2_SQL,
    "q_asof_join": Q_ASOF_SQL,
    "q_range_join": Q_RANGE_JOIN_SQL,
}
