"""Custom join operators: as-of semantics (inclusive boundary,
tolerance, no-match nulls, duplicate right timestamps) and binned range
join equivalence with the naive inequality join."""

from __future__ import annotations

from pyspark.sql import functions as F

from firebolt_spark.operators.joins import asof_join, range_join_binned


def _l(spark):
    return spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 50, 4)],
        "k STRING, t BIGINT, id INT",
    )


def _r(spark):
    return spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 100, 9.0)],
        "k STRING, rt BIGINT, rate DOUBLE",
    )


def test_asof_basic_and_inclusive_boundary(spark):
    out = {
        r["id"]: (r["rate"], r["_asof_time"])
        for r in asof_join(
            _l(spark), _r(spark), on="t", by=["k"], right_cols=["rate"], right_on="rt"
        ).collect()
    }
    assert out[1] == (1.0, 10)    # t=10 matches rt=10 (inclusive)
    assert out[2] == (2.0, 15)    # latest ≤ 20
    assert out[3] == (None, None)  # nothing at or before t=5
    assert out[4] == (None, None)  # b's only update is in the future


def test_asof_tolerance(spark):
    out = {
        r["id"]: r["rate"]
        for r in asof_join(
            _l(spark), _r(spark), on="t", by=["k"], right_cols=["rate"],
            right_on="rt", tolerance=4,
        ).collect()
    }
    assert out[1] == 1.0          # 10-10=0 within tolerance
    assert out[2] is None         # 20-15=5 > 4 → masked


def test_asof_duplicate_right_timestamps_deterministic(spark):
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 10, 7.0)], "k STRING, rt BIGINT, rate DOUBLE"
    )
    out = asof_join(
        _l(spark), right, on="t", by=["k"], right_cols=["rate"], right_on="rt"
    )
    # dedup keeps the max-rate row at the tied timestamp
    assert out.filter("id = 1").first()["rate"] == 7.0


def test_asof_join_node_from_yaml(spark, tmp_path):
    from firebolt_spark import Pipeline

    left_p = str(tmp_path / "l.parquet")
    right_p = str(tmp_path / "r.parquet")
    _l(spark).write.parquet(left_p)
    _r(spark).write.parquet(right_p)
    p = Pipeline.from_yaml(
        f"""
application: asof
source: {{name: parquet, params: {{path: "{left_p}"}}}}
nodes:
  - name: asof_join
    id: enrich
    params:
      right_path: "{right_p}"
      left_on: t
      by: [k]
      right_cols: [rate]
      right_on: rt
"""
    )
    res = p.run_batch(spark)
    out = {r["id"]: r["rate"] for r in res.outputs["enrich"].collect()}
    assert out[2] == 2.0 and out[3] is None


def test_range_join_binned_equals_naive(spark):
    points = spark.createDataFrame(
        [(i, i % 3) for i in range(0, 500, 7)], "p BIGINT, g INT"
    )
    intervals = spark.createDataFrame(
        [(0, 10, 120), (0, 100, 130), (1, 300, 310), (2, 495, 600), (2, 0, 3)],
        "g INT, lo BIGINT, hi BIGINT",
    )
    naive = (
        points.join(intervals, "g")
        .filter(F.col("p").between(F.col("lo"), F.col("hi")))
        .select("g", "p", "lo", "hi")
    )
    for width in (1, 16, 1000):
        binned = range_join_binned(
            points, intervals, "p", "lo", "hi", by=["g"], bin_width=width
        ).select("g", "p", "lo", "hi")
        assert sorted(map(tuple, binned.collect())) == sorted(
            map(tuple, naive.collect())
        )
