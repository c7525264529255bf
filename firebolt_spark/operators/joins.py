"""Custom join operators Spark lacks natively — as-of and range joins.

Built as compositions of existing DataFrame ops (SURVEY §7's preference
order: composition > pandas-UDF > mapPartitions), so they inherit
whole-stage codegen and AQE:

- **as-of join**: for each left row, the latest right row with the same
  key and right.ts <= left.ts (within an optional tolerance) — the
  time-series enrichment join (trades⋈quotes, events⋈configs).
  Implemented as a union + last_value(ignorenulls) ordered window: one
  shuffle on (key), no per-row lookups, no data explosion.
- **range join**: points joined to containing intervals. The naive
  inequality join is a nested-loop product; the binned form explodes
  intervals into fixed-width bins and equi-joins points on their bin —
  candidate pairs are only same-bin pairs, then the exact BETWEEN
  filter verifies. Bin width trades replication (intervals spanning
  many bins) against candidate density, like minhash LSH bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str],
    tolerance: int | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row per ``by`` key with
    ``right[right_on] <= left[on]`` (inclusive), optionally within
    ``tolerance`` of the left timestamp. ``on``/``right_on`` must be
    mutually comparable (use epoch numbers or timestamps on both).

    Right rows are deduplicated to one per (key, time) — latest wins —
    so the result is deterministic under duplicate right timestamps.
    Output: all left columns + ``right_cols`` + ``_asof_time`` (the
    matched right time, NULL when nothing matched).
    """
    r_on = right_on or on
    # one right row per (key, time): the winner is max over right_cols'
    # natural struct order — deterministic
    w_dedup = Window.partitionBy(*by, r_on).orderBy(
        *[F.col(c).desc() for c in right_cols]
    )
    r = (
        right.withColumn("_rdup", F.row_number().over(w_dedup))
        .filter(F.col("_rdup") == 1)
        .drop("_rdup")
    )

    left_cols = left.columns
    tagged_l = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_r"),
        *[F.col(c) for c in left_cols if c not in by and c != on],
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(r.schema[r_on].dataType).alias("_r_t"),
    )
    tagged_r = r.select(
        *by,
        F.col(r_on).alias("_t"),
        F.lit(1).alias("_is_r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in by and c != on
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(r_on).alias("_r_t"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # right rows sort BEFORE left rows at equal time (inclusive <=)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
        F.last("_r_t", ignorenulls=True).over(w).alias("_f_t"),
    )
    out = filled.filter(F.col("_is_r") == 0)
    within = (
        F.lit(True)
        if tolerance is None
        else (F.col("_t") - F.col("_f_t")) <= F.lit(tolerance)
    )
    return out.select(
        *by,
        F.col("_t").alias(on),
        *[F.col(c) for c in left_cols if c not in by and c != on],
        *[
            F.when(within, F.col(f"_f_{c}")).alias(c)
            for c in right_cols
        ],
        F.when(within, F.col("_f_t")).alias("_asof_time"),
    )


class AsofJoinNode:
    """YAML node form of asof_join. The pipeline is a single-input tree
    (reference topology), so the right side loads from ``right_path``
    (parquet) at transform time.

    Params: right_path (required); left_on (alias "on" — quote it, YAML
    1.1 reads bare ``on`` as a boolean); by (list); right_cols (list);
    tolerance; right_on.
    """

    def __init__(self, params: dict):
        self.right_path = params["right_path"]
        self.on = params.get("left_on") or params["on"]
        self.by = list(params["by"])
        self.right_cols = list(params["right_cols"])
        self.tolerance = params.get("tolerance")
        self.right_on = params.get("right_on")

    def transform(self, df: DataFrame) -> DataFrame:
        right = df.sparkSession.read.parquet(self.right_path)
        return asof_join(
            df, right, self.on, self.by, self.right_cols,
            tolerance=self.tolerance, right_on=self.right_on,
        )


class RangeJoinNode:
    """YAML node form of range_join_binned; intervals load from
    ``intervals_path`` (parquet).

    Params: intervals_path (required); point_col; from_col; to_col;
    by (list, optional); bin_width (1000).
    """

    def __init__(self, params: dict):
        self.intervals_path = params["intervals_path"]
        self.point_col = params["point_col"]
        self.from_col = params.get("from_col", "from_offset")
        self.to_col = params.get("to_col", "to_offset")
        self.by = params.get("by")
        self.bin_width = int(params.get("bin_width", 1000))

    def transform(self, df: DataFrame) -> DataFrame:
        intervals = df.sparkSession.read.parquet(self.intervals_path)
        return range_join_binned(
            df, intervals, self.point_col, self.from_col, self.to_col,
            by=self.by, bin_width=self.bin_width,
        )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    from_col: str,
    to_col: str,
    by: list[str] | None = None,
    bin_width: int = 1000,
) -> DataFrame:
    """Point-in-interval join (from <= point <= to), sub-quadratic.

    Intervals explode into their covered bins; points equi-join on
    their own bin (+ optional ``by`` keys), then the exact BETWEEN
    verifies. Result identical to the naive inequality join.
    """
    keys = by or []
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(from_col) / bin_width),
                F.floor(F.col(to_col) / bin_width),
            )
        ),
    )
    binned_pt = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width)
    )
    # each (point, interval) pair meets in exactly one bin — the point's
    # own — so no dedup is needed and multiplicity matches the naive join
    joined = binned_pt.join(binned_iv, [*keys, "_bin"]).filter(
        F.col(point_col).between(F.col(from_col), F.col(to_col))
    )
    return joined.drop("_bin")
