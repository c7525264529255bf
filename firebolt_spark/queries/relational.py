"""Relational capability suite (SURVEY §2.10 / M3).

The reference deliberately has no joins/aggregations/windows/sorts/set
operations (reference README.md:47-49); in the rebuild they come from
Spark SQL built-ins. This suite pins those capabilities with TPC-H-style
queries over the driver fixtures so the "same capabilities, plus
Spark's" claim stays oracle-tested (FIXTURES.md §3).

Determinism across engines:
- money aggregates go through DECIMAL(18,2) so the sum is exact and
  identical regardless of partial-aggregation order, then cast to DOUBLE
  (same IEEE bits both engines);
- top-k queries always carry a unique tiebreak key;
- CUBE null markers are coalesced to 'ALL' (source columns are non-null).

Scale notes (the 100 TB story):
- only CONSTANT-size sides carry an explicit ``broadcast()`` hint:
  nation (25 rows), region (5 rows) and one-row scalar aggregates.
  Linear-in-SF dimensions (customer/supplier/part) are unhinted — at
  sf100 customer is ~3 GB, close enough to Spark's 8 GB broadcast hard
  cap that a forced hint is fragile; AQE still picks a broadcast join
  at runtime whenever the actual size is under the threshold (r9
  VERDICT Next #5, pinned by
  tests/test_scale_plans.py::test_tpch_linear_dims_unhinted_but_aqe_broadcasts);
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  AQE handles skew;
- top-k is ``ORDER BY ... LIMIT k`` which Spark executes as per-partition
  TakeOrdered (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from firebolt_spark.catalog import load_table


def _dec(col, prec: int = 18, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def q_tpch1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filtered aggregation on lineitem."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 4, 2)
    tax = _dec("l_tax", 4, 2)
    out = (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("_sum_qty"),
            F.sum(price).alias("_sum_base"),
            F.sum(price * (F.lit(1).cast("decimal(3,2)") - disc)).alias("_sum_disc"),
            F.sum(
                price
                * (F.lit(1).cast("decimal(3,2)") - disc)
                * (F.lit(1).cast("decimal(3,2)") + tax)
            ).alias("_sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("_sum_qty", 2).alias("sum_qty"),
            # reduce to scale 2 (money) BEFORE the double cast: at sf1+
            # the scale-6 charge sum's unscaled value exceeds 2^53, and
            # engines then disagree in the last ulp of decimal->double
            # (DuckDB rounds the integer numerator before dividing;
            # Spark converts the exact decimal). At scale 2 the unscaled
            # value fits a double exactly, so every engine converts
            # identically (found by the sf1 scale step, round 6).
            F.col("_sum_base").cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.col("_sum_disc").cast("decimal(38,2)").cast("double").alias("sum_disc_price"),
            F.col("_sum_charge").cast("decimal(38,2)").cast("double").alias("sum_charge"),
            F.round(F.col("_sum_qty") / F.col("count_order"), 2).alias("avg_qty"),
            F.round(
                F.col("_sum_base").cast("double") / F.col("count_order"), 2
            ).alias("avg_price"),
            "count_order",
        )
    )
    return out


Q_TPCH1_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           -- round() THEN downscale-cast: DuckDB's decimal downscale
           -- cast truncates where Spark's rounds half-up; round() makes
           -- the scale-2 value explicit, the cast makes its unscaled
           -- form fit 2^53 so the DOUBLE conversion is exact
           CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
               AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
               AS DECIMAL(38,2)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2)
               AS DECIMAL(38,2)) AS DOUBLE) AS sum_charge,
           round(sum(l_quantity) / count(*), 2) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*), 2) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def q_tpch3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + group + top-10. The customer dim is
    unhinted (AQE broadcasts it while it fits); orders⋈lineitem
    shuffles on the orderkey once."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("_rev"))
        .select(
            "o_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.unix_micros("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


Q_TPCH3_SQL = """
    SELECT o_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue,
           epoch_us(o_orderdate) AS o_orderdate_us,
           o_orderpriority
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
"""


def q_tpch5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, constant dims hint-broadcast,
    linear dims AQE-planned, group by nation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") != "__none__")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )


Q_TPCH5_SQL = """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


def q_join_left_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: per-customer order count (0 for orderless)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


Q_JOIN_LEFT_SQL = """
    SELECT c_custkey, c_name, count(o_orderkey) AS order_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one 'F' order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


Q_JOIN_SEMI_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no high-value order."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


Q_JOIN_ANTI_SQL = """
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
"""


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 orders per customer by totalprice."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


Q_WINDOW_RANK_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               rank() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    )
    WHERE rn <= 3
"""


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with unique tiebreak — executes as TakeOrdered, not a
    full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


Q_TOPK_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
"""


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over projected key sets, discriminated."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("k")
    )
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    a = building.intersect(f_orders).select(F.lit("b_and_f").alias("src"), "k")
    b = building.exceptAll(f_orders.distinct()).distinct().select(
        F.lit("b_not_f").alias("src"), "k"
    )
    c = building.union(machinery).distinct().select(
        F.lit("b_or_m").alias("src"), "k"
    )
    return a.unionAll(b).unionAll(c)


Q_SETOPS_SQL = """
    SELECT 'b_and_f' AS src, k FROM (
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 'b_not_f', k FROM (
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 'b_or_m', k FROM (
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
"""


def q_agg_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every grouping-shape capability in ONE multi-arm union (round-14
    registry consolidation — VERDICT r13 Next #2 option (a); formerly
    the four queries q_agg_cube / q_agg_rollup / q_agg_grouping_sets /
    q_agg_distinct, all green since r10): a 'cube' arm (CUBE over
    orders status x priority), a 'rollup' arm (region -> nation
    customer-account hierarchy over broadcast dims), a 'gsets' arm
    (explicit GROUPING SETS incl. the grand total), and an 'ndv' arm
    (COUNT(DISTINCT) per group: n = distinct customers, total =
    distinct priorities). Conformed schema (shape, k1, k2, n, total);
    every arm stays individually hash-pinned because the shape tag
    keys its rows. Scale shape: four independent partial-agg shuffles,
    each keyed on low-cardinality group columns — no new hazard at
    100 TB vs the four separate queries."""
    orders = load_table(spark, sf_dir, "orders")
    cube = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .select(
            F.lit("cube").alias("shape"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("k1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("k2"),
            "n",
            "total",
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    rollup = (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total"),
        )
        .select(
            F.lit("rollup").alias("shape"),
            F.coalesce("r_name", F.lit("ALL")).alias("k1"),
            F.coalesce("n_name", F.lit("ALL")).alias("k2"),
            "n",
            "total",
        )
    )
    orders.createOrReplaceTempView("_gs_orders")
    gsets = spark.sql("""
        SELECT 'gsets' AS shape,
               coalesce(o_orderstatus, 'ALL') AS k1,
               coalesce(o_orderpriority, 'ALL') AS k2,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
    """)
    ndv = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n"),
        F.countDistinct("o_orderpriority").cast("double").alias("total"),
    ).select(
        F.lit("ndv").alias("shape"),
        F.col("o_orderstatus").alias("k1"),
        F.lit("ALL").alias("k2"),
        "n",
        "total",
    )
    return cube.unionByName(rollup).unionByName(gsets).unionByName(ndv)


Q_AGG_SHAPES_SQL = """
    SELECT 'cube' AS shape,
           coalesce(o_orderstatus, 'ALL') AS k1,
           coalesce(o_orderpriority, 'ALL') AS k2,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'rollup' AS shape,
           coalesce(r_name, 'ALL') AS k1,
           coalesce(n_name, 'ALL') AS k2,
           count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'gsets' AS shape,
           coalesce(o_orderstatus, 'ALL') AS k1,
           coalesce(o_orderpriority, 'ALL') AS k2,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    UNION ALL
    SELECT 'ndv' AS shape,
           o_orderstatus AS k1,
           'ALL' AS k2,
           count(DISTINCT o_custkey) AS n,
           CAST(count(DISTINCT o_orderpriority) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus
"""


def q_function_parade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math AND regexp function parity over part in one
    wide projection (round-14 registry consolidation; formerly
    q_scalar_functions + q_regexp_functions — same table, same key,
    so the merge is a natural single map-only scan). Every function's
    column stays individually hash-pinned."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.floor(F.col("p_retailprice") / 10).cast("bigint").alias("price_bucket"),
        F.round(F.col("p_retailprice") * 0.5, 2).alias("half_price"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^(small|large) ").alias("is_sized"),
    )


Q_FUNCTION_PARADE_SQL = """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           p_brand || '#' || p_type AS brand_type,
           abs(p_size - 25) AS size_dist,
           p_size % 7 AS size_mod,
           CAST(floor(p_retailprice / 10) AS BIGINT) AS price_bucket,
           round(p_retailprice * 0.5, 2) AS half_price,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^(small|large) ') AS is_sized
    FROM part
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function parity over orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.unix_micros(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start_us"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
    )


Q_DATE_SQL = """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS INTEGER) AS days_since_epoch_start
    FROM orders
"""


def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold: orders above the mean price
    (mean computed decimal-exact then in double — identical bits)."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > F.col("s") / F.col("n"))
        .select("o_orderkey", "o_totalprice")
    )


Q_SUBQUERY_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM orders)
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING over a join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 600)
    )


Q_HAVING_SQL = """
    SELECT c_nationkey, count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    HAVING count(*) > 600
"""


def q_tpch6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filtered aggregate — every predicate is
    parquet-pushable, the scan reads 3 columns, and the aggregation is
    a single map-side-combinable sum."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q_TPCH6_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows (1 h) over the events stream — the
    capability the reference explicitly lacks (SURVEY §2.7 T8); in
    streaming mode the same expression runs under a watermark."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


Q_WINDOW_TUMBLING_SQL = """
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user — native session_window in
    Spark; the oracle reproduces the identical islands with a lag-gap
    construction."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


Q_SESSION_WINDOW_SQL = """
    WITH t AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '30 minutes'
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ),
    g AS (
        SELECT user_id, ts,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM t
    )
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           count(*) AS n_events
    FROM g
    GROUP BY user_id, sess
"""


def q_tpch4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + grouped count — priority of
    orders having at least one lineitem shipped after the order date."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


Q_TPCH4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
"""


def q_tpch7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation × customer-nation shipping
    volume by year (cross-nation pairs only)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    vol = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey != supp.s_nationkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("supp_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cust_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("volume"))
    )


Q_TPCH7_SQL = """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE c_nationkey <> s_nationkey
      AND n1.n_name < n2.n_name
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q_tpch14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue
    share); the ratio divides two decimal-exact sums in double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    # scale-2 reduction before the double casts (round-7 decimal audit):
    # total_rev is a declared output and its scale-4 unscaled form is
    # 2.2e15 at sf10 — within 4× of 2^53, over it by sf40 (the q_tpch1
    # sf1 bug class). Reduce to cents first; the ratio then divides two
    # exactly-representable doubles identically in both engines.
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(3,2)")))
        .alias("_promo"),
        F.sum(rev).alias("_tot"),
    ).select(
        F.col("_promo").cast("decimal(38,2)").cast("double").alias("promo_rev"),
        F.col("_tot").cast("decimal(38,2)").cast("double").alias("total_rev"),
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 4).alias(
            "promo_pct"
        ),
    )


Q_TPCH14_SQL = """
    WITH j AS (
        SELECT p_type,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
    ),
    s AS (
        SELECT CAST(CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN rev
                       ELSE CAST(0 AS DECIMAL(3,2)) END), 2) AS DECIMAL(38,2))
                   AS DOUBLE) AS promo_rev,
               CAST(CAST(round(sum(rev), 2) AS DECIMAL(38,2)) AS DOUBLE)
                   AS total_rev
        FROM j
    )
    SELECT promo_rev, total_rev,
           round(100.0 * promo_rev / total_rev, 4) AS promo_pct
    FROM s
"""


def q_tpch18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: groupBy-HAVING subquery feeding a join — orders
    whose total quantity exceeds a threshold, with customer."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


Q_TPCH18_SQL = """
    SELECT c_name, o_orderkey, o_totalprice, round(total_qty, 2) AS total_qty
    FROM orders
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 200) big
      ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
"""


def q_tpch19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicate over a
    part join — the OR-of-ANDs pattern optimizers must not mangle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 50)))
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)
    )
    # scale-2 reduction before the double cast (round-7 decimal audit):
    # the UNFILTERED scale-4 revenue sum's unscaled value hits 3.0e16 at
    # sf10 — past 2^53 — where DuckDB rounds the numerator before
    # dividing by 10^4 but Spark converts the exact decimal (the q_tpch1
    # sf1 bug class). At scale 2 the unscaled form fits a double exactly.
    return (
        joined.filter(bracket)
        .agg(
            F.sum(rev).alias("_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.col("_rev").cast("decimal(38,2)").cast("double").alias("revenue"),
            "n_items",
        )
    )


Q_TPCH19_SQL = """
    SELECT CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
               AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function parity over embeddings + grouped collect:
    size/slice/contains/sort and a deterministic (sorted) collect_list."""
    emb = load_table(spark, sf_dir, "embeddings")
    # scaled-int view of the vector: exact cross-engine (no float repr,
    # no negative-zero canonicalization hazards)
    arr = F.expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS INT))"
    )
    # Array-valued results are emitted as comma-joined strings: the driver
    # harness canonicalizes via pandas.sort_values, which cannot hash lists
    # (CORRECTNESS_r01 ERR) — a deterministic string is harness-safe on both
    # engines and loses no information for the value-hash comparison.
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.concat_ws(",", F.slice(arr, 1, 3).cast("array<string>")).alias("head3"),
        F.expr(
            "aggregate(transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS INT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("sum_milli"),
        F.array_max(arr).alias("max_el"),
        F.array_min(arr).alias("min_el"),
        F.expr(
            "size(filter(transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS INT)), x -> x > 0))"
        ).alias("n_positive"),
        F.concat_ws(",", F.sort_array(F.slice(arr, 1, 5)).cast("array<string>")).alias(
            "head5_sorted"
        ),
    )


Q_ARRAY_SQL = """
    WITH a AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS INTEGER)) AS q
        FROM embeddings
    )
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           array_to_string(q[1:3], ',') AS head3,
           CAST(list_sum(q) AS BIGINT) AS sum_milli,
           list_max(q) AS max_el,
           list_min(q) AS min_el,
           CAST(len(list_filter(q, x -> x > 0)) AS INTEGER) AS n_positive,
           array_to_string(list_sort(q[1:5]), ',') AS head5_sorted
    FROM a
"""


def q_grouped_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped collection: per-customer sorted order-key
    list (sort_array(collect_list) — shuffle-order independent)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 50
    )
    # comma-joined string output: see q_array_functions (harness-safe arrays)
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_list("o_orderkey")).cast("array<string>")
        ).alias("orderkeys"),
        F.count(F.lit(1)).alias("n"),
    )


Q_GROUPED_COLLECT_SQL = """
    SELECT o_custkey,
           array_to_string(list_sort(array_agg(o_orderkey)), ',') AS orderkeys,
           count(*) AS n
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_custkey
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median/p90) per order status —
    both engines use linear interpolation on the sorted values."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


Q_PERCENTILES_SQL = """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status (wide form)."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c.lower()}") for c in ("F", "O", "P")],
    )


Q_PIVOT_SQL = """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders
    GROUP BY o_orderpriority
"""


# ---- round-2 TPC-H widening (adapted to the fixture's trimmed schema:
# no partsupp/commitdate/receiptdate; constants chosen from the fixture
# domains so every query returns non-trivial rows) ----------------------

def q_window_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset AND frame window functions in one pass over one window
    spec (round-14 registry consolidation; formerly q_window_leadlag +
    q_window_running_total — same table, same partition key, same
    ordering, so Catalyst computes lag/lead/delta and the
    unbounded-preceding running decimal sum inside a single Window
    node with ONE shuffle on o_custkey). Every function's column stays
    individually hash-pinned."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    nxt = F.lead("o_totalprice").over(w)
    running = (
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        nxt.alias("next_price"),
        F.round(F.col("o_totalprice") - F.coalesce(prev, F.lit(0.0)), 2).alias(
            "delta_prev"
        ),
        running.alias("running_total"),
    )


Q_WINDOW_MULTI_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, 0.0), 2)
               AS delta_prev,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_tpch8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 6-way join, per-year national market share.
    Every dimension side (part, customer+nation+region, supplier+nation)
    rides a broadcast join (hinted only for the constant-size
    nation/region sides); the only shuffle join is orders⋈lineitem."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust_nation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    vol = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("_vol"),
            F.col("supp_nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("_vol")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).alias("_nat"),
            F.sum("_vol").alias("_tot"),
        )
        .select(
            "o_year",
            # scale-2 reduction before the double division (round-7
            # decimal audit): the per-year scale-4 denominator's
            # unscaled form is 4.6e15 at sf10 — a factor 2 under 2^53,
            # over it by sf20 (the q_tpch1 sf1 bug class). Cents-exact
            # doubles divide identically in both engines.
            F.round(
                F.col("_nat").cast("decimal(38,2)").cast("double")
                / F.col("_tot").cast("decimal(38,2)").cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


Q_TPCH8_SQL = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(CAST(CAST(round(sum(CASE WHEN n_s.n_name = 'NATION_5'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DECIMAL(38,2)) AS DOUBLE)
               / CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE),
               6) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n_c ON c_nationkey = n_c.n_nationkey
    JOIN region ON n_c.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n_s ON s_nationkey = n_s.n_nationkey
    GROUP BY year(o_orderdate)
"""


def q_tpch9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so cost = half the part's
    retail price per unit): per-nation per-year profit over PROMO parts.
    Profit is computed exactly in DECIMAL as (2*revenue - cost) — both
    scale 4, so the subtraction is exact — then cast to double once and
    halved (a power of two, exact). No final round(): rounding a
    combined double hits half-cent ties where engines' round() rules
    differ."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    )
    cost = F.sum(_dec("p_retailprice") * _dec("l_quantity", 12, 2))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(rev.alias("_rev"), cost.alias("_cost"))
        .select(
            "nation",
            "o_year",
            (
                (
                    F.lit(2).cast("decimal(2,0)") * F.col("_rev")
                    - F.col("_cost")
                ).cast("double")
                / 2.0
            ).alias("profit"),
        )
    )


Q_TPCH9_SQL = """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(2 * sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
               - sum(CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / 2.0
               AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY n_name, year(o_orderdate)
"""


def q_tpch10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. Nation hint-broadcast, customer AQE-planned; one
    orders⋈lineitem shuffle;
    top-k via TakeOrdered with the unique c_custkey tiebreak."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("_rev"))
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q_TPCH10_SQL = """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue,
           c_acctbal, n_name
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


def q_tpch13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT join
    (customers with zero orders kept) then a second aggregation over the
    first's result. Both aggregations key on slim columns."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q_TPCH13_SQL = """
    WITH per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
          ON c_custkey = o.o_custkey
        GROUP BY c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


def q_tpch15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar-max equality (exact on
    DECIMAL — no double drift), returning every argmax supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
            ).alias("_rev")
        )
    )
    max_rev = rev.agg(F.max("_rev").alias("_max"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev["_rev"] == max_rev["_max"])
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q_TPCH15_SQL = """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                   AS r
        FROM lineitem GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE r = (SELECT max(r) FROM rev)
    ORDER BY s_suppkey
"""


def q_tpch17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average — lineitem rows
    below 20% of their part's mean quantity. The threshold is built
    from an exact DECIMAL sum / count (identical across engines and
    partition orders); the per-part aggregate joins back unhinted
    (AQE broadcasts the filtered part subset while it fits)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    li_part = li.join(part, li.l_partkey == part.p_partkey)
    avg_qty = li_part.groupBy(F.col("p_partkey").alias("_pk")).agg(
        (
            F.sum(_dec("l_quantity", 12, 2)).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    return (
        li_part.join(avg_qty, F.col("p_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


Q_TPCH17_SQL = """
    WITH lp AS (
        SELECT l.* FROM lineitem l
        JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'),
    a AS (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                   AS avg_q
        FROM lp GROUP BY l_partkey)
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0, 2) AS avg_yearly
    FROM lp JOIN a ON l_partkey = pk
    WHERE l_quantity < 0.2 * avg_q
"""


def q_tpch22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (average positive
    balance, DECIMAL-exact) + anti join (customers with no URGENT
    orders — every fixture customer has *some* order, so plain Q22's
    "no orders" would be vacuously empty), aggregated per nation. The
    scalar is a one-row broadcast cross join — no driver-side collect."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


Q_TPCH22_SQL = """
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
"""


# ---- round 4: the six remaining TPC-H shapes ------------------------------
# The fixtures have no partsupp table and no l_shipmode/l_commitdate
# columns, so Q2/11/16/20 substitute lineitem as the part↔supplier
# bridge and Q12/21 define lateness as l_shipdate > o_orderdate + 60
# days — adaptations in the same spirit as q_tpch9 (documented per
# query). All 22 TPC-H query shapes are now covered.


def q_tpch2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: offer price = the supplier's minimum
    l_extendedprice for the part, since there is no partsupp): for
    size-25 parts, the ASIA supplier(s) achieving the part's minimum
    offer. Correlated-min semantics via a window over the offers table
    (the oracle states it as the classic correlated subquery); DECIMAL
    equality, so argmin ties are exact and the full argmin set is
    emitted deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "n_name")
        .agg(F.min(_dec("l_extendedprice")).alias("_offer"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("_best", F.min("_offer").over(w))
        .filter(F.col("_offer") == F.col("_best"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("_offer").cast("double").alias("min_price"),
        )
    )


Q_TPCH2_SQL = """
    WITH offers AS (
        SELECT p_partkey, s_suppkey, s_name, n_name,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_size = 25
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY 1, 2, 3, 4)
    SELECT p_partkey, s_suppkey, s_name, n_name,
           CAST(offer AS DOUBLE) AS min_price
    FROM offers o1
    WHERE offer = (SELECT min(offer) FROM offers o2
                   WHERE o2.p_partkey = o1.p_partkey)
"""


def q_tpch11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: part value = lineitem revenue from
    focus-nation suppliers, since there is no partsupp availqty/cost):
    parts whose value exceeds 2× the average part value — the
    HAVING-against-global-scalar shape. The threshold comparison stays
    in exact integer/DECIMAL arithmetic (value * n_parts > 2 * total)
    so no engine disagrees at the boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 5
    )
    vals = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("_value"))
    )
    totals = vals.agg(
        F.sum("_value").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    return (
        vals.crossJoin(F.broadcast(totals))
        .filter(F.col("_value") * F.col("_n") > F.col("_total") * 2)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_value").cast("double").alias("part_value"),
        )
    )


Q_TPCH11_SQL = """
    WITH vals AS (
        SELECT l_partkey AS p_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey < 5
        GROUP BY 1)
    SELECT p_partkey, CAST(value AS DOUBLE) AS part_value
    FROM vals
    WHERE value * (SELECT count(*) FROM vals)
          > (SELECT sum(value) FROM vals) * 2
"""


def q_tpch12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode/l_commitdate — grouped
    by l_returnflag, late = shipped over 60 days after the order):
    high- vs low-priority line counts among late 1996-97 shipments."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q_TPCH12_SQL = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
"""


def q_tpch16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: part↔supplier pairs come from
    lineitem; the 'complaints' exclusion = suppliers whose return rate
    exceeds 1/3, an exact integer predicate): distinct supplier count
    per (p_brand, p_size) for non-PROMO parts, suppliers NOT IN the
    complaint set."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") != "PROMO"
    )
    complaints = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_r"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_r") * 3 > F.col("_n"))
        .select("l_suppkey")
    )
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(complaints, "l_suppkey", "left_anti")
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q_TPCH16_SQL = """
    WITH complaints AS (
        SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
        HAVING sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 3
               > count(*)),
    pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
              WHERE l_suppkey NOT IN (SELECT l_suppkey FROM complaints))
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM pairs JOIN part ON l_partkey = p_partkey AND p_type <> 'PROMO'
    GROUP BY p_brand, p_size
"""


def q_tpch20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: the availqty-vs-half-shipped test
    becomes 'shipped above the per-supplier average', exact in integer
    arithmetic): suppliers qualifying via the nested IN chain — widget
    parts → their 1997 shipments → heavy suppliers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget")
    )
    supp = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.join(part.select("p_partkey"),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    totals = shipped.agg(
        F.sum("_qty").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    heavy = (
        shipped.crossJoin(F.broadcast(totals))
        .filter(F.col("_qty") * F.col("_n") > F.col("_total"))
        .select("l_suppkey")
    )
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


Q_TPCH20_SQL = """
    WITH shipped AS (
        SELECT l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE year(l_shipdate) = 1997
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%widget')
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped
        WHERE qty * (SELECT count(*) FROM shipped)
              > (SELECT sum(qty) FROM shipped))
"""


def q_tpch21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted lateness: shipped over 60 days after
    the order date): for finished orders with ≥2 distinct suppliers
    where EXACTLY ONE was late, count per late supplier — the classic
    EXISTS / NOT-EXISTS pair, rewritten as per-order distinct counts
    (the oracle keeps the textbook EXISTS form; both are provably the
    same set). Top 25 by (numwait DESC, s_name, s_suppkey): s_name
    alone is NOT a unique tiebreak once fixtures carry duplicate
    supplier names (the sf1 shard fixture does — found in round 6), so
    the key column closes the ordering."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")).alias(
            "_late"
        ),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_ns"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_nl"),
    )
    lone_late = (
        j.filter(F.col("_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter((F.col("_ns") >= 2) & (F.col("_nl") == 1)),
            "l_orderkey",
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        lone_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name", "s_suppkey")
        .limit(25)
    )


Q_TPCH21_SQL = """
    WITH f AS (
        SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F')
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM f l1
          WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
            AND EXISTS (SELECT 1 FROM f l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM f l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_shipdate > l3.o_orderdate
                                                  + INTERVAL 60 DAY))
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_name, s_suppkey
    LIMIT 25
"""


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join (VERDICT r4 #4 / r5 #7): ~30% of events are
    remapped onto ONE hot user id, then joined to the customer dim
    through ``functions.salted_join`` — the hot key is spread over 16
    salt sub-keys so no single reducer owns 30% of the shuffle. The
    oracle runs the UNSALTED join: what this row checks is that salting
    is semantics-preserving (identical groups, counts, and exact
    decimal sums). The wall-clock skew win is measured separately as
    the bench ``skew_demo`` artifact (PERF.md round 6)."""
    from firebolt_spark.functions import salted_join

    ev = load_table(spark, sf_dir, "events")
    skewed = ev.select(
        F.when((F.col("user_id") % 10) < 3, F.lit(0).cast("bigint"))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "value",
    )
    users = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 1500)
        .select(F.col("c_custkey").alias("uid"), "c_mktsegment")
    )
    return (
        salted_join(skewed, users, "uid", salt_buckets=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


Q_SKEW_SALTED_SQL = """
    WITH s AS (SELECT CASE WHEN user_id % 10 < 3 THEN 0 ELSE user_id END AS uid,
                      value
               FROM events),
    u AS (SELECT c_custkey AS uid, c_mktsegment FROM customer
          WHERE c_custkey < 1500)
    SELECT c_mktsegment,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM s JOIN u USING (uid)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


QUERIES = {
    "q_tpch1_pricing_summary": q_tpch1_pricing_summary,
    "q_agg_shapes": q_agg_shapes,
    "q_window_multi": q_window_multi,
    "q_function_parade": q_function_parade,
    "q_skew_salted_join": q_skew_salted_join,
    "q_tpch2_min_cost_supplier": q_tpch2_min_cost_supplier,
    "q_tpch8_market_share": q_tpch8_market_share,
    "q_tpch9_product_profit": q_tpch9_product_profit,
    "q_tpch10_returned_items": q_tpch10_returned_items,
    "q_tpch11_important_parts": q_tpch11_important_parts,
    "q_tpch12_late_priority": q_tpch12_late_priority,
    "q_tpch16_supplier_variety": q_tpch16_supplier_variety,
    "q_tpch20_promo_suppliers": q_tpch20_promo_suppliers,
    "q_tpch21_waiting_suppliers": q_tpch21_waiting_suppliers,
    "q_tpch13_order_distribution": q_tpch13_order_distribution,
    "q_tpch15_top_supplier": q_tpch15_top_supplier,
    "q_tpch17_small_qty_revenue": q_tpch17_small_qty_revenue,
    "q_tpch22_idle_balance": q_tpch22_idle_balance,
    "q_tpch3_shipping_priority": q_tpch3_shipping_priority,
    "q_tpch5_local_supplier": q_tpch5_local_supplier,
    "q_join_left_counts": q_join_left_counts,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_window_rank": q_window_rank,
    "q_topk_orders": q_topk_orders,
    "q_setops": q_setops,
    "q_date_functions": q_date_functions,
    "q_subquery_above_avg": q_subquery_above_avg,
    "q_having": q_having,
    "q_window_tumbling": q_window_tumbling,
    "q_session_window": q_session_window,
    "q_tpch6_revenue_forecast": q_tpch6_revenue_forecast,
    "q_pivot": q_pivot,
    "q_tpch4_order_priority": q_tpch4_order_priority,
    "q_tpch7_nation_volume": q_tpch7_nation_volume,
    "q_tpch14_promo_share": q_tpch14_promo_share,
    "q_tpch18_large_orders": q_tpch18_large_orders,
    "q_tpch19_bracket_revenue": q_tpch19_bracket_revenue,
    "q_percentiles": q_percentiles,
    "q_array_functions": q_array_functions,
    "q_grouped_collect": q_grouped_collect,
}

ORACLE = {
    "q_tpch8_market_share": Q_TPCH8_SQL,
    "q_tpch9_product_profit": Q_TPCH9_SQL,
    "q_tpch10_returned_items": Q_TPCH10_SQL,
    "q_tpch2_min_cost_supplier": Q_TPCH2_SQL,
    "q_tpch11_important_parts": Q_TPCH11_SQL,
    "q_tpch12_late_priority": Q_TPCH12_SQL,
    "q_tpch16_supplier_variety": Q_TPCH16_SQL,
    "q_tpch20_promo_suppliers": Q_TPCH20_SQL,
    "q_tpch21_waiting_suppliers": Q_TPCH21_SQL,
    "q_tpch13_order_distribution": Q_TPCH13_SQL,
    "q_tpch15_top_supplier": Q_TPCH15_SQL,
    "q_tpch17_small_qty_revenue": Q_TPCH17_SQL,
    "q_tpch22_idle_balance": Q_TPCH22_SQL,
    "q_percentiles": Q_PERCENTILES_SQL,
    "q_array_functions": Q_ARRAY_SQL,
    "q_grouped_collect": Q_GROUPED_COLLECT_SQL,
    "q_tpch4_order_priority": Q_TPCH4_SQL,
    "q_tpch7_nation_volume": Q_TPCH7_SQL,
    "q_tpch14_promo_share": Q_TPCH14_SQL,
    "q_tpch18_large_orders": Q_TPCH18_SQL,
    "q_tpch19_bracket_revenue": Q_TPCH19_SQL,
    "q_window_tumbling": Q_WINDOW_TUMBLING_SQL,
    "q_session_window": Q_SESSION_WINDOW_SQL,
    "q_tpch6_revenue_forecast": Q_TPCH6_SQL,
    "q_pivot": Q_PIVOT_SQL,
    "q_tpch1_pricing_summary": Q_TPCH1_SQL,
    "q_agg_shapes": Q_AGG_SHAPES_SQL,
    "q_window_multi": Q_WINDOW_MULTI_SQL,
    "q_function_parade": Q_FUNCTION_PARADE_SQL,
    "q_tpch3_shipping_priority": Q_TPCH3_SQL,
    "q_tpch5_local_supplier": Q_TPCH5_SQL,
    "q_join_left_counts": Q_JOIN_LEFT_SQL,
    "q_join_semi": Q_JOIN_SEMI_SQL,
    "q_join_anti": Q_JOIN_ANTI_SQL,
    "q_window_rank": Q_WINDOW_RANK_SQL,
    "q_topk_orders": Q_TOPK_SQL,
    "q_setops": Q_SETOPS_SQL,
    "q_date_functions": Q_DATE_SQL,
    "q_subquery_above_avg": Q_SUBQUERY_SQL,
    "q_having": Q_HAVING_SQL,
    "q_skew_salted_join": Q_SKEW_SALTED_SQL,
}
