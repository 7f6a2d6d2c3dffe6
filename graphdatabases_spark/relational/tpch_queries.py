"""TPC-H-style multi-operator queries over the testdata star schema.

These are the headline relational benchmarks (bench.py) and the deepest
Catalyst exercises: multi-way joins with broadcast dims, decimal money
aggregation, and grouped top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.relational.catalog import register, table

MONEY = "decimal(18,4)"


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(18,8)) * CAST(1 + l_tax AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary (map-side-combinable hash agg).",
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qty = F.col("l_quantity").cast(MONEY)
    price = F.col("l_extendedprice").cast(MONEY)
    disc = (F.lit(1) - F.col("l_discount")).cast(MONEY)
    tax = (F.lit(1) + F.col("l_tax")).cast(MONEY)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * disc), 2).cast("double").alias("sum_disc_price"),
            # Three-factor decimal products hit the precision-38 cap with
            # engine-specific rescaling; the explicit DECIMAL(18,8)
            # intermediate keeps the product exact in both engines.
            F.round(
                F.sum((price * disc).cast("decimal(18,8)") * tax), 2
            ).cast("double").alias("sum_charge"),
            F.round(
                F.sum(qty).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: selective dims broadcast into "
    "the fact join, grouped revenue, global top-k.",
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    l = table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    rev = (
        F.col("l_extendedprice").cast(MONEY)
        * (F.lit(1) - F.col("l_discount")).cast(MONEY)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5-style six-way join: region/nation/supplier broadcast, "
    "customer⋈orders⋈lineitem shuffled, same-nation constraint.",
)
def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf, "nation")
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    rev = (
        F.col("l_extendedprice").cast(MONEY)
        * (F.lit(1) - F.col("l_discount")).cast(MONEY)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4-style priority check: EXISTS → left-semi join (late "
    "shipments stand in for commit/receipt lag).",
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style forecast: pure scan-filter-agg; every predicate "
    "must reach the parquet scan.",
)
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(MONEY) * F.col("l_discount").cast(MONEY)),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    WHERE n1.n_name < n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    HAVING sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l_discount AS DECIMAL(18,4))) > 1000000
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7-style cross-nation volume: 6-way join, two broadcast "
    "copies of nation, HAVING on the decimal sum.",
)
def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(rev).alias("rev_dec"))
        .filter(F.col("rev_dec") > 1000000)
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round("rev_dec", 2).cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-style returned-item reporting: fact-fact join + "
    "broadcast dims + global top-20 (TakeOrderedAndProject).",
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf, "nation")
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_by_month",
    oracle="""
    SELECT EXTRACT(month FROM l_shipdate) AS ship_month,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY ship_month
    """,
    doc="TPC-H Q12-style conditional aggregation (CASE inside SUM) per "
    "ship month.",
)
def q12_priority_by_month(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("ship_month")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE),
               6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14-style promo share: ratio of conditional decimal sums "
    "(ECONOMY parts stand in for PROMO types).",
)
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = table(spark, sf, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast(MONEY))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


@register(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18-style large-volume orders: HAVING over a decimal sum, "
    "deterministic top-100.",
)
def q18_large_volume(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select("c_custkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("qty_dec", 2).cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19-style disjunctive predicates across the join: the "
    "brand/size terms must still push to the part scan.",
)
def q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


@register(
    "q22_missed_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS v FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="TPC-H Q22-style missed customers: scalar subquery threshold + "
    "anti-join against orders.",
)
def q22_missed_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").select("o_custkey")
    n = table(spark, sf, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    )
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(MONEY)), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("n_name")
    )
