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
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
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
    # Pre-aggregation pushdown: o_orderkey functionally determines
    # c_custkey, so grouping lineitem alone (one map-side-combinable
    # shuffle) and joining the few >150 survivors to orders/customer is
    # semantically identical to the grouped 3-way join — and removes the
    # fact⋈fact shuffle join that dominates at scale.
    c = table(spark, sf, "customer").select("c_custkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey, "left_semi")
        .select(
            F.col("o_custkey").alias("c_custkey"),
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
    # Scalar threshold via broadcast-1-row crossJoin (the q15/q17 idiom):
    # keeps the whole query one lazy plan — no driver round-trip, and the
    # threshold agg runs concurrently with the probe-side scan.
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    return (
        c.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
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


# ---------------------------------------------------------------------------
# The testdata schema has no partsupp table and no commit/receipt dates
# (TESTDATA.md); the remaining TPC-H query *shapes* below are adapted to
# the available columns. The plan shape each query exercises (correlated
# scalar subquery, NOT IN, double aggregation, exists/not-exists pair...)
# is the point — the literal predicates are re-fitted to this star schema.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                            / CAST(l_quantity AS DECIMAL(18,4)), 4) AS DOUBLE)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, su.unit_cost
    FROM part p
    JOIN supply su ON su.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = su.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND su.unit_cost = (
        SELECT min(su2.unit_cost)
        FROM supply su2
        JOIN supplier s2 ON s2.s_suppkey = su2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE su2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    """,
    doc="TPC-H Q2-style min-cost supplier. partsupp stand-in = per "
    "(part, supplier) min unit price observed in lineitem; the "
    "correlated min-subquery becomes a grouped-min self-join.",
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    unit = F.round(
        F.col("l_extendedprice").cast(MONEY) / F.col("l_quantity").cast(MONEY), 4
    ).cast("double")
    supply = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_cost"))
    )
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # Europe-only supply, then min cost per part = groupBy + join back
    # (the DataFrame form of the correlated scalar subquery).
    eu_supply = (
        supply.join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = eu_supply.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eu_supply.join(F.broadcast(p), eu_supply.l_partkey == p.p_partkey)
        .join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           round(
             CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY o_year
    """,
    doc="TPC-H Q8-style national market share: 8-way join, conditional "
    "decimal-sum ratio per order year.",
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    p = table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast(MONEY)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))
                          - CAST(round(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(0.6 AS DECIMAL(18,4)), 4) AS DECIMAL(18,4))
                            * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9-style product profit (supply cost proxied as 60% of "
    "p_retailprice): LIKE-filtered part broadcast, per-nation-year sums.",
)
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf, "nation")
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    cost = F.round(
        F.col("p_retailprice").cast(MONEY) * F.lit(0.6).cast(MONEY), 4
    ).cast(MONEY)
    profit = (
        F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY)
        - cost * F.col("l_quantity").cast(MONEY)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH supply_value AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_key, CAST(round(value_dec, 2) AS DOUBLE) AS total_value
    FROM supply_value
    WHERE value_dec > (SELECT 2.0 * avg(value_dec) FROM supply_value)
    ORDER BY total_value DESC, p_key
    """,
    doc="TPC-H Q11-style important stock: per-part value from one "
    "region's suppliers, above-2x-average threshold via scalar subquery.",
)
def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    value = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("value_dec"))
    )
    # Scalar threshold: tiny one-row aggregate, crossJoin-broadcast back.
    threshold = value.agg((F.lit(2.0) * F.avg("value_dec")).alias("thresh"))
    return (
        value.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_dec") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("p_key"),
            F.round("value_dec", 2).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "p_key")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13-style customer distribution: outer join preserving "
    "order-less customers, then a second aggregation over the counts.",
)
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select("c_custkey")
    o = table(spark, sf, "orders").filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(round(total_dec, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_dec = (SELECT max(total_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15-style top supplier: quarterly revenue view + scalar "
    "max subquery (decimal-exact equality).",
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    rev = (F.col("l_extendedprice").cast(MONEY) * (F.lit(1) - F.col("l_discount")).cast(MONEY))
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_dec")
    )
    max_rev = revenue.agg(F.max("total_dec").alias("max_dec"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_dec", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT IN ('PROMO', 'LARGE')
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16-style supplier-part counts: distinct (part,supplier) "
    "pairs from lineitem, NOT-IN anti-join for flagged suppliers, "
    "count-distinct per brand/type/size.",
)
def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    ps = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").isin("PROMO", "LARGE")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17-style small-quantity revenue: per-part avg-quantity "
    "correlated subquery as groupBy + broadcast join back.",
)
def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    # Compute per-part avg only over parts that survive the filter —
    # same semantics as the correlated subquery, far less work.
    lp = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
    avg_qty = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        lp.join(F.broadcast(avg_qty), lp.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(MONEY)) / 7.0, 2
            ).cast("double").alias("avg_yearly")
        )
    )


@register(
    "q20_part_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_11', 'NATION_21')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 300
      )
    ORDER BY s_name, s_acctbal
    """,
    doc="TPC-H Q20-style part promotion (red parts): HAVING-filtered IN subquery → "
    "left-semi join into a broadcast-dim-filtered supplier scan.",
)
def q20_part_promotion(spark: SparkSession, sf: str) -> DataFrame:
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_11", "NATION_21")
    )
    p = table(spark, sf, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM fl l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND EXISTS (
        SELECT 1 FROM fl l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM fl l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21-style waiting suppliers (last shipper in multi-"
    "supplier finished orders; shipdate stands in for receipt lag): "
    "the EXISTS/NOT-EXISTS pair collapses to two predicates over one "
    "window partitioning (max shipdate + distinct-supplier count per "
    "order) — one shuffle instead of three self-join exchanges.",
)
def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    # The EXISTS/NOT-EXISTS pair is equivalent to two predicates over ONE
    # window partitioning by order: "another supplier exists" ⇔ the order
    # has ≥2 distinct suppliers; "no later shipment exists" ⇔ this row's
    # shipdate equals the order's max. One shuffle of the filtered fact
    # instead of three self-join exchanges — the formulation that wins at
    # scale (the semi/anti self-joins each reshuffle lineitem).
    from pyspark.sql import Window

    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    fl = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_4")
    w = Window.partitionBy("l_orderkey")
    waiting = (
        fl.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2))
    )
    return (
        waiting.join(
            F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")),
            waiting.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
