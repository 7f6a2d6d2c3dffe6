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
