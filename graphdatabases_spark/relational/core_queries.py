"""Core relational surface: scans, filters, joins, aggs, windows, set ops,
scalar functions (SURVEY §2.2).

Each query is declarative DataFrame API — Catalyst provides predicate
pushdown, column pruning, join selection (broadcast vs sort-merge via
AQE), and whole-stage codegen. Oracles are equivalent ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphdatabases_spark.operators.quantile import quantile_cont_vden
from graphdatabases_spark.relational.catalog import register, table

MONEY = "decimal(18,4)"


def _ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Scans / filters / predicates
# ---------------------------------------------------------------------------

@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 6) AS price
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'R'
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Parquet scan with pushed-down predicate + column pruning.",
)
def scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round("l_extendedprice", 6).alias("price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_range_dates",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate, o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
      AND o_orderstatus = 'F'
    ORDER BY o_orderkey
    """,
    doc="Range predicate on timestamp (partition-prunable at scale).",
)
def filter_range_dates(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .filter(
            F.col("o_orderdate").between("1996-01-01", "1996-03-31")
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey", _ts("o_orderdate").alias("odate"), "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "filter_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey % 10 = 3
    ORDER BY o_orderkey
    """,
    doc="IN-list predicate.",
)
def filter_in_list(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_custkey") % 10 == 3)
        )
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%BRASS%' OR p_name LIKE 'a%e'
    ORDER BY p_partkey
    """,
    doc="LIKE pattern predicates.",
)
def filter_like(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "part")
        .filter(F.col("p_type").like("%BRASS%") | F.col("p_name").like("a%e"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "filter_null_safe",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL
    ORDER BY o_orderkey
    """,
    doc="Null-safe equality (<=> / IS NOT DISTINCT FROM).",
)
def filter_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.filter(F.nullif(F.col("o_orderstatus"), F.lit("O")).eqNullSafe(F.lit(None)))
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    WHERE event_type = 'error'
    ORDER BY event_id
    """,
    doc="JSON property extraction from the events.props JSON string.",
)
def json_extract_events(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n.n_name,
           count(*) AS num_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Star join: fact ⋈ broadcast dims; decimal money sum.",
)
def join_broadcast_dim(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(MONEY)), 2).cast("double").alias("total_price"),
        )
        .orderBy("n_name")
    )


@register(
    "join_sortmerge_fact",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS line_count,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Large fact-fact equi-join (sort-merge/shuffled-hash; AQE decides).",
)
def join_sortmerge_fact(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.round(F.sum(F.col("l_extendedprice").cast(MONEY)), 2).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS order_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
    doc="Left outer join preserving customers without orders.",
)
def join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS customers FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS suppliers FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(cn.customers, 0) AS customers,
           coalesce(sn.suppliers, 0) AS suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    ORDER BY nationkey
    """,
    doc="Full outer join of two aggregates.",
)
def join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    cn = (
        table(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    sn = (
        table(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    return (
        cn.join(sn, cn.nk == sn.nk, "full")
        .select(
            F.coalesce(cn.nk, sn.nk).alias("nationkey"),
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    doc="Left semi join (existence).",
)
def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    big = table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
    doc="Left anti join (absence) — the reference's MERGE dedup-insert shape.",
)
def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_theta_pairs",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    ORDER BY nation_a, nation_b
    """,
    doc="Theta self-join (the AQL nested-FOR shape, databases.py:200).",
)
def join_theta_pairs(spark: SparkSession, sf: str) -> DataFrame:
    n = table(spark, sf, "nation")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b")
        )
        .orderBy("nation_a", "nation_b")
    )


@register(
    "join_range_events",
    oracle="""
    SELECT e.event_id,
           count(c.event_id) AS clicks_nearby
    FROM events e
    LEFT JOIN events c
      ON c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
    doc="Range (interval) join: clicks within ±5 min of each error.",
)
def join_range_events(spark: SparkSession, sf: str) -> DataFrame:
    # Bucketed interval join (operators/interval.py): the bare theta
    # predicate would compile to BroadcastNestedLoopJoin — O(|L|·|R|)
    # with a full-side broadcast; the bucketed form is one hash shuffle.
    from graphdatabases_spark.operators.interval import interval_join

    ev = table(spark, sf, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("ts").alias("e_ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")
    )
    return (
        interval_join(err, clk, "e_ts", "c_ts", 300, how="left")
        .groupBy("event_id")
        .agg(F.count("c_id").alias("clicks_nearby"))
        .orderBy("event_id")
    )


@register(
    "join_asof_events",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, c.ts AS click_ts,
             row_number() OVER (PARTITION BY e.event_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events e
      JOIN events c
        ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
      WHERE e.event_type = 'error'
    )
    SELECT event_id, strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS last_click
    FROM ranked WHERE rn = 1
    ORDER BY event_id
    """,
    doc="As-of join: most recent click by the same user at or before each "
    "error (composed from join + window; SURVEY §4.3.3).",
)
def join_asof_events(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.operators.asof import asof_join

    ev = table(spark, sf, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("c_id")
    )
    joined = asof_join(
        err,
        clk,
        left_on="ts",
        right_on="click_ts",
        by="user_id",
        tie_break="c_id",
    )
    return (
        joined.select("event_id", _ts("click_ts").alias("last_click"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact multi count-distinct (expand + two-phase hash agg).",
)
def agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++) — the 100 TB path for distincts. "
    "The sketch estimate itself is engine-specific, so the externally "
    "hashed columns are the EXACT distinct count plus a within_5pct "
    "boolean (|approx − exact| / exact ≤ 0.05) computed Spark-side; "
    "the oracle emits the exact count and TRUE. A hash match therefore "
    "certifies both the exact-distinct semantics and that the HLL "
    "estimate (rsd 0.02) lands inside its tolerance.",
)
def agg_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.05
            ).alias("within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_collect_set",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="collect_set with deterministic sort_array rendering.",
)
def agg_collect_set(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="ROLLUP hierarchy totals.",
)
def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast(MONEY)), 2).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
    doc="CUBE over two dimensions.",
)
def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
        )
        .orderBy("rf", "ls")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY status, priority
    """,
    doc="GROUPING SETS (via Spark SQL).",
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    table(spark, sf, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority
        """
    )


@register(
    "agg_percentile",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g, 'qty' AS axis,
             CAST(round(l_quantity * 100) AS BIGINT) AS v
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'price',
             CAST(round(l_extendedprice * 100) AS BIGINT)
      FROM lineitem
    ),
    n AS (
      SELECT g, axis, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2
    ),
    r AS MATERIALIZED (
      SELECT g, axis, v,
             row_number() OVER (PARTITION BY g, axis ORDER BY v) AS rn
      FROM v
    ),
    q(axis, num, den) AS (VALUES ('qty', 1, 2), ('price', 9, 10)),
    t AS (
      SELECT n.g, n.axis, q.den,
             ((n.n - 1) * q.num) // q.den + 1 AS lo,
             ((n.n - 1) * q.num) % q.den AS rem
      FROM n JOIN q USING (axis)
    ),
    x AS (
      SELECT t.g, t.axis,
        CAST(t.den * rlo.v
             + t.rem * (coalesce(rhi.v, rlo.v) - rlo.v) AS DOUBLE)
          / (t.den * 100) AS val
      FROM t
      JOIN r rlo ON rlo.g = t.g AND rlo.axis = t.axis AND rlo.rn = t.lo
      LEFT JOIN r rhi ON rhi.g = t.g AND rhi.axis = t.axis
                     AND rhi.rn = t.lo + 1 AND t.rem > 0
    )
    SELECT g AS l_returnflag,
           round(max(CASE WHEN axis = 'qty' THEN val END), 6) AS median_qty,
           round(max(CASE WHEN axis = 'price' THEN val END), 6) AS p90_price
    FROM x GROUP BY g ORDER BY l_returnflag
    """,
    doc="Exact interpolated percentiles (type-7 quantile_cont: median "
    "l_quantity, p90 l_extendedprice per returnflag) WITHOUT "
    "F.percentile — that aggregate buffers a value->count map per "
    "group, unbounded state on the continuous price domain (the "
    "round-9 verdict's scale hazard). Routed through the shared "
    "two-pass histogram-refinement kernel (operators/quantile.py, "
    "extracted from orders_quantile_histogram): values cents-quantized "
    "to BIGINT (round(x*100) — engine-identical on the fixture's exact "
    "2-dp doubles), both axes melted into one keyed pass, and the "
    "interpolated quantile carried as the exact rational vden/den "
    "(den*v_lo + rem*(v_hi-v_lo), all-integer rank arithmetic) until "
    "ONE final double division. The oracle computes the same rationals "
    "by brute row_number sort — different algorithm, identical exact "
    "answer. Bucket width is PER AXIS (the melted width-column "
    "pattern): cents-scaled l_quantity spans only 100..5000, so the "
    "default 64Ki width would collapse the whole qty axis into bucket "
    "0 and pass 2 would sort the entire group — w=16 keeps the qty "
    "bucket list at ~320 entries while price keeps 64Ki. At 100 TB: "
    "one combinable bucket histogram + a window over the bounded "
    "bucket list + an in-bucket sort of only the target buckets, on "
    "BOTH axes.",
)
def agg_percentile(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    melt = li.select(
        F.col("l_returnflag").alias("g"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("qty").alias("axis"),
                    F.round(F.col("l_quantity") * 100, 0)
                    .cast("long")
                    .alias("v"),
                ),
                F.struct(
                    F.lit("price").alias("axis"),
                    F.round(F.col("l_extendedprice") * 100, 0)
                    .cast("long")
                    .alias("v"),
                ),
            )
        ).alias("s"),
    ).select(
        "g",
        "s.axis",
        "s.v",
        F.when(F.col("s.axis") == "qty", F.lit(16))
        .otherwise(F.lit(65536))
        .cast("long")
        .alias("w"),
    )
    qd = quantile_cont_vden(
        spark,
        melt,
        ["g", "axis"],
        [("p50", 1, 2), ("p90", 9, 10)],
        bucket_width="w",
    )
    x = qd.filter(
        ((F.col("axis") == "qty") & (F.col("q_label") == "p50"))
        | ((F.col("axis") == "price") & (F.col("q_label") == "p90"))
    ).withColumn(
        "val",
        F.col("vden").cast("double") / (F.col("den") * F.lit(100)),
    )
    return (
        x.groupBy(F.col("g").alias("l_returnflag"))
        .agg(
            F.round(
                F.max(F.when(F.col("axis") == "qty", F.col("val"))), 6
            ).alias("median_qty"),
            F.round(
                F.max(F.when(F.col("axis") == "price", F.col("val"))), 6
            ).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           round(avg(o_totalprice), 3) AS avg_price,
           round(stddev_samp(o_totalprice), 3) AS sd_price,
           round(min(o_totalprice), 3) AS min_price,
           round(max(o_totalprice), 3) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Statistical aggregates (rounded to 3 — double sum-order tolerance).",
)
def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.avg("o_totalprice"), 3).alias("avg_price"),
            F.round(F.stddev_samp("o_totalprice"), 3).alias("sd_price"),
            F.round(F.min("o_totalprice"), 3).alias("min_price"),
            F.round(F.max("o_totalprice"), 3).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM ranked WHERE rn <= 3 AND o_custkey <= 100
    ORDER BY o_custkey, rn
    """,
    doc="Top-k per group via row_number (no global sort).",
)
def window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") <= 100))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense
    FROM part
    WHERE p_size = 10
    ORDER BY p_brand, p_partkey
    """,
    doc="rank/dense_rank with ties.",
)
def window_rank(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        table(spark, sf, "part")
        .filter(F.col("p_size") == 10)
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense"),
        )
        .orderBy("p_brand", "p_partkey")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER w, 6) AS delta_prev,
           lead(o_orderkey) OVER w AS next_order
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="lag/lead over per-customer order history.",
)
def window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 6
            ).alias("delta_prev"),
            F.lead("o_orderkey").over(w).alias("next_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_total
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Running decimal sum (deterministic accumulation).",
)
def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(F.col("o_totalprice").cast(MONEY)).over(w), 2).cast("double")
            .alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS nearby_orders
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="RANGE frame (value-based window).",
)
def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, Window.currentRow)
    )
    return (
        table(spark, sf, "orders")
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("nearby_orders"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
    FROM orders
    WHERE o_custkey <= 20
    ORDER BY o_orderkey
    """,
    doc="ntile quartiles (deterministic tie-break).",
)
def window_ntile(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        table(spark, sf, "orders")
        .filter(F.col("o_custkey") <= 20)
        .select("o_orderkey", F.ntile(4).over(w).alias("price_quartile"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------

@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k (TakeOrderedAndProject — no full sort).",
)
def topk_global(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ORDER BY o_custkey
    """,
    doc="INTERSECT of two projections.",
)
def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@register(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ORDER BY o_custkey
    """,
    doc="EXCEPT (the BFS frontier-minus-visited shape).",
)
def setop_except(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b).orderBy("o_custkey")  # EXCEPT DISTINCT semantics


@register(
    "setop_union",
    oracle="""
    SELECT DISTINCT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
      UNION ALL
      SELECT c_custkey AS k FROM customer WHERE c_acctbal < -900
    )
    ORDER BY k
    """,
    doc="UNION + distinct (the BFS visited-accumulation shape).",
)
def setop_union(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("k")
    )
    c = table(spark, sf, "customer").filter(F.col("c_acctbal") < -900).select(
        F.col("c_custkey").alias("k")
    )
    return o.union(c).distinct().orderBy("k")


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------

@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 10)) AS name_prefix,
           concat(p_brand, '-', p_type) AS brand_type,
           regexp_extract(p_type, '(\\w+)$', 1) AS type_last_word,
           length(p_name) AS name_len
    FROM part
    WHERE p_partkey <= 200
    ORDER BY p_partkey
    """,
    doc="String functions: substring/upper/concat/regexp_extract/length.",
)
def scalar_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 10)).alias("name_prefix"),
            F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_type", r"(\w+)$", 1).alias("type_last_word"),
            F.length("p_name").alias("name_len"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    doc="Date functions: year/month/date_trunc/datediff/date_add.",
)
def scalar_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
            .alias("days_since_95"),
            F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
                "due_date"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           round(pow(l_quantity, 2), 6) AS qty_sq,
           CAST(ceil(l_tax * 10) AS BIGINT) AS tax_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           l_linenumber % 3 AS ln_mod,
           round(sqrt(l_extendedprice), 6) AS price_sqrt
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math functions (per-row, no aggregation — bit-exact across engines).",
)
def scalar_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            # Round at 4: the product of two 2-decimal values is exactly
            # 4-decimal, so no engine hits a .5 rounding boundary (Spark
            # HALF_UP vs DuckDB float rounding differ at exact halves).
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
            F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
            F.ceil(F.col("l_tax") * 10).cast("bigint").alias("tax_ceil"),
            F.floor("l_quantity").cast("bigint").alias("qty_floor"),
            (F.col("l_linenumber") % 3).alias("ln_mod"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "scalar_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="CASE WHEN bucketing + aggregation.",
)
def scalar_case_when(spark: SparkSession, sf: str) -> DataFrame:
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return (
        table(spark, sf, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@register(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT l_returnflag AS flag, ascii(l_returnflag) AS weight
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4)) * weight), 2) AS DOUBLE) AS weighted_qty,
           count(*) AS n
    FROM lineitem JOIN dim ON l_returnflag = flag
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Skew-mitigating salted join (operators/skew.py): 3-value join "
    "key — the worst-case skew shape — spread over 16 salt sub-keys; "
    "the oracle proves semantics identical to the plain equi-join.",
)
def join_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.operators import salted_join

    l = table(spark, sf, "lineitem").select(
        F.col("l_returnflag"), F.col("l_quantity")
    )
    dim = (
        l.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .select(
            F.col("flag").alias("l_returnflag"),
            F.ascii("flag").alias("weight"),
        )
    )
    return (
        salted_join(l, dim, on="l_returnflag", salt=16)
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,4)") * F.col("weight")), 2
            ).cast("double").alias("weighted_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pre-filter
# ---------------------------------------------------------------------------

_BLOOM_M = 65536  # bits
_BLOOM_K = 3  # hash functions
# DuckDB mirror of functions/text.py::portable_hash64 over (key || salt).
_BLOOM_POS = (
    "(('0x' || substr(md5(CAST({key} AS VARCHAR) || 'b{i}'), 1, 12))::BIGINT"
    f" % {_BLOOM_M})"
)


@register(
    "join_bloom_prefilter",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal < 0
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(
          "SELECT " + _BLOOM_POS.format(key="key", i=i) + " AS pos FROM build"
          for i in range(_BLOOM_K)
        )}
      )
    ),
    stats AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM build) AS n_build,
             (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set
    ),
    probe AS (
      SELECT o_orderstatus, o_custkey,
        {", ".join(
          _BLOOM_POS.format(key="o_custkey", i=i) + f" AS p{i}"
          for i in range(_BLOOM_K)
        )}
      FROM orders
    ),
    flagged AS (
      SELECT o_orderstatus, o_custkey,
        CASE WHEN {" AND ".join(
          f"p{i} IN (SELECT pos FROM bits)" for i in range(_BLOOM_K)
        )} THEN 1 ELSE 0 END AS in_bloom,
        CASE WHEN o_custkey IN (SELECT key FROM build)
             THEN 1 ELSE 0 END AS is_true
      FROM probe
    )
    SELECT o_orderstatus,
      CAST(count(*) AS BIGINT) AS n_probe,
      CAST(sum(in_bloom) AS BIGINT) AS n_candidates,
      CAST(sum(is_true) AS BIGINT) AS n_true_matches,
      CAST(sum(CASE WHEN in_bloom = 1 AND is_true = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
      round(CAST(sum(CASE WHEN in_bloom = 1 AND is_true = 0
                     THEN 1 ELSE 0 END) AS DOUBLE)
            / greatest(count(*) - sum(is_true), 1), 6) AS fp_rate,
      any_value((SELECT n_build FROM stats)) AS n_build,
      any_value((SELECT n_bits_set FROM stats)) AS n_bits_set
    FROM flagged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc=f"Portable BLOOM-FILTER semi-join pre-filter — the standard "
    "way a 100-TB engine avoids shuffling a fact table for a "
    "selective semi-join (Spark's own runtime bloomFilter rewrite, "
    "made explicit and engine-portable): the build side (negative- "
    f"balance customers) sets k={_BLOOM_K} bit positions per key in "
    f"an m={_BLOOM_M}-bit filter (positions are salted 48-bit md5 "
    "hashes, identical in both engines), and the probe side (orders) "
    "keeps only rows whose k positions are ALL set — a map-side test "
    "against a broadcast bit-position relation that is bounded by m "
    "BY CONSTRUCTION, never by build cardinality, so the broadcast "
    "never outgrows the driver no matter how large the build side "
    "grows. Membership is NEVER-FALSE-NEGATIVE (every true match "
    "survives — pinned as an invariant) and the per-status rollup "
    "reports the realized false-positive rate among true negatives, "
    "which visibly degrades as the scale factor grows against the "
    "fixed m (the m-sizing tradeoff a deployment tunes; ~2e-4 at "
    "sf0.1, ~1e-1 at sf1). Exact per-row ground truth rides the same "
    "scan via a second broadcast membership probe, so the entry "
    "value-hash-pins both the filter's bits and its error behavior.",
)
def join_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T

    def pos(key, i):
        return (
            T.portable_hash64(F.concat(key.cast("string"), F.lit(f"b{i}")))
            % _BLOOM_M
        )

    build = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    bits = (
        build.select(
            F.explode(
                F.array(*[pos(F.col("key"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    stats = build.agg(
        F.count(F.lit(1)).cast("long").alias("n_build")
    ).crossJoin(
        bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    )
    probe = table(spark, sf, "orders").select(
        "o_orderstatus",
        "o_custkey",
        *[pos(F.col("o_custkey"), i).alias(f"p{i}") for i in range(_BLOOM_K)],
    )
    flagged = probe
    for i in range(_BLOOM_K):
        flagged = flagged.join(
            F.broadcast(
                bits.select(
                    F.col("pos").alias(f"p{i}"), F.lit(1).alias(f"h{i}")
                )
            ),
            f"p{i}",
            "left",
        )
    flagged = flagged.join(
        F.broadcast(build.select(F.col("key").alias("o_custkey"), F.lit(1).alias("t"))),
        "o_custkey",
        "left",
    ).select(
        "o_orderstatus",
        F.when(
            sum(
                (F.col(f"h{i}").isNotNull().cast("int") for i in range(_BLOOM_K)),
                F.lit(0),
            )
            == _BLOOM_K,
            1,
        )
        .otherwise(0)
        .alias("in_bloom"),
        F.when(F.col("t").isNotNull(), 1).otherwise(0).alias("is_true"),
    )
    fp = F.sum(
        F.when((F.col("in_bloom") == 1) & (F.col("is_true") == 0), 1).otherwise(
            0
        )
    )
    return (
        flagged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probe"),
            F.sum("in_bloom").cast("long").alias("n_candidates"),
            F.sum("is_true").cast("long").alias("n_true_matches"),
            fp.cast("long").alias("n_false_pos"),
            F.round(
                fp.cast("double")
                / F.greatest(
                    F.count(F.lit(1)) - F.sum("is_true"), F.lit(1)
                ),
                6,
            ).alias("fp_rate"),
        )
        .crossJoin(F.broadcast(stats))
        .orderBy("o_orderstatus")
    )
