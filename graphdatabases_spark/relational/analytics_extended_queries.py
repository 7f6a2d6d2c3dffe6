"""Extended analytics catalog queries: the KMV set-operation sketch,
the l-diversity privacy audit, incremental aggregate maintenance
(IVM), the decontamination n-gram operating curve, and hourly-series
lag-k autocorrelation.  Split out of analytics_stats_queries.py
(round 9, pure move; registry unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.operators.quantile import quantile_cont_vden
from graphdatabases_spark.relational.analytics_queries import _ngram_array
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.llm_queries import TOKS as _TOKS

# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch with set operations
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_DOMAIN = 1 << 48  # portable_hash64 range
_KMV_EL = (
    "'kmv:' || CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)"
)
_KMV_EST = f"CASE WHEN {{s}}.n_h < {_KMV_K} THEN {{s}}.n_h " \
    f"ELSE ({_KMV_K - 1} * {_KMV_DOMAIN}) // {{s}}.hk END"


@register(
    "lineitem_kmv_setops",
    oracle=f"""
    WITH ae AS MATERIALIZED (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_shipdate < DATE '1996-06-01'
    ),
    be AS MATERIALIZED (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_shipdate >= DATE '1999-01-01'
    ),
    a_h AS MATERIALIZED (
      SELECT DISTINCT ('0x' || substr(md5({_KMV_EL}), 1, 12))::BIGINT AS h
      FROM ae
    ),
    b_h AS MATERIALIZED (
      SELECT DISTINCT ('0x' || substr(md5({_KMV_EL}), 1, 12))::BIGINT AS h
      FROM be
    ),
    u_h AS MATERIALIZED (SELECT h FROM a_h UNION SELECT h FROM b_h),
    ka AS (SELECT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
    ku AS MATERIALIZED (SELECT h FROM u_h ORDER BY h LIMIT {_KMV_K}),
    sa AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a_h) AS n_h,
                  (SELECT max(h) FROM ka) AS hk),
    sb AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM b_h) AS n_h,
                  (SELECT max(h) FROM kb) AS hk),
    su AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM u_h) AS n_h,
                  (SELECT max(h) FROM ku) AS hk),
    nboth AS (
      SELECT CAST(count(*) AS BIGINT) AS nb FROM ku
      WHERE h IN (SELECT h FROM a_h) AND h IN (SELECT h FROM b_h)
    ),
    ex AS (SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM ae) AS ex_a,
      (SELECT CAST(count(*) AS BIGINT) FROM be) AS ex_b,
      (SELECT CAST(count(*) AS BIGINT)
       FROM (SELECT * FROM ae UNION SELECT * FROM be)) AS ex_u,
      (SELECT CAST(count(*) AS BIGINT)
       FROM ae JOIN be USING (l_partkey, l_suppkey)) AS ex_i),
    rows_out AS (
      -- intersect-branch overflow bound: nb * ((k-1)*2^48 // hk)
      -- passes 2^63 only when hk <= 1; hk is the k-th smallest of
      -- k distinct 48-bit hashes, so hk >= k - 1 = 255 whenever the
      -- estimator branch runs (n_h = k) — structurally unreachable.
      SELECT 'a_early' AS measure,
             {_KMV_EST.format(s="sa")} AS est, ex.ex_a AS exact
      FROM sa, ex
      UNION ALL
      SELECT 'b_late', {_KMV_EST.format(s="sb")}, ex.ex_b FROM sb, ex
      UNION ALL
      SELECT 'union', {_KMV_EST.format(s="su")}, ex.ex_u FROM su, ex
      UNION ALL
      SELECT 'intersect',
             CASE WHEN su.n_h < {_KMV_K} THEN nboth.nb
                  ELSE (nboth.nb * (({_KMV_K - 1} * {_KMV_DOMAIN}) // su.hk))
                       // {_KMV_K} END,
             ex.ex_i
      FROM su, nboth, ex
    )
    SELECT measure, CAST(est AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact,
           CAST(abs(est - exact) * 1000000 // exact AS BIGINT) AS err_ppm
    FROM rows_out ORDER BY measure
    """,
    doc=f"KMV (k-minimum-values) distinct-count sketch with SET "
    f"OPERATIONS — the audience-overlap / theta-sketch workload HLL "
    f"cannot serve (HLL unions but never intersects): elements are "
    "(part, supplier) pairs, set A = pairs shipped early, set B = "
    f"pairs shipped late, k = {_KMV_K} minimum 48-bit portable hashes "
    "per set. Cardinality estimate = (k-1)·2^48 // h_k (exact BIGINT "
    "floor division — no float anywhere, so the sketch value-hash-"
    "matches the SQL replay bit-for-bit; sets smaller than k fall "
    "back to their exact hash count). UNION merges the two hash sets "
    "before taking the k minima (KMV's closure property); INTERSECT "
    "uses the standard KMV estimator — the fraction of the union's "
    "k-minima present in BOTH sets, scaled by the union estimate, in "
    "pure integer arithmetic. Every measure row carries the exact "
    "count and realized error (ppm) so the estimator's accuracy is "
    "part of the pinned value surface. Scale shape: per-set k-minima "
    "are TakeOrdered (per-partition heaps, k rows to the driver-side "
    "merge — no global sort), membership probes are k-row broadcast "
    "semi-joins, and the sketch is mergeable across shards/streams "
    "exactly like the HLL/CMS/t-digest siblings; the 1-row summary "
    "cross-joins are the allowlisted bounded-scalar pattern.",
)
def lineitem_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as TX

    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate"
    )
    ae = (
        li.filter(F.col("l_shipdate") < F.lit("1996-06-01").cast("date"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    be = (
        li.filter(F.col("l_shipdate") >= F.lit("1999-01-01").cast("date"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )

    def hashes(pairs: DataFrame) -> DataFrame:
        el = F.concat(
            F.lit("kmv:"),
            F.col("l_partkey").cast("string"),
            F.lit(":"),
            F.col("l_suppkey").cast("string"),
        )
        return pairs.select(TX.portable_hash64(el).alias("h")).distinct()

    a_h, b_h = hashes(ae), hashes(be)
    u_h = a_h.unionByName(b_h).distinct()

    def summary(hs: DataFrame) -> DataFrame:
        kmin = hs.orderBy("h").limit(_KMV_K)
        return (
            hs.agg(F.count(F.lit(1)).cast("long").alias("n_h"))
            .crossJoin(kmin.agg(F.max("h").alias("hk")))
        )

    est_expr = F.expr(
        f"CASE WHEN n_h < {_KMV_K} THEN n_h "
        f"ELSE ({_KMV_K - 1} * {_KMV_DOMAIN}) div hk END"
    ).cast("long")

    ex_a = ae.agg(F.count(F.lit(1)).cast("long").alias("exact"))
    ex_b = be.agg(F.count(F.lit(1)).cast("long").alias("exact"))
    ex_u = (
        ae.unionByName(be)
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    ex_i = ae.join(be, ["l_partkey", "l_suppkey"], "semi").agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )

    def row(measure: str, sk: DataFrame, ex: DataFrame, est) -> DataFrame:
        return (
            sk.crossJoin(ex)
            .select(
                F.lit(measure).alias("measure"),
                est.alias("est"),
                F.col("exact"),
            )
        )

    ku = u_h.orderBy("h").limit(_KMV_K)
    nboth = (
        ku.join(a_h, "h", "semi")
        .join(b_h, "h", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("nb"))
    )
    su = summary(u_h).crossJoin(nboth)
    # Overflow bound (ADVICE r8): nb * ((k-1)*2^48 // hk) could pass
    # 2^63 only when hk <= 1, i.e. a union estimate near (k-1)*2^48 ~
    # 2^55.99 DISTINCT ELEMENTS — 2^48 hash values can't even be that
    # many distinct minima, so hk is structurally bounded away from the
    # overflow regime (hk is the k-th smallest of k distinct
    # 48-bit values => hk >= k - 1 = 255 whenever the estimator
    # branch runs). Same bound pins the SQL mirror.
    est_i = F.expr(
        f"CASE WHEN n_h < {_KMV_K} THEN nb "
        f"ELSE (nb * (({_KMV_K - 1} * {_KMV_DOMAIN}) div hk)) div {_KMV_K} END"
    ).cast("long")

    out = (
        row("a_early", summary(a_h), ex_a, est_expr)
        .unionByName(row("b_late", summary(b_h), ex_b, est_expr))
        .unionByName(row("union", summary(u_h), ex_u, est_expr))
        .unionByName(row("intersect", su, ex_i, est_i))
    )
    return out.select(
        "measure",
        "est",
        "exact",
        F.expr("abs(est - exact) * 1000000 div exact")
        .cast("long")
        .alias("err_ppm"),
    ).orderBy("measure")


# ---------------------------------------------------------------------------
# l-diversity audit (k-anonymity's companion gate)
# ---------------------------------------------------------------------------

_LDIV_LS = (2, 3, 5)


@register(
    "customer_ldiversity_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS sz,
             CAST(count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS INT))
                  AS BIGINT) AS div
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    tot AS (
      SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups
      FROM g
    )
    SELECT * FROM (
      {" UNION ALL ".join(
        f"SELECT {l} AS l, tot.n_groups, tot.n_rows,"
        f" CAST(coalesce(sum(CASE WHEN div < {l} THEN 1 END), 0) AS BIGINT)"
        f"   AS groups_below,"
        f" CAST(coalesce(sum(CASE WHEN div < {l} THEN sz END), 0) AS BIGINT)"
        f"   AS rows_below,"
        f" CAST((1000000 * coalesce(sum(CASE WHEN div < {l} THEN sz END), 0))"
        f"   // tot.n_rows AS BIGINT) AS rows_below_ppm"
        f" FROM g, tot GROUP BY tot.n_groups, tot.n_rows"
        for l in _LDIV_LS
      )}
    ) ORDER BY l
    """,
    doc="l-DIVERSITY audit — customer_kanon_audit's companion: "
    "k-anonymity bounds CLASS SIZE but a class can still leak when "
    "every member shares the sensitive value (the homogeneity "
    "attack); this audit measures, per quasi-identifier class "
    "(nation, market segment), the number of DISTINCT sensitive "
    "values (account-balance band, floor(acctbal/2000)) and counts "
    f"classes below each l in {{{', '.join(str(l) for l in _LDIV_LS)}}} "
    "plus the rows inside them (exact integer ppm share). Scale "
    "shape: ONE keyed agg with a distinct-count over the table "
    "builds the (size, diversity) relation — bounded by the QI "
    "domain; every l-threshold row aggregates that bounded relation "
    "with a 1-row totals broadcast (the kanon pattern).",
)
def customer_ldiversity_audit(spark: SparkSession, sf: str) -> DataFrame:
    band = F.floor(F.col("c_acctbal") / 2000.0).cast("int")
    g = (
        table(spark, sf, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sz"),
            F.countDistinct(band).cast("long").alias("div"),
        )
    )
    tot = g.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    rows = []
    for l in _LDIV_LS:
        below = F.col("div") < l
        rows.append(
            g.crossJoin(F.broadcast(tot))
            .groupBy("n_groups", "n_rows")
            .agg(
                F.coalesce(F.sum(F.when(below, 1)), F.lit(0))
                .cast("long")
                .alias("groups_below"),
                F.coalesce(F.sum(F.when(below, F.col("sz"))), F.lit(0))
                .cast("long")
                .alias("rows_below"),
            )
            .select(
                F.lit(l).cast("long").alias("l"),
                "n_groups",
                "n_rows",
                "groups_below",
                "rows_below",
                F.expr(
                    "CAST((1000000 * rows_below) div n_rows AS BIGINT)"
                ).alias("rows_below_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("l")


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (partial-merge identity)
# ---------------------------------------------------------------------------

_IVM_CUT = "1998-01-01"


@register(
    "orders_incremental_agg",
    oracle=f"""
    WITH base AS (SELECT * FROM orders WHERE o_orderdate < DATE '{_IVM_CUT}'),
    delta AS (SELECT * FROM orders WHERE o_orderdate >= DATE '{_IVM_CUT}'),
    pb AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
             max(CAST(o_totalprice AS DECIMAL(18,4))) AS mx
      FROM base GROUP BY 1
    ),
    pd AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
             max(CAST(o_totalprice AS DECIMAL(18,4))) AS mx
      FROM delta GROUP BY 1
    ),
    merged AS (
      SELECT priority,
             CAST(sum(n) AS BIGINT) AS n_incr,
             CAST(round(sum(rev), 2) AS DOUBLE) AS rev_incr,
             CAST(max(mx) AS DOUBLE) AS max_incr
      FROM (SELECT * FROM pb UNION ALL SELECT * FROM pd)
      GROUP BY priority
    ),
    cd AS (
      SELECT priority, CAST(count(*) AS BIGINT) AS n_cust_incr
      FROM (
        SELECT DISTINCT o_orderpriority AS priority, o_custkey FROM base
        UNION
        SELECT DISTINCT o_orderpriority, o_custkey FROM delta
      ) GROUP BY priority
    ),
    full_r AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n_full,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS rev_full,
             CAST(max(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS max_full,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust_full
      FROM orders GROUP BY 1
    )
    SELECT m.priority, m.n_incr, m.rev_incr, m.max_incr, cd.n_cust_incr,
           (m.n_incr = f.n_full AND m.rev_incr = f.rev_full
            AND m.max_incr = f.max_full
            AND cd.n_cust_incr = f.n_cust_full) AS matches_full
    FROM merged m JOIN cd USING (priority) JOIN full_r f
      ON f.priority = m.priority
    ORDER BY m.priority
    """,
    doc="INCREMENTAL VIEW MAINTENANCE identity, value-pinned: a "
    "per-priority revenue aggregate maintained from PARTIAL states — "
    "base partition (orders before the cut) + late-arriving delta "
    "batch — merged as count-sum / decimal-sum-sum / max-max, with "
    "the distinct-customer count maintained through its correct "
    "merge form (union of per-split DISTINCT key sets, then count — "
    "distinct counts do NOT merge from scalars, the classic IVM "
    "trap). The matches_full column proves the merged state equals "
    "the full recompute for every group — TRUE rows are part of the "
    "hash, so a broken merge rule fails the gate. At 100 TB this is "
    "the daily-pipeline contract: yesterday's partials + today's "
    "delta, never a full rescan; decimal sums make the merge "
    "order-invariant on any partitioning. Scale shape: two "
    "partition-pruned aggs + one |groups|-bounded merge agg + one "
    "distinct-pair union agg.",
)
def orders_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    cut = F.lit(_IVM_CUT).cast("date")
    money = "decimal(18,4)"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast(money)).alias("rev"),
            F.max(F.col("o_totalprice").cast(money)).alias("mx"),
        )

    base = o.filter(F.col("o_orderdate") < cut)
    delta = o.filter(F.col("o_orderdate") >= cut)
    merged = (
        partial(base)
        .unionByName(partial(delta))
        .groupBy("priority")
        .agg(
            F.sum("n").cast("long").alias("n_incr"),
            F.round(F.sum("rev"), 2).cast("double").alias("rev_incr"),
            F.max("mx").cast("double").alias("max_incr"),
        )
    )
    cd = (
        base.select(F.col("o_orderpriority").alias("priority"), "o_custkey")
        .distinct()
        .unionByName(
            delta.select(
                F.col("o_orderpriority").alias("priority"), "o_custkey"
            ).distinct()
        )
        .distinct()
        .groupBy("priority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust_incr"))
    )
    full_r = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_full"),
        F.round(F.sum(F.col("o_totalprice").cast(money)), 2)
        .cast("double")
        .alias("rev_full"),
        F.max(F.col("o_totalprice").cast(money))
        .cast("double")
        .alias("max_full"),
        F.countDistinct("o_custkey").cast("long").alias("n_cust_full"),
    )
    return (
        merged.join(cd, "priority")
        .join(full_r, "priority")
        .select(
            "priority",
            "n_incr",
            "rev_incr",
            "max_incr",
            "n_cust_incr",
            (
                (F.col("n_incr") == F.col("n_full"))
                & (F.col("rev_incr") == F.col("rev_full"))
                & (F.col("max_incr") == F.col("max_full"))
                & (F.col("n_cust_incr") == F.col("n_cust_full"))
            ).alias("matches_full"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Contamination operating curve over n-gram size
# ---------------------------------------------------------------------------

_CONTAM_NS = (2, 3, 5, 8)


def _contam_n_cte(n: int) -> str:
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n)).replace(
        "toks[i+0]", "toks[i]"
    )
    return f"""g{n} AS (
      SELECT split,
        unnest(list_distinct(list_transform(range(1, len(toks) - {n - 2}),
          i -> {gram}))) AS gram
      FROM t WHERE len(toks) >= {n}
    ),
    sg{n} AS MATERIALIZED (SELECT DISTINCT split, gram FROM g{n}),
    row{n} AS (
      SELECT {n} AS n,
        (SELECT CAST(count(*) AS BIGINT) FROM sg{n}
          WHERE split = 'train') AS n_grams_train,
        (SELECT CAST(count(*) AS BIGINT) FROM sg{n}
          WHERE split = 'val') AS n_grams_val,
        (SELECT CAST(count(*) AS BIGINT)
         FROM sg{n} a JOIN sg{n} b ON b.gram = a.gram
         WHERE a.split = 'train' AND b.split = 'val') AS n_shared
    )"""


@register(
    "docs_contamination_n_curve",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT CASE
               WHEN ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT
                    % 10 < 8 THEN 'train'
               WHEN ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT
                    % 10 = 8 THEN 'val'
               ELSE 'test' END AS split,
             {{toks}} AS toks
      FROM documents
    ),
    {",".join(_contam_n_cte(n) for n in _CONTAM_NS)}
    SELECT CAST(n AS BIGINT) AS n, n_grams_train, n_grams_val, n_shared,
           CAST((1000000 * n_shared)
                // least(n_grams_train, n_grams_val) AS BIGINT)
             AS containment_ppm
    FROM ({" UNION ALL ".join(f"SELECT * FROM row{n}" for n in _CONTAM_NS)})
    ORDER BY n
    """.replace("{toks}", _TOKS),
    doc=f"CONTAMINATION OPERATING CURVE over n-gram size — the knob "
    "published decontamination pipelines actually tune (GPT-3 used "
    "13-grams; short n over-flags, long n under-flags): train↔val "
    "shared distinct n-grams and the containment ratio (exact "
    f"integer ppm) at n ∈ {{{', '.join(str(n) for n in _CONTAM_NS)}}} "
    "on the same salted split assignment as docs_split_manifest / "
    "docs_split_contamination (whose single-n row this curve "
    "brackets). The curve is the calibration artifact: pick the "
    "smallest n whose false-positive floor (containment at random "
    "overlap) is acceptable. Scale shape: per-n distinct-gram "
    "relations are hash-aggs with vocabulary-bounded growth; each "
    "shared count is one gram-keyed equi-join; output is "
    f"{len(_CONTAM_NS)} rows. Like its siblings, counts are exact "
    "BIGINTs and the ratio is one floor division.",
)
def docs_contamination_n_curve(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.relational.analytics_queries import _ngram_array

    b = (
        T.portable_hash64(
            F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
        )
        % 10
    )
    split = (
        F.when(b < 8, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    d = table(spark, sf, "documents").select(
        split.alias("split"), T.tokens(F.col("text")).alias("toks")
    )
    out = None
    for n in _CONTAM_NS:
        sg = (
            d.filter(F.size("toks") >= n)
            .select(
                "split",
                F.explode(
                    F.array_distinct(_ngram_array(F.col("toks"), n))
                ).alias("gram"),
            )
            .distinct()
        )
        tr = sg.filter(F.col("split") == "train").select("gram")
        va = sg.filter(F.col("split") == "val").select(
            F.col("gram").alias("gram_v")
        )
        row = (
            tr.agg(F.count(F.lit(1)).cast("long").alias("n_grams_train"))
            .crossJoin(
                va.agg(F.count(F.lit(1)).cast("long").alias("n_grams_val"))
            )
            .crossJoin(
                tr.join(va, F.col("gram_v") == F.col("gram"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            )
            .select(
                F.lit(n).cast("long").alias("n"),
                "n_grams_train",
                "n_grams_val",
                "n_shared",
                F.expr(
                    "CAST((1000000 * n_shared)"
                    " div least(n_grams_train, n_grams_val) AS BIGINT)"
                ).alias("containment_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n")


# ---------------------------------------------------------------------------
# Hourly-series autocorrelation (lag-k, exact integer sums)
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 24)


def _acf_row_sql(k: int) -> str:
    return f"""SELECT {k} AS lag_h,
      (SELECT CAST(count(*) AS BIGINT) FROM h a
        JOIN h b ON b.hr = a.hr + {k}) AS n_pairs,
      (SELECT CAST(sum(a.c) AS BIGINT) FROM h a
        JOIN h b ON b.hr = a.hr + {k}) AS sx,
      (SELECT CAST(sum(b.c) AS BIGINT) FROM h a
        JOIN h b ON b.hr = a.hr + {k}) AS sy,
      (SELECT CAST(sum(a.c * b.c) AS BIGINT) FROM h a
        JOIN h b ON b.hr = a.hr + {k}) AS sxy,
      (SELECT CAST(sum(a.c * a.c) AS BIGINT) FROM h a
        JOIN h b ON b.hr = a.hr + {k}) AS sxx,
      (SELECT CAST(sum(b.c * b.c) AS BIGINT) FROM h a
        JOIN h b ON b.hr = a.hr + {k}) AS syy"""


@register(
    "events_hourly_autocorr",
    oracle=f"""
    WITH h AS MATERIALIZED (
      SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    rows_out AS ({" UNION ALL ".join(_acf_row_sql(k) for k in _ACF_LAGS)})
    SELECT lag_h, n_pairs,
           round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / greatest(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)),
                            1e-30), 6) AS acf
    FROM rows_out ORDER BY lag_h
    """,
    doc=f"AUTOCORRELATION of the hourly event-count series at lags "
    f"{{{', '.join(str(k) for k in _ACF_LAGS)}}} hours — the "
    "seasonality probe behind anomaly baselines (lag-24 reads daily "
    "periodicity; lag-1 short-range burstiness): hours bucket to "
    "epoch-hour integers, the lag pairing is an equi-join on hr+k "
    "(observed hours only — missing hours pair nothing, the "
    "Pearson-on-paired-points convention), and the correlation uses "
    "the computational formula over EXACT BIGINT sums of the integer "
    "counts (n·Σxy − Σx·Σy over the geometric mean of the same-form "
    "variances) — the only floating point is one division + two "
    "sqrts at the end, rounded once, so the value hash-matches "
    "cross-engine with no summation-order hazard. Scale shape: one "
    "hour-keyed count agg (bounded by the time horizon, not the row "
    "count), then per-lag self-equi-joins + 1-row scalar folds over "
    "that bounded relation.",
)
def events_hourly_autocorr(spark: SparkSession, sf: str) -> DataFrame:
    h = (
        table(spark, sf, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .cast("long")
            .alias("hr")
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    out = None
    for k in _ACF_LAGS:
        a = h.select(F.col("hr"), F.col("c").alias("x"))
        b = h.select(
            (F.col("hr") - k).alias("hr_b"), F.col("c").alias("y")
        )
        pairs = a.join(b, F.col("hr_b") == F.col("hr"))
        row = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        ).select(
            F.lit(k).cast("long").alias("lag_h"),
            "n_pairs",
            F.round(
                (
                    F.col("n_pairs") * F.col("sxy")
                    - F.col("sx") * F.col("sy")
                ).cast("double")
                / F.greatest(
                    F.sqrt(
                        (
                            F.col("n_pairs") * F.col("sxx")
                            - F.col("sx") * F.col("sx")
                        ).cast("double")
                    )
                    * F.sqrt(
                        (
                            F.col("n_pairs") * F.col("syy")
                            - F.col("sy") * F.col("sy")
                        ).cast("double")
                    ),
                    F.lit(1e-30),
                ),
                6,
            ).alias("acf"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag_h")


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over the hourly series
# ---------------------------------------------------------------------------

_CUSUM_BASE_HOURS = 168  # reference = the first observed week
_CUSUM_ALARM_HOURS = 24  # alarm when drift accumulates a day of excess


@register(
    "events_cusum_hourly",
    oracle=f"""
    WITH h0 AS MATERIALIZED (
      SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    spl AS (
      SELECT CAST(min(hr) + 3 * (max(hr) - min(hr) + 1) // 4 AS BIGINT)
        AS split_hr
      FROM h0
    ),
    h AS (
      SELECT hr,
        CASE WHEN hr >= split_hr THEN c + c // 3 ELSE c END AS c,
        split_hr
      FROM h0, spl
    ),
    base AS (
      SELECT CAST((1000000 * sum(c)) // count(*) AS BIGINT) AS ref_u
      FROM (SELECT c FROM h ORDER BY hr LIMIT {_CUSUM_BASE_HOURS})
    ),
    p AS (
      SELECT hr, c, split_hr,
        sum(1000000 * c - ref_u) OVER (
          ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS pf,
        ref_u
      FROM h, base
    ),
    s AS (
      SELECT hr, c, ref_u, split_hr,
        pf - least(0, min(pf) OVER (
          ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )) AS cpos,
        greatest(0, max(pf) OVER (
          ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )) - pf AS cneg
      FROM p
    )
    SELECT hr, c AS n_events, (hr >= split_hr) AS drifted,
      CAST(cpos AS BIGINT) AS cusum_pos_u,
      CAST(cneg AS BIGINT) AS cusum_neg_u,
      (cpos > {_CUSUM_ALARM_HOURS} * ref_u) AS alarm_pos,
      (cneg > {_CUSUM_ALARM_HOURS} * ref_u) AS alarm_neg
    FROM s ORDER BY hr
    """,
    doc="CUSUM changepoint/drift detection over the hourly event-count "
    "series — the classic sequential monitoring statistic, computed "
    "in CLOSED FORM: the textbook recursion S_t = max(0, S_{t-1} + "
    "(x_t − ref)) is exactly prefix_sum − min(0, "
    "running_min(prefix_sum)) — the min(0, ·) is the virtual empty "
    "prefix P_0 = 0, without which the statistic is understated by "
    "min(pf) whenever every early prefix sum is positive (round-9 "
    "ADVICE; the downward statistic is symmetrically max(0, "
    "running_max) − prefix_sum) — so "
    "the sequential-looking detector becomes two windows over the "
    f"hour-bounded relation. Reference rate = the first "
    f"{_CUSUM_BASE_HOURS} observed hours' mean in exact µ-units "
    "(integer floor division); everything downstream is BIGINT "
    "arithmetic — no floats anywhere, the whole 720-row statistic "
    f"value-hashes. Alarms fire when {_CUSUM_ALARM_HOURS} hours of "
    "cumulative excess (relative to the baseline rate) accumulate — "
    "the day-of-drift rule a traffic monitor would page on. The "
    "fixture's event rate is stationary (measured: zero alarms on "
    "the raw series), so a DETERMINISTIC +33% rate step (c += c//3) "
    "is planted at the 3/4-horizon hour — the fixture-injection "
    "convention — and the detector's firing delay past the flagged "
    "`drifted` boundary is part of the value-checked output. Scale "
    "shape: one hour-keyed count agg (horizon-bounded, not "
    "row-bounded), a 1-row baseline scalar broadcast, and ordered "
    "windows over the bounded hourly relation (the "
    "events_hourly_autocorr pattern).",
)
def events_cusum_hourly(spark: SparkSession, sf: str) -> DataFrame:
    h0 = (
        table(spark, sf, "events")
        .select(
            F.expr(
                "CAST(unix_micros(date_trunc('hour', ts)) div 3600000000"
                " AS BIGINT)"
            ).alias("hr")
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spl = h0.agg(
        F.expr(
            "CAST(min(hr) + 3 * (max(hr) - min(hr) + 1) div 4 AS BIGINT)"
        ).alias("split_hr")
    )
    h = h0.crossJoin(F.broadcast(spl)).select(
        "hr",
        F.when(
            F.col("hr") >= F.col("split_hr"),
            F.col("c") + F.expr("c div 3"),
        )
        .otherwise(F.col("c"))
        .alias("c"),
        "split_hr",
    )
    base = (
        h.orderBy("hr")
        .limit(_CUSUM_BASE_HOURS)
        .agg(
            F.expr(
                "CAST((1000000 * sum(c)) div count(*) AS BIGINT)"
            ).alias("ref_u")
        )
    )
    w = Window.orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = h.crossJoin(F.broadcast(base)).withColumn(
        "pf", F.sum(F.lit(1000000) * F.col("c") - F.col("ref_u")).over(w)
    )
    s = p.withColumn(
        "cpos", F.col("pf") - F.least(F.lit(0), F.min("pf").over(w))
    ).withColumn(
        "cneg", F.greatest(F.lit(0), F.max("pf").over(w)) - F.col("pf")
    )
    return s.select(
        "hr",
        F.col("c").alias("n_events"),
        (F.col("hr") >= F.col("split_hr")).alias("drifted"),
        F.col("cpos").cast("long").alias("cusum_pos_u"),
        F.col("cneg").cast("long").alias("cusum_neg_u"),
        (F.col("cpos") > _CUSUM_ALARM_HOURS * F.col("ref_u")).alias(
            "alarm_pos"
        ),
        (F.col("cneg") > _CUSUM_ALARM_HOURS * F.col("ref_u")).alias(
            "alarm_neg"
        ),
    ).orderBy("hr")


# ---------------------------------------------------------------------------
# Robust outlier detection: median/MAD vs the σ-masked z-score
# ---------------------------------------------------------------------------

# 3 * 1.4826 (the normal-consistency constant), pre-rounded module-side
# so the threshold is one engine-identical multiply — no runtime
# transcendental (the BM25-idf discipline).
_MAD_THRESH = 4.4478
# Planted contamination (the fixture's prices are clean — measured zero
# natural outliers at 3·1.4826·MAD): a rare BIG tier that inflates σ
# and a commoner MEDIUM tier the inflated z-score then misses.
_MAD_BIG_MOD, _MAD_BIG_X = 499, 64
_MAD_MED_MOD, _MAD_MED_X = 101, 4

_MAD_X_SQL = f"""CASE WHEN o_orderkey % {_MAD_BIG_MOD} = 0
             THEN o_totalprice * {_MAD_BIG_X}
             WHEN o_orderkey % {_MAD_MED_MOD} = 0
             THEN o_totalprice * {_MAD_MED_X}
             ELSE o_totalprice END"""


@register(
    "orders_mad_outliers",
    oracle=f"""
    WITH c AS MATERIALIZED (
      SELECT o_orderpriority, {_MAD_X_SQL} AS x,
        CASE WHEN o_orderkey % {_MAD_BIG_MOD} = 0 THEN 1 ELSE 0 END AS big,
        CASE WHEN o_orderkey % {_MAD_BIG_MOD} <> 0
              AND o_orderkey % {_MAD_MED_MOD} = 0 THEN 1 ELSE 0 END AS med_t
      FROM orders
    ),
    cu AS (
      SELECT o_orderpriority, CAST(round(x * 100) AS BIGINT) AS v FROM c
    ),
    n1 AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
      FROM cu GROUP BY 1
    ),
    r1 AS MATERIALIZED (
      SELECT o_orderpriority, v,
             row_number() OVER (
               PARTITION BY o_orderpriority ORDER BY v
             ) AS rn
      FROM cu
    ),
    m AS (
      SELECT n1.o_orderpriority,
        CAST(2 * rlo.v
             + ((n1.n - 1) % 2) * (coalesce(rhi.v, rlo.v) - rlo.v)
             AS DOUBLE) / 200 AS med
      FROM n1
      JOIN r1 rlo ON rlo.o_orderpriority = n1.o_orderpriority
                 AND rlo.rn = (n1.n - 1) // 2 + 1
      LEFT JOIN r1 rhi ON rhi.o_orderpriority = n1.o_orderpriority
                      AND rhi.rn = (n1.n - 1) // 2 + 2
                      AND (n1.n - 1) % 2 > 0
    ),
    d AS MATERIALIZED (
      SELECT c.*, m.med, abs(c.x - m.med) AS dev
      FROM c JOIN m USING (o_orderpriority)
    ),
    du AS (
      SELECT o_orderpriority, CAST(round(dev * 1000) AS BIGINT) AS v
      FROM d
    ),
    n2 AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
      FROM du GROUP BY 1
    ),
    r2 AS MATERIALIZED (
      SELECT o_orderpriority, v,
             row_number() OVER (
               PARTITION BY o_orderpriority ORDER BY v
             ) AS rn
      FROM du
    ),
    s AS (
      SELECT n2.o_orderpriority,
        CAST(2 * rlo.v
             + ((n2.n - 1) % 2) * (coalesce(rhi.v, rlo.v) - rlo.v)
             AS DOUBLE) / 2000 AS mad
      FROM n2
      JOIN r2 rlo ON rlo.o_orderpriority = n2.o_orderpriority
                 AND rlo.rn = (n2.n - 1) // 2 + 1
      LEFT JOIN r2 rhi ON rhi.o_orderpriority = n2.o_orderpriority
                      AND rhi.rn = (n2.n - 1) // 2 + 2
                      AND (n2.n - 1) % 2 > 0
    ),
    z AS (
      SELECT o_orderpriority,
        CAST(sum(CAST(x AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS mean,
        sqrt((count(*) * CAST(sum(CAST(x AS DECIMAL(38,4))
                                  * CAST(x AS DECIMAL(38,4))) AS DOUBLE)
              - CAST(sum(CAST(x AS DECIMAL(38,4))) AS DOUBLE)
                * CAST(sum(CAST(x AS DECIMAL(38,4))) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE) * count(*))) AS std
      FROM c GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(d.big) AS BIGINT) AS n_planted_big,
      CAST(sum(d.med_t) AS BIGINT) AS n_planted_med,
      round(min(d.med), 2) AS med,
      round(min(s.mad), 2) AS mad,
      round(min(z.mean), 2) AS mean,
      round(min(z.std), 2) AS std,
      CAST(sum(CASE WHEN d.dev > {_MAD_THRESH} * s.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mad_out,
      CAST(sum(CASE WHEN abs(d.x - z.mean) > 3 * z.std
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_z_out
    FROM d JOIN s USING (o_orderpriority) JOIN z USING (o_orderpriority)
    GROUP BY d.o_orderpriority
    ORDER BY d.o_orderpriority
    """,
    doc="ROBUST outlier detection (median/MAD) vs the σ-MASKED z-score, "
    "demonstrated on planted two-tier contamination: a rare ×64 tier "
    f"(o_orderkey % {_MAD_BIG_MOD}) inflates the standard deviation "
    f"~5×, and a commoner ×{_MAD_MED_X} tier (% {_MAD_MED_MOD}) then "
    "hides UNDER the inflated 3σ gate while the 50%-breakdown "
    "median/MAD keeps its scale (mad ≈ 126k vs std blown to ≈ 800k at "
    "sf0.1) and flags the big tier plus the medium majority — the "
    "classical masking failure, visible in-row (n_z_out 54 ≈ the 58 "
    "big plants; n_mad_out 239 ≫; zero natural outliers without the "
    "plant, measured). "
    "Determinism: each median is the EXACT RATIONAL (v_lo+v_hi)/2 of "
    "the two middle integer-scaled values (x cents-quantized ×100, "
    "dev ×1000 — exact on the fixture's 2-dp-×-power-of-2 domain), so "
    "no interpolated double is ever rounded before reuse (the round-9 "
    "ADVICE 1-ulp-at-a-rounding-boundary hazard is gone by "
    "construction); mean/std from exact DECIMAL(38,4) Σx/Σx² via the "
    "computational formula (one sqrt + one divide of identical IEEE "
    f"inputs), MAD threshold pre-rounded to {_MAD_THRESH}. Scale "
    "shape: the medians run through the shared two-pass histogram-"
    "refinement kernel (operators/quantile.py — bounded bucket "
    "histogram + in-bucket sort of only the target buckets; exact "
    "F.percentile's per-group value->count buffer grows with distinct "
    "values on this continuous domain and was the round-9 verdict's "
    "scale hazard) + one DECIMAL moment agg + a broadcast 5-row stats "
    "join back onto the scan.",
)
def orders_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    x = F.expr(_MAD_X_SQL)
    c = table(spark, sf, "orders").select(
        "o_orderpriority",
        x.alias("x"),
        F.when(F.col("o_orderkey") % _MAD_BIG_MOD == 0, 1)
        .otherwise(0)
        .alias("big"),
        F.when(
            (F.col("o_orderkey") % _MAD_BIG_MOD != 0)
            & (F.col("o_orderkey") % _MAD_MED_MOD == 0),
            1,
        )
        .otherwise(0)
        .alias("med_t"),
    )
    cu = c.select(
        "o_orderpriority",
        F.round(F.col("x") * 100, 0).cast("long").alias("v"),
    )
    m = quantile_cont_vden(
        spark, cu, ["o_orderpriority"], [("p50", 1, 2)], bucket_width=2**19
    ).select(
        "o_orderpriority",
        (F.col("vden").cast("double") / F.lit(200)).alias("med"),
    )
    d = c.join(F.broadcast(m), "o_orderpriority").withColumn(
        "dev", F.abs(F.col("x") - F.col("med"))
    )
    du = d.select(
        "o_orderpriority",
        F.round(F.col("dev") * 1000, 0).cast("long").alias("v"),
    )
    s = quantile_cont_vden(
        spark, du, ["o_orderpriority"], [("p50", 1, 2)], bucket_width=2**22
    ).select(
        "o_orderpriority",
        (F.col("vden").cast("double") / F.lit(2000)).alias("mad"),
    )
    xd = F.col("x").cast("decimal(38,4)")
    z = c.groupBy("o_orderpriority").agg(
        (F.sum(xd).cast("double") / F.count(F.lit(1))).alias("mean"),
        F.sqrt(
            (
                F.count(F.lit(1)) * F.sum(xd * xd).cast("double")
                - F.sum(xd).cast("double") * F.sum(xd).cast("double")
            )
            / (F.count(F.lit(1)).cast("double") * F.count(F.lit(1)))
        ).alias("std"),
    )
    return (
        d.join(F.broadcast(s), "o_orderpriority")
        .join(F.broadcast(z), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("big").cast("long").alias("n_planted_big"),
            F.sum("med_t").cast("long").alias("n_planted_med"),
            F.round(F.min("med"), 2).alias("med"),
            F.round(F.min("mad"), 2).alias("mad"),
            F.round(F.min("mean"), 2).alias("mean"),
            F.round(F.min("std"), 2).alias("std"),
            F.sum(
                F.when(F.col("dev") > F.lit(_MAD_THRESH) * F.col("mad"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_mad_out"),
            F.sum(
                F.when(
                    F.abs(F.col("x") - F.col("mean")) > 3 * F.col("std"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_z_out"),
        )
        .orderBy("o_orderpriority")
    )
