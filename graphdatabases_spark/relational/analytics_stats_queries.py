"""Exact statistics, sketches, and evaluation-split analytics.

Split out of ``analytics_queries`` (round-8 pure-move refactor — same
entries, same oracles, registry unchanged): exact two-pass quantiles,
the t-digest family (sketch + mergeability proof), split contamination
and validation-novelty checks, CUPED variance reduction, next-match
veto attribution, k-anonymity auditing, trimmed means, session-gap
operating curves, conversion-latency quantiles, and Pareto revenue
shares.  Determinism discipline is catalog.py's; per-entry scale notes
in each doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.relational.analytics_queries import _ngram_array
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.llm_queries import TOKS as _TOKS


@register(
    "orders_quantile_histogram",
    oracle="""
    WITH o AS (
      SELECT o_orderpriority AS pri,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    n AS (SELECT pri, CAST(count(*) AS BIGINT) AS n FROM o GROUP BY pri),
    r AS (
      SELECT pri, cents,
             row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn
      FROM o
    ),
    q(q_label, num, den) AS (
      VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
    ),
    t AS (
      SELECT n.pri, q.q_label,
             (q.num * n.n + q.den - 1) // q.den AS rank, n.n
      FROM n CROSS JOIN q
    )
    SELECT t.pri AS o_orderpriority, t.q_label, t.n AS n_rows,
      CAST(t.rank AS BIGINT) AS rank,
      round(CAST(r.cents AS DOUBLE) / 100, 2) AS value
    FROM t JOIN r ON r.pri = t.pri AND r.rn = t.rank
    ORDER BY o_orderpriority, q_label
    """,
    doc="EXACT distributed quantiles WITHOUT a global sort — the "
    "two-pass histogram-refinement algorithm (per priority group: "
    "p50/p90/p99 of o_totalprice, type-1 lower quantile at rank "
    "ceil(q*n)). Pass 1 histograms prices into 64-KiB-cent buckets "
    "(one combinable keyed agg; cumulative counts via a window over "
    "the BOUNDED bucket list locates each quantile's bucket); pass 2 "
    "sorts ONLY the target buckets' rows (a window partitioned per "
    "(group, quantile) over ~1/bucket_count of the data) and picks the "
    "in-bucket rank. The oracle computes the same ranks by brute "
    "global sort — different algorithm, identical exact answer. "
    "Determinism discipline: ranks are pure INTEGER arithmetic "
    "((num*n + den - 1) div den — no 0.9*n float whose 1-ulp error "
    "could shift a rank), cents = floor(price*100) in both engines "
    "(DuckDB's int CAST rounds where Spark truncates, so neither is "
    "used), and equal values land in the same bucket so in-bucket "
    "row_number ties cannot change the selected VALUE. At 100 TB this "
    "is the standard exact-percentile pattern: the histogram is tiny, "
    "and only the handful of target buckets ever sort.",
)
def orders_quantile_histogram(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = o.withColumn("bucket", F.floor(F.col("cents") / 65536).cast("long"))
    hist = b.groupBy("pri", "bucket").agg(F.count(F.lit(1)).alias("c"))
    wc = (
        Window.partitionBy("pri")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        hist.withColumn("cum", F.sum("c").over(wc))
        .withColumn("prev", F.col("cum") - F.col("c"))
    )
    n = hist.groupBy("pri").agg(F.sum("c").cast("long").alias("n"))
    qdf = spark.createDataFrame(
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)],
        "q_label string, num long, den long",
    )
    t = n.crossJoin(F.broadcast(qdf)).select(
        "pri",
        "q_label",
        "n",
        F.expr("(num * n + den - 1) div den").alias("rank"),
    )
    tb = t.join(cum, "pri").filter(
        (F.col("prev") < F.col("rank")) & (F.col("rank") <= F.col("cum"))
    )
    cand = b.join(
        F.broadcast(
            tb.select("pri", "bucket", "q_label", "n", "rank", "prev")
        ),
        ["pri", "bucket"],
    )
    wv = Window.partitionBy("pri", "q_label").orderBy("cents")
    val = cand.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") == F.col("rank") - F.col("prev")
    )
    return val.select(
        F.col("pri").alias("o_orderpriority"),
        "q_label",
        F.col("n").alias("n_rows"),
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("cents").cast("double") / 100, 2).alias("value"),
    ).orderBy("o_orderpriority", "q_label")


_TD_DELTA = 32  # t-digest compression: fixed centroid budget per group
_TD_BUCKET = 65536  # pass-1 histogram bucket width (cents)


@register(
    "orders_tdigest_sketch",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS pri,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    h AS (
      SELECT pri, cents // {_TD_BUCKET} AS bucket,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(cents) AS HUGEINT) AS s,
             min(cents) AS lo, max(cents) AS hi
      FROM o GROUP BY pri, bucket
    ),
    w AS (
      SELECT *,
             sum(c) OVER (PARTITION BY pri ORDER BY bucket) AS cum,
             sum(c) OVER (PARTITION BY pri) AS n
      FROM h
    ),
    z AS (
      SELECT *, CAST(2 * (cum - c) + c AS HUGEINT) AS m2,
             CAST(2 * n AS HUGEINT) AS den
      FROM w
    ),
    cz AS (
      SELECT *, CAST(
        (CAST({_TD_DELTA // 2} AS HUGEINT)
          * ((m2 - den) * abs(m2 - den) + den * den)) // (den * den)
        AS BIGINT) AS centroid
      FROM z
    )
    SELECT pri AS o_orderpriority, centroid,
           CAST(sum(c) AS BIGINT) AS weight,
           round(CAST(min(lo) AS DOUBLE) / 100, 2) AS lo_value,
           round(CAST(max(hi) AS DOUBLE) / 100, 2) AS hi_value,
           round(CAST(sum(s) AS DOUBLE) / CAST(sum(c) AS BIGINT) / 100, 6)
             AS mean_value
    FROM cz GROUP BY pri, centroid
    ORDER BY o_orderpriority, centroid
    """,
    doc="PORTABLE t-digest-style quantile sketch (the HLL/CMS portable-"
    "sketch discipline applied to quantiles): per priority group, "
    f"o_totalprice cents are digested into <= {_TD_DELTA} centroids "
    "whose q-space width shrinks toward the tails — t-digest's "
    "defining property — via the ALGEBRAIC tail-biased scale function "
    "k(q) = (DELTA/2)*(u*|u| + 1), u = 2q-1 (k' = 2*DELTA*|u|: max at "
    "the tails, 0 at the median), chosen over the classic asin k1 "
    "because it evaluates in EXACT integer arithmetic — no libm call "
    "whose 1-ulp divergence could flip a floor() at a centroid "
    "boundary. Pass 1 histograms cents into 64-KiB buckets (one "
    "combinable keyed agg); a window over the BOUNDED bucket list "
    "yields exact integer mid-ranks m2/2 = prev + c/2; each bucket's "
    "centroid id is floor((DELTA/2)*(a*|a| + den^2)/den^2) with "
    "a = m2 - den, den = 2n — numerator >= 0 since a >= -den, so "
    "truncating div == floor in both engines (Spark decimal(15) "
    "operands keep the product chain at precision 35 <= 38; the "
    "oracle uses HUGEINT, BIGINT-cast on output). Per centroid the "
    "digest stores weight, [lo, hi] key range, and exact-decimal-sum "
    "mean. Assignment is monotonic in q, so centroids tile the sorted "
    "key range contiguously — the rank-r value provably lies inside "
    "the covering centroid's [lo, hi] (pinned in "
    "tests/test_round8_analytics.py). At 100 TB: one keyed agg + one "
    "bounded window + one bounded agg, all-integer until the final "
    "renderings; supports n <= 5e14 rows per group before the "
    "decimal(15) cast saturates.",
)
def orders_tdigest_sketch(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    h = (
        o.withColumn(
            "bucket", F.expr(f"cents div {_TD_BUCKET}").cast("long")
        )
        .groupBy("pri", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.col("cents").cast("decimal(28,0)")).alias("s"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )
    wc = (
        Window.partitionBy("pri")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("pri")
    z = (
        h.withColumn("cum", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wn))
        .withColumn("m2", 2 * (F.col("cum") - F.col("c")) + F.col("c"))
        .withColumn("den", (2 * F.col("n")).cast("decimal(15,0)"))
        .withColumn(
            "a", (F.col("m2") - 2 * F.col("n")).cast("decimal(15,0)")
        )
    )
    num = F.lit(_TD_DELTA // 2).cast("decimal(2,0)") * (
        F.col("a") * F.abs(F.col("a")) + F.col("den") * F.col("den")
    )
    cz = z.withColumn("num", num).withColumn(
        "centroid", F.expr("num div (den * den)").cast("long")
    )
    return (
        cz.groupBy("pri", "centroid")
        .agg(
            F.sum("c").cast("long").alias("weight"),
            F.min("lo").alias("_lo"),
            F.max("hi").alias("_hi"),
            F.sum("s").alias("_s"),
        )
        .select(
            F.col("pri").alias("o_orderpriority"),
            "centroid",
            "weight",
            F.round(F.col("_lo").cast("double") / 100, 2).alias("lo_value"),
            F.round(F.col("_hi").cast("double") / 100, 2).alias("hi_value"),
            F.round(
                F.col("_s").cast("double") / F.col("weight") / 100, 6
            ).alias("mean_value"),
        )
        .orderBy("o_orderpriority", "centroid")
    )


@register(
    "docs_split_contamination",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks,
        ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 AS b
      FROM documents
    ),
    g AS (
      SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
                  ELSE 'test' END AS split,
        unnest(list_distinct(list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t WHERE len(toks) >= 3
    ),
    sg AS (SELECT DISTINCT split, gram FROM g),
    sizes AS (
      SELECT split, CAST(count(*) AS BIGINT) AS n_grams FROM sg GROUP BY split
    ),
    shared AS (
      SELECT a.split AS split_a, b.split AS split_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sg a JOIN sg b ON b.gram = a.gram AND a.split < b.split
      GROUP BY a.split, b.split
    )
    SELECT split_a, split_b, sa.n_grams AS n_grams_a,
           sb.n_grams AS n_grams_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / least(sa.n_grams, sb.n_grams), 6) AS containment
    FROM shared
    JOIN sizes sa ON sa.split = split_a
    JOIN sizes sb ON sb.split = split_b
    ORDER BY split_a, split_b
    """,
    doc="Cross-SPLIT contamination matrix — docs_split_manifest's "
    "companion check, the audit every training pipeline runs before a "
    "launch: distinct token 3-grams per split (same salted 'splt' md5 "
    "assignment as the manifest, so this measures the ACTUAL declared "
    "splits), pairwise shared-gram counts via one self-equi-join on "
    "gram, and the containment ratio n_shared / min(|A|, |B|) — the "
    "fraction of the smaller (eval) side's grams that also occur in "
    "the other split, i.e. how much of val/test a train-memorizing "
    "model has already seen. Exact integer counts divided once. "
    "Scale: the per-split distinct gram relation is one hash-agg "
    "(vocabulary-bounded growth, not corpus-bounded); the pair join "
    "co-partitions on gram; output is at most 3 rows. Unlike "
    "docs_decontaminate_ngrams (a bounded BROADCAST eval suite "
    "scored per document), both sides here are corpus-scale splits, "
    "so the join must shuffle — the complementary shape.",
)
def docs_split_contamination(spark: SparkSession, sf: str) -> DataFrame:
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
    toks = T.tokens(F.col("text"))
    d = (
        table(spark, sf, "documents")
        .select(split.alias("split"), toks.alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    sg = (
        d.select(
            "split",
            F.explode(
                F.array_distinct(_ngram_array(F.col("toks"), 3))
            ).alias("gram"),
        )
        .distinct()
    )
    sizes = sg.groupBy("split").agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    a = sg.alias("a")
    bb = sg.alias("b")
    shared = (
        a.join(
            bb,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.split") < F.col("b.split")),
        )
        .groupBy(
            F.col("a.split").alias("split_a"), F.col("b.split").alias("split_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("split").alias("split_a"), F.col("n_grams").alias("n_grams_a")
    )
    sb = sizes.select(
        F.col("split").alias("split_b"), F.col("n_grams").alias("n_grams_b")
    )
    return (
        shared.join(sa, "split_a")
        .join(sb, "split_b")
        .select(
            "split_a",
            "split_b",
            "n_grams_a",
            "n_grams_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n_grams_a", "n_grams_b"),
                6,
            ).alias("containment"),
        )
        .orderBy("split_a", "split_b")
    )


@register(
    "orders_tdigest_merge",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS pri, o_orderkey % 4 AS shard,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    sh AS (
      SELECT pri, shard, cents // {_TD_BUCKET} AS bucket,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(cents) AS HUGEINT) AS s,
             min(cents) AS lo, max(cents) AS hi
      FROM o GROUP BY pri, shard, bucket
    ),
    h AS (
      SELECT pri, bucket,
             CAST(sum(c) AS BIGINT) AS c,
             CAST(sum(s) AS HUGEINT) AS s,
             min(lo) AS lo, max(hi) AS hi,
             CAST(count(*) AS BIGINT) AS n_shards
      FROM sh GROUP BY pri, bucket
    ),
    w AS (
      SELECT *,
             sum(c) OVER (PARTITION BY pri ORDER BY bucket) AS cum,
             sum(c) OVER (PARTITION BY pri) AS n
      FROM h
    ),
    z AS (
      SELECT *, CAST(2 * (cum - c) + c AS HUGEINT) AS m2,
             CAST(2 * n AS HUGEINT) AS den
      FROM w
    ),
    cz AS (
      SELECT *, CAST(
        (CAST({_TD_DELTA // 2} AS HUGEINT)
          * ((m2 - den) * abs(m2 - den) + den * den)) // (den * den)
        AS BIGINT) AS centroid
      FROM z
    )
    SELECT pri AS o_orderpriority, centroid,
           CAST(sum(c) AS BIGINT) AS weight,
           CAST(max(n_shards) AS BIGINT) AS max_bucket_shards,
           round(CAST(min(lo) AS DOUBLE) / 100, 2) AS lo_value,
           round(CAST(max(hi) AS DOUBLE) / 100, 2) AS hi_value,
           round(CAST(sum(s) AS DOUBLE) / CAST(sum(c) AS BIGINT) / 100, 6)
             AS mean_value
    FROM cz GROUP BY pri, centroid
    ORDER BY o_orderpriority, centroid
    """,
    doc="t-digest MERGE — the quantile sibling of dedup_hll_merge / "
    "text_cms_merge, with the honest mergeability statement: centroid "
    "ids depend on GLOBAL ranks, so merging finished digests could "
    "only be definitionally equal; what IS a mergeable sketch is the "
    "digest's pass-1 state, the 64-KiB-bucket histogram (c, Σcents, "
    "lo, hi per bucket — all combinable: sums, min, max over GLOBAL "
    "bucket boundaries). This entry builds that state PER SHARD "
    "(o_orderkey % 4 — the artifacts a 1000-executor tree would "
    "emit), merges the four histograms AS DATA, re-runs the identical "
    "integer-exact clustering on the merged state, and emits the "
    "digest — which equals orders_tdigest_sketch's single-pass output "
    "row-for-row (pinned in tests/test_round8_analytics.py; "
    "max_bucket_shards documents that buckets genuinely straddle "
    "shards, so the merge is not vacuous). Same DECIMAL/HUGEINT "
    "arithmetic discipline as the single-pass entry.",
)
def orders_tdigest_merge(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_orderkey") % 4).alias("shard"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    sh = (
        o.withColumn(
            "bucket", F.expr(f"cents div {_TD_BUCKET}").cast("long")
        )
        .groupBy("pri", "shard", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.col("cents").cast("decimal(28,0)")).alias("s"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )
    h = sh.groupBy("pri", "bucket").agg(
        F.sum("c").cast("long").alias("c"),
        F.sum("s").alias("s"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n_shards"),
    )
    wc = (
        Window.partitionBy("pri")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("pri")
    z = (
        h.withColumn("cum", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wn))
        .withColumn("m2", 2 * (F.col("cum") - F.col("c")) + F.col("c"))
        .withColumn("den", (2 * F.col("n")).cast("decimal(15,0)"))
        .withColumn(
            "a", (F.col("m2") - 2 * F.col("n")).cast("decimal(15,0)")
        )
    )
    num = F.lit(_TD_DELTA // 2).cast("decimal(2,0)") * (
        F.col("a") * F.abs(F.col("a")) + F.col("den") * F.col("den")
    )
    cz = z.withColumn("num", num).withColumn(
        "centroid", F.expr("num div (den * den)").cast("long")
    )
    return (
        cz.groupBy("pri", "centroid")
        .agg(
            F.sum("c").cast("long").alias("weight"),
            F.max("n_shards").cast("long").alias("max_bucket_shards"),
            F.min("lo").alias("_lo"),
            F.max("hi").alias("_hi"),
            F.sum("s").alias("_s"),
        )
        .select(
            F.col("pri").alias("o_orderpriority"),
            "centroid",
            "weight",
            "max_bucket_shards",
            F.round(F.col("_lo").cast("double") / 100, 2).alias("lo_value"),
            F.round(F.col("_hi").cast("double") / 100, 2).alias("hi_value"),
            F.round(
                F.col("_s").cast("double") / F.col("weight") / 100, 6
            ).alias("mean_value"),
        )
        .orderBy("o_orderpriority", "centroid")
    )


_CUPED_SPLIT = "2024-01-16"


@register(
    "events_cuped_adjustment",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
        ('0x' || substr(md5('cuped' || user_id), 1, 12))::BIGINT % 2 AS arm,
        CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                AND ts < TIMESTAMP '{_CUPED_SPLIT}'
                          THEN CAST(value AS DECIMAL(18,4)) END), 0)
             AS DECIMAL(18,4)) AS x,
        CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                AND ts >= TIMESTAMP '{_CUPED_SPLIT}'
                          THEN CAST(value AS DECIMAL(18,4)) END), 0)
             AS DECIMAL(18,4)) AS y
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        CAST(sum(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
        CAST(sum(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      FROM u
    ),
    th AS (
      SELECT n, sx / n AS mx,
        CASE WHEN sxx - sx * sx / n > 0
             THEN (sxy - sx * sy / n) / (sxx - sx * sx / n)
             ELSE 0 END AS theta
      FROM g
    ),
    a AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        CAST(sum(x) AS DOUBLE) AS asx, CAST(sum(y) AS DOUBLE) AS asy,
        CAST(sum(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS asxx,
        CAST(sum(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS asyy,
        CAST(sum(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS asxy
      FROM u GROUP BY arm
    )
    SELECT CAST(arm AS BIGINT) AS arm, n_users,
      asy / n_users AS mean_y,
      asy / n_users - theta * (asx / n_users - mx) AS mean_y_adj,
      asyy / n_users - (asy / n_users) * (asy / n_users) AS var_y,
      (asyy / n_users - (asy / n_users) * (asy / n_users))
        - 2 * theta * (asxy / n_users - (asx / n_users) * (asy / n_users))
        + theta * theta
          * (asxx / n_users - (asx / n_users) * (asx / n_users)) AS var_y_adj
    FROM a, th ORDER BY arm
    """,
    doc="CUPED variance-reduced A/B readout (Deng et al., 'Improving "
    "the sensitivity of online controlled experiments') — the "
    "experiment-analysis operator a 100-TB events warehouse serves "
    "constantly: users hash-assign to arms (salt 'cuped' — "
    "independent of every other salted draw), X = pre-period per-user "
    "purchase value, Y = metric-period value, theta = cov(X,Y)/var(X) "
    "pooled, and the adjusted metric Y' = Y - theta (X - mean X). "
    "ARITHMETIC DISCIPLINE: per-event values cast to DECIMAL(18,4) "
    "BEFORE summing, per-user cross-moments as DECIMAL(38,8) — every "
    "aggregation is exact and order-invariant; both arms' adjusted "
    "mean and variance come from the CLOSED FORMS over those moments "
    "(mean_y_adj = mean_y - theta (mean_x_arm - mean_x); var_y_adj = "
    "var_y - 2 theta cov + theta^2 var_x), so no per-user float "
    "vector is ever materialized or re-aggregated, and the output "
    "doubles are identical scalar algebra in both engines — no "
    "round() anywhere. The variance-reduction guarantee (pooled "
    "var(Y') <= var(Y)) is pinned in pytest. Scale shape: one keyed "
    "agg over events, one 2-group agg, two 1-row scalar broadcasts.",
)
def events_cuped_adjustment(spark: SparkSession, sf: str) -> DataFrame:
    is_purchase = F.col("event_type") == "purchase"
    pre = F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp")
    dec = F.col("value").cast("decimal(18,4)")
    u = (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_purchase & pre, dec)), F.lit(0)
            )
            .cast("decimal(18,4)")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(is_purchase & ~pre, dec)), F.lit(0)
            )
            .cast("decimal(18,4)")
            .alias("y"),
        )
        .select(
            (
                T.portable_hash64(
                    F.concat(F.lit("cuped"), F.col("user_id").cast("string"))
                )
                % 2
            ).alias("arm"),
            "x",
            "y",
        )
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxy"),
    )
    th = g.select(
        (F.col("sx") / F.col("n")).alias("mx"),
        F.when(
            F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n") > 0,
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
        )
        .otherwise(F.lit(0.0))
        .alias("theta"),
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("double").alias("asx"),
        F.sum("y").cast("double").alias("asy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)"))
        .cast("double")
        .alias("asxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,8)"))
        .cast("double")
        .alias("asyy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)"))
        .cast("double")
        .alias("asxy"),
    )
    mxa = F.col("asx") / F.col("n_users")
    mya = F.col("asy") / F.col("n_users")
    var_y = F.col("asyy") / F.col("n_users") - mya * mya
    cov_a = F.col("asxy") / F.col("n_users") - mxa * mya
    var_xa = F.col("asxx") / F.col("n_users") - mxa * mxa
    th_ = F.col("theta")
    return (
        a.crossJoin(F.broadcast(th))
        .select(
            F.col("arm").cast("long").alias("arm"),
            "n_users",
            mya.alias("mean_y"),
            (mya - th_ * (mxa - F.col("mx"))).alias("mean_y_adj"),
            var_y.alias("var_y"),
            (var_y - 2 * th_ * cov_a + th_ * th_ * var_xa).alias(
                "var_y_adj"
            ),
        )
        .orderBy("arm")
    )


@register(
    "events_next_match_veto",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type,
        min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
        ) AS next_purchase,
        min(CASE WHEN event_type = 'error' THEN ts END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
        ) AS next_error
      FROM events
    ),
    c AS (
      SELECT user_id,
        CASE
          WHEN next_purchase IS NULL
            OR next_purchase > ts + INTERVAL 24 HOUR THEN 'expired'
          WHEN next_error IS NOT NULL AND next_error < next_purchase
            THEN 'vetoed'
          ELSE 'clean' END AS outcome
      FROM ev WHERE event_type = 'click'
    )
    SELECT user_id,
      CAST(count(*) AS BIGINT) AS n_clicks,
      CAST(sum(CASE WHEN outcome = 'clean' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clean,
      CAST(sum(CASE WHEN outcome = 'vetoed' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_vetoed,
      CAST(sum(CASE WHEN outcome = 'expired' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_expired
    FROM c GROUP BY user_id ORDER BY user_id
    """,
    doc="Sequence-pattern detection with a VETO event — the "
    "MATCH_RECOGNIZE shape ('A then B within gap, unless C "
    "intervenes') that funnels and fraud rules need, expressed as "
    "pure per-user ordered WINDOW functions: for every click, the "
    "next purchase and next error timestamps come from two "
    "min-over-following windows on the (user, ts, event_id) order, "
    "and the click classifies as clean (purchase within 24 h, no "
    "earlier error), vetoed (an error lands strictly between click "
    "and the matching purchase), or expired. First-match semantics "
    "and the event_id tie-break make the classification a pure "
    "function of the event set. Scale shape: NO self-join and no "
    "per-event explode — one user-partitioned sort-window pass "
    "computes both next-event columns for every click at once (the "
    "ordered-window form of an as-of join), then one keyed agg. "
    "Per-user integer counts only; nothing continuous.",
)
def events_next_match_veto(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ev = table(spark, sf, "events").select(
        "user_id",
        "ts",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        )
        .over(w)
        .alias("next_purchase"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts")))
        .over(w)
        .alias("next_error"),
    )
    deadline = F.col("ts") + F.expr("INTERVAL 24 HOURS")
    outcome = (
        F.when(
            F.col("next_purchase").isNull()
            | (F.col("next_purchase") > deadline),
            F.lit("expired"),
        )
        .when(
            F.col("next_error").isNotNull()
            & (F.col("next_error") < F.col("next_purchase")),
            F.lit("vetoed"),
        )
        .otherwise(F.lit("clean"))
    )
    return (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", outcome.alias("outcome"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clicks"),
            F.sum(F.when(F.col("outcome") == "clean", 1).otherwise(0))
            .cast("long")
            .alias("n_clean"),
            F.sum(F.when(F.col("outcome") == "vetoed", 1).otherwise(0))
            .cast("long")
            .alias("n_vetoed"),
            F.sum(F.when(F.col("outcome") == "expired", 1).otherwise(0))
            .cast("long")
            .alias("n_expired"),
        )
        .orderBy("user_id")
    )


_KANON_KS = (2, 5, 10)


@register(
    "customer_kanon_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS sz
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    tot AS (
      SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups
      FROM g
    )
    SELECT * FROM (
      {" UNION ALL ".join(
        f"SELECT {k} AS k, tot.n_groups, tot.n_rows,"
        f" CAST(coalesce(sum(CASE WHEN sz < {k} THEN 1 END), 0) AS BIGINT)"
        f"   AS groups_below,"
        f" CAST(coalesce(sum(CASE WHEN sz < {k} THEN sz END), 0) AS BIGINT)"
        f"   AS rows_below,"
        f" CAST((1000000 * coalesce(sum(CASE WHEN sz < {k} THEN sz END), 0))"
        f"   // tot.n_rows AS BIGINT) AS rows_below_ppm"
        f" FROM g, tot GROUP BY tot.n_groups, tot.n_rows"
        for k in _KANON_KS
      )}
    ) ORDER BY k
    """,
    doc="k-ANONYMITY audit over quasi-identifiers — the data-"
    "governance gate a 100-TB release pipeline runs before "
    "publishing: customers group by the quasi-identifier pair "
    "(nation, market segment), and for each k in "
    f"{{{', '.join(str(k) for k in _KANON_KS)}}} the audit counts "
    "equivalence classes smaller than k and the rows inside them — "
    "the re-identifiable population a k-anonymous release would have "
    "to suppress or generalize. All integer arithmetic (exact ppm "
    "share, positive-operand floor). Scale shape: ONE keyed agg over "
    "the table builds the class-size relation (bounded by the "
    "quasi-identifier domain, not the row count); every k-threshold "
    "row aggregates that bounded relation with a 1-row totals "
    "broadcast.",
)
def customer_kanon_audit(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        table(spark, sf, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("sz"))
    )
    tot = g.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    rows = []
    for k in _KANON_KS:
        below = F.col("sz") < k
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
                F.lit(k).cast("long").alias("k"),
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
    return out.orderBy("k")


@register(
    "orders_trimmed_mean",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS priority,
        CAST(o_totalprice AS DECIMAL(18,4)) AS p,
        row_number() OVER (
          PARTITION BY o_orderpriority
          ORDER BY o_totalprice, o_orderkey
        ) AS rk,
        count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT priority,
      CAST(max(n) AS BIGINT) AS n_orders,
      CAST(max(n) - 2 * (max(n) // 10) AS BIGINT) AS n_kept,
      CAST(round(sum(p) / max(n), 4) AS DOUBLE) AS mean_raw,
      CAST(round(
        sum(CASE WHEN rk > n // 10 AND rk <= n - n // 10 THEN p END)
          / (max(n) - 2 * (max(n) // 10)), 4) AS DOUBLE) AS mean_trimmed
    FROM r GROUP BY priority ORDER BY priority
    """,
    doc="10% TRIMMED MEAN per order priority — the robust-statistics "
    "operator dashboards want when a handful of whale orders drag the "
    "raw mean: per group, rows rank by (price, orderkey) — the "
    "orderkey tie-break makes the trimmed SET a pure function of the "
    "data — and exactly floor(n/10) rows drop from EACH tail (integer "
    "counts, never a float quantile boundary). Prices enter as "
    "DECIMAL(18,4), both sums are exact and order-invariant, and each "
    "mean is one DECIMAL division rounded once at the decimal level "
    "(round on DECIMAL is exact digit arithmetic, not float — no "
    "half-way-boundary hazard) then cast to double. Scale shape: one "
    "group-partitioned rank window + one keyed agg; no global sort.",
)
def orders_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    r = table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("p"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    keep = (F.col("rk") > F.expr("n div 10")) & (
        F.col("rk") <= F.col("n") - F.expr("n div 10")
    )
    return (
        r.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            (F.max("n") - 2 * F.expr("max(n) div 10"))
            .cast("long")
            .alias("n_kept"),
            F.round(
                F.sum("p") / F.max("n"), 4
            )
            .cast("double")
            .alias("mean_raw"),
            F.round(
                F.sum(F.when(keep, F.col("p")))
                / (F.max("n") - 2 * F.expr("max(n) div 10")),
                4,
            )
            .cast("double")
            .alias("mean_trimmed"),
        )
        .orderBy("priority")
    )


_GAP_MINUTES = (5, 30, 120)


@register(
    "events_session_gap_curve",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
        date_diff('second',
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
          ts) AS gap_s
      FROM events
    ),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM g)
    SELECT * FROM (
      {" UNION ALL ".join(
        f"SELECT {m} AS gap_minutes,"
        f" CAST(count(DISTINCT user_id)"
        f"   + sum(CASE WHEN gap_s > {m * 60} THEN 1 ELSE 0 END) AS BIGINT)"
        f"   AS n_sessions,"
        f" (SELECT n_users FROM u) AS n_users,"
        f" CAST((1000000 * (count(DISTINCT user_id)"
        f"   + sum(CASE WHEN gap_s > {m * 60} THEN 1 ELSE 0 END)))"
        f"   // (SELECT n_users FROM u) AS BIGINT) AS sessions_per_user_ppm"
        f" FROM g"
        for m in _GAP_MINUTES
      )}
    ) ORDER BY gap_minutes
    """,
    doc="SESSIONIZATION OPERATING CURVE — how the session count moves "
    "with the inactivity threshold (the knob every sessionizer has to "
    f"pick): for each gap in {{{', '.join(str(m) for m in _GAP_MINUTES)}}} "
    "minutes, a user's session count is 1 + (inter-event gaps "
    "exceeding the threshold), so the whole curve needs ONE lag-window "
    "pass over (user, ts, event_id) order and one conditional count "
    "per threshold — no re-sessionization per knob value, no "
    "session-id materialization at all (the gaps-and-islands identity "
    "n_sessions = n_users + n_breaks). Integer counts and an exact "
    "ppm sessions-per-user ratio; gaps in whole seconds (timestamp "
    "difference is exact integer microseconds, so second truncation "
    "is engine-invariant). Monotonicity (larger gap => fewer "
    "sessions, floor n_users) is pinned in pytest. Scale shape: one "
    "user-partitioned sort window + per-threshold combinable aggs.",
)
def events_session_gap_curve(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = table(spark, sf, "events").select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )
    rows = []
    for m in _GAP_MINUTES:
        rows.append(
            g.agg(
                F.lit(m).cast("long").alias("gap_minutes"),
                (
                    F.countDistinct("user_id")
                    + F.sum(
                        F.when(F.col("gap_s") > m * 60, 1).otherwise(0)
                    )
                )
                .cast("long")
                .alias("n_sessions"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            ).select(
                "gap_minutes",
                "n_sessions",
                "n_users",
                F.expr(
                    "CAST((1000000 * n_sessions) div n_users AS BIGINT)"
                ).alias("sessions_per_user_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("gap_minutes")


@register(
    "docs_val_novelty",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS} AS toks,
        ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 AS b
      FROM documents
    ),
    tr AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
        range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t WHERE b < 8 AND len(toks) >= 3
    ),
    vg AS (
      SELECT doc_id, source,
        unnest(list_distinct(list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
      FROM t WHERE b = 8 AND len(toks) >= 3
    ),
    pd AS (
      SELECT doc_id, source,
        CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN tr.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unseen
      FROM vg LEFT JOIN tr ON tr.gram = vg.gram
      GROUP BY doc_id, source
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_grams) AS BIGINT) AS n_grams,
      CAST(sum(n_unseen) AS BIGINT) AS n_unseen,
      CAST((1000000 * sum(n_unseen)) // sum(n_grams) AS BIGINT)
        AS novelty_ppm,
      CAST(sum(CASE WHEN n_unseen = n_grams THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_fully_novel
    FROM pd GROUP BY source ORDER BY source
    """,
    doc="Per-source VAL-split NOVELTY vs the train gram set — the "
    "per-document memorization audit that complements "
    "docs_split_contamination's 3-row split matrix: each val "
    "document's distinct token 3-grams probe the train split's "
    "distinct-gram relation (left join on gram), n_unseen/n_grams is "
    "that document's novelty, and the per-source rollup reports exact "
    "integer gram totals, an exact ppm novelty share, and how many "
    "documents are fully novel (no 3-gram ever seen in train) — low "
    "novelty for a source means its val docs are near-duplicates of "
    "training text and will overstate model quality. Uses the same "
    "salted-'splt' split as the manifest so it audits the DECLARED "
    "splits. Scale: the train gram relation is one distinct hash-agg "
    "(vocabulary-bounded); the probe is a gram-keyed equi-join; all "
    "outputs integer.",
)
def docs_val_novelty(spark: SparkSession, sf: str) -> DataFrame:
    b = (
        T.portable_hash64(
            F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
        )
        % 10
    )
    toks = T.tokens(F.col("text"))
    base = (
        table(spark, sf, "documents")
        .select("doc_id", "source", toks.alias("toks"), b.alias("b"))
        .filter(F.size("toks") >= 3)
    )
    tr = (
        base.filter(F.col("b") < 8)
        .select(
            F.explode(
                F.array_distinct(_ngram_array(F.col("toks"), 3))
            ).alias("gram")
        )
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    vg = base.filter(F.col("b") == 8).select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_ngram_array(F.col("toks"), 3))).alias(
            "gram"
        ),
    )
    pd_ = (
        vg.join(tr, "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unseen"),
        )
    )
    return (
        pd_.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_unseen").cast("long").alias("n_unseen"),
            F.sum(
                F.when(F.col("n_unseen") == F.col("n_grams"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("docs_fully_novel"),
        )
        .select(
            "source",
            "n_docs",
            "n_grams",
            "n_unseen",
            F.expr(
                "CAST((1000000 * n_unseen) div n_grams AS BIGINT)"
            ).alias("novelty_ppm"),
            "docs_fully_novel",
        )
        .orderBy("source")
    )


@register(
    "events_conversion_latency_quantiles",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_type,
        min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
        ) AS next_purchase
      FROM events
    ),
    lat AS (
      SELECT date_diff('second', ts, next_purchase) AS latency_s
      FROM ev
      WHERE event_type = 'click' AND next_purchase IS NOT NULL
        AND next_purchase <= ts + INTERVAL 24 HOUR
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lat),
    r AS (
      SELECT latency_s,
        row_number() OVER (ORDER BY latency_s) AS rn
      FROM lat
    ),
    q(q_label, num, den) AS (
      VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
    ),
    t AS (
      SELECT q.q_label, (q.num * n.n + q.den - 1) // q.den AS rank, n.n
      FROM n CROSS JOIN q
    )
    SELECT t.q_label, t.n AS n_conversions,
      CAST(t.rank AS BIGINT) AS rank,
      CAST(r.latency_s AS BIGINT) AS latency_s
    FROM t JOIN r ON r.rn = t.rank
    ORDER BY q_label
    """,
    doc="EXACT click-to-purchase latency quantiles (p50/p90/p99, "
    "type-1 lower quantile at rank ceil(q*n)) — the funnel-health "
    "number product teams watch, derived from the SAME "
    "next-purchase-within-24h window as events_next_match_veto (one "
    "min-over-following pass, no self-join). The Spark side runs the "
    "orders_quantile_histogram two-pass algorithm: pass 1 histograms "
    "whole-second latencies into 4096-second buckets (combinable "
    "agg; the bucket relation is VALUE-bounded — at a 24 h cap it is "
    "at most 22 buckets no matter how many clicks), the cumulative "
    "window over that bounded relation locates each quantile's "
    "bucket, and pass 2 ranks ONLY the target buckets' rows. The "
    "oracle brute-sorts globally — different algorithm, identical "
    "exact answer. Ranks are pure integer arithmetic; latencies are "
    "exact whole seconds; no floats anywhere.",
)
def events_conversion_latency_quantiles(
    spark: SparkSession, sf: str
) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ev = table(spark, sf, "events").select(
        "ts",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        )
        .over(w)
        .alias("next_purchase"),
    )
    lat = (
        ev.filter(
            (F.col("event_type") == "click")
            & F.col("next_purchase").isNotNull()
            & (
                F.col("next_purchase")
                <= F.col("ts") + F.expr("INTERVAL 24 HOURS")
            )
        )
        .select(
            (
                F.unix_timestamp("next_purchase") - F.unix_timestamp("ts")
            ).alias("latency_s")
        )
    )
    b = lat.withColumn(
        "bucket", F.expr("latency_s div 4096").cast("long")
    )
    hist = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy(F.lit(1)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "prev", F.col("cum") - F.col("c")
    )
    n = hist.agg(F.sum("c").cast("long").alias("n"))
    qdf = spark.createDataFrame(
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)],
        "q_label string, num long, den long",
    )
    t = n.crossJoin(F.broadcast(qdf)).select(
        "q_label",
        "n",
        F.expr("(num * n + den - 1) div den").alias("rank"),
    )
    tb = t.join(F.broadcast(cum), how="cross").filter(
        (F.col("prev") < F.col("rank")) & (F.col("rank") <= F.col("cum"))
    )
    cand = b.join(
        F.broadcast(tb.select("bucket", "q_label", "n", "rank", "prev")),
        ["bucket"],
    )
    wv = Window.partitionBy("q_label").orderBy("latency_s")
    val = cand.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") == F.col("rank") - F.col("prev")
    )
    return val.select(
        "q_label",
        F.col("n").cast("long").alias("n_conversions"),
        F.col("rank").cast("long").alias("rank"),
        F.col("latency_s").cast("long").alias("latency_s"),
    ).orderBy("q_label")


_PARETO_PCTS = (1, 10, 50)


@register(
    "orders_pareto_share",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey,
        CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS cents
      FROM orders GROUP BY o_custkey
    ),
    n AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total
      FROM c
    ),
    r AS (
      SELECT cents,
        row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn
      FROM c
    ),
    q(p_pct) AS (VALUES {", ".join(f"({p})" for p in _PARETO_PCTS)}),
    t AS (
      SELECT q.p_pct, n.n, n.total,
        (q.p_pct * n.n + 99) // 100 AS k
      FROM n CROSS JOIN q
    )
    SELECT CAST(t.p_pct AS BIGINT) AS p_pct,
      t.n AS n_customers, CAST(t.k AS BIGINT) AS k_top,
      CAST(sum(r.cents) AS BIGINT) AS top_cents,
      t.total AS total_cents,
      CAST((1000000 * sum(r.cents)) // t.total AS BIGINT) AS share_ppm
    FROM t JOIN r ON r.rn <= t.k
    GROUP BY t.p_pct, t.n, t.total, t.k
    ORDER BY p_pct
    """,
    doc="REVENUE CONCENTRATION (Pareto share): the share of total "
    "order revenue held by the top 1% / 10% / 50% of customers — the "
    "whale-dependence number every revenue dashboard carries. The "
    "Spark side never sorts globally: per-customer revenue (exact "
    "BIGINT cents) buckets into 2^24-cent bins (VALUE-bounded "
    "relation), a cumulative window over the DESCENDING bucket list "
    "locates the bucket holding rank k = ceil(p%% x n), pass 2 ranks "
    "only that bucket to find the k-th largest revenue thr, and the "
    "exact top-k sum is sum(cents > thr) + (k - count(cents > thr)) "
    "x thr — the tie-closure identity that makes the answer "
    "independent of WHICH tied customers are counted, so it equals "
    "the oracle's brute rank-k sum exactly. All integer arithmetic "
    "(exact ppm share). Scale shape: one keyed agg to the customer "
    "relation; the histogram/threshold machinery touches only the "
    "bounded bucket list plus one target bucket per percentile.",
)
def orders_pareto_share(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    n = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    b = c.withColumn(
        "bucket", F.expr("cents div 16777216").cast("long")
    )
    hist = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.partitionBy(F.lit(1)).orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "prev", F.col("cum") - F.col("cnt")
    )
    qdf = spark.createDataFrame(
        [(p,) for p in _PARETO_PCTS], "p_pct long"
    )
    t = n.crossJoin(F.broadcast(qdf)).select(
        "p_pct",
        "n",
        "total",
        F.expr("(p_pct * n + 99) div 100").alias("k"),
    )
    tb = t.join(F.broadcast(cum), how="cross").filter(
        (F.col("prev") < F.col("k")) & (F.col("k") <= F.col("cum"))
    )
    cand = b.join(
        F.broadcast(tb.select("bucket", "p_pct", "k", "prev")), ["bucket"]
    )
    wv = Window.partitionBy("p_pct").orderBy(
        F.col("cents").desc(), "o_custkey"
    )
    thr = (
        cand.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == F.col("k") - F.col("prev"))
        .select("p_pct", F.col("cents").alias("thr"))
    )
    above = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("cents") > F.col("thr"))
        .groupBy("p_pct")
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("asum"),
            F.count(F.lit(1)).cast("long").alias("acnt"),
        )
    )
    return (
        t.join(thr, "p_pct")
        .join(above, "p_pct", "left")
        .select(
            F.col("p_pct").cast("long").alias("p_pct"),
            F.col("n").alias("n_customers"),
            F.col("k").cast("long").alias("k_top"),
            (
                F.coalesce(F.col("asum"), F.lit(0))
                + (F.col("k") - F.coalesce(F.col("acnt"), F.lit(0)))
                * F.col("thr")
            )
            .cast("long")
            .alias("top_cents"),
            F.col("total").alias("total_cents"),
            # 1e6 x top_cents overflows BIGINT at large SFs (Spark ANSI
            # throws where DuckDB silently widens to HUGEINT) — route
            # the product through DECIMAL(38,0).
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (coalesce(asum, 0) + (k - coalesce(acnt, 0)) * thr))"
                " div total AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("p_pct")
    )
