"""Corpus-analytics catalog entries (Batch 5, round 4): dedup
materialization, stratified sampling, interval featurization, user
featurization, co-purchase lift, embedding-norm outliers, and bigram
novelty over the documents/orders/events tables.

Split out of analytics_queries.py at the round-10 verdict's 2k-line
module bar (pure line-range move — entry semantics, oracles, and
registry names unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.relational.catalog import register, table

# ---------------------------------------------------------------------------
# Batch 5 (round 4): dedup materialization, stratified sampling,
# interval featurization, bigram novelty
# ---------------------------------------------------------------------------

# Shared normalized-token fragment (DuckDB side) — THE llm_queries TOKS
# macro (one definition; a private copy here would silently desync from
# functions/text.py's TOKEN_SPLIT_RE pipeline).
from graphdatabases_spark.relational.llm_queries import TOKS as _TOKS  # noqa: E402


@register(
    "dedup_keep_first_normalized",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             sha256(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
               AS sig
      FROM documents
    )
    SELECT min(doc_id) AS keeper, count(*) AS n_docs
    FROM t GROUP BY sig HAVING count(*) > 1
    ORDER BY keeper
    """,
    doc="Normalize-then-keep-first dedup MATERIALIZATION: documents "
    "sharing a normalized bag-of-words signature (lowercase, strip "
    "punctuation, sorted distinct tokens, sha256) collapse to the "
    "lowest doc_id — the canonical exact-dedup-after-normalization "
    "step that runs before near-dup passes. One map-side-combinable "
    "hash aggregation keyed on the 32-byte signature; no windows, no "
    "joins — the same plan at 100 TB.",
)
def dedup_keep_first_normalized(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.array_sort(T.distinct_tokens(F.col("text")))
    sig = F.sha2(F.array_join(toks, " "), 256)
    return (
        table(spark, sf, "documents")
        .select(F.col("doc_id"), sig.alias("sig"))
        .groupBy("sig")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("keeper", "n_docs")
        .orderBy("keeper")
    )


@register(
    "docs_stratified_sample",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           CAST(count(*) FILTER (
             WHERE (lang = 'en' AND doc_id % 10 = 0)
                OR (lang <> 'en' AND doc_id % 10 < 2)
           ) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
    doc="Deterministic per-stratum sampling (majority language 'en' at "
    "10%, minority languages at 20% via key-mod) — the language-"
    "rebalancing primitive for multilingual training mixes. Key-mod "
    "membership is reproducible across engines, runs, and "
    "partitionings (unlike rand()-based sampling); the whole check is "
    "one combinable aggregation over the corpus.",
)
def docs_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    in_sample = (
        (F.col("lang") == "en") & (F.col("doc_id") % 10 == 0)
    ) | ((F.col("lang") != "en") & (F.col("doc_id") % 10 < 2))
    return (
        table(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(in_sample).alias("n_sampled"),
        )
        .orderBy("lang")
    )


@register(
    "orders_repeat_intervals",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(CAST(o_orderdate AS DATE)) OVER (
                         PARTITION BY o_custkey
                         ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                       ),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    ),
    b AS (
      SELECT o_custkey,
             CASE WHEN gap_days <= 7 THEN '0-7'
                  WHEN gap_days <= 30 THEN '8-30'
                  WHEN gap_days <= 90 THEN '31-90'
                  ELSE '91+' END AS gap_bucket
      FROM seq WHERE gap_days IS NOT NULL
    )
    SELECT gap_bucket,
           count(*) AS n_gaps,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM b GROUP BY gap_bucket ORDER BY gap_bucket
    """,
    doc="Repeat-purchase interval featurization: per-customer "
    "consecutive-order gaps (lag window keyed on the customer — the "
    "natural partition key, so the single window shuffle scales) "
    "bucketed into recency bands — the inter-arrival feature behind "
    "churn/LTV training sets. Output is the bounded bucket histogram.",
)
def orders_repeat_intervals(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    gap = F.datediff(
        F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
    )
    bucket = (
        F.when(F.col("gap_days") <= 7, "0-7")
        .when(F.col("gap_days") <= 30, "8-30")
        .when(F.col("gap_days") <= 90, "31-90")
        .otherwise("91+")
    )
    return (
        table(spark, sf, "orders")
        .select("o_custkey", gap.alias("gap_days"))
        .filter(F.col("gap_days").isNotNull())
        .select("o_custkey", bucket.alias("gap_bucket"))
        .groupBy("gap_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("gap_bucket")
    )


@register(
    "events_user_features",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
             AS span_days,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Per-user feature table (event count, type diversity, active "
    "span, decimal-exact value total) — the entity featurization pass "
    "that turns an event log into a training-set row per user. One "
    "combinable aggregation keyed on the natural partition key.",
)
def events_user_features(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias(
                "span_days"
            ),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "copurchase_lift",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    pc AS (SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS together
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT part_a, part_b, together,
           round(CAST(together AS DOUBLE) / n_orders, 6) AS support,
           round(CAST(together AS DOUBLE) / pa.n_part, 6) AS confidence,
           round(CAST(together AS DOUBLE) * n_orders
                 / (CAST(pa.n_part AS DOUBLE) * pb.n_part), 6) AS lift
    FROM pairs
    JOIN pc pa ON pa.l_partkey = part_a
    JOIN pc pb ON pb.l_partkey = part_b
    CROSS JOIN n
    ORDER BY together DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Association-rule metrics (support / confidence / lift) over "
    "part pairs sharing an order — the market-basket operator on top "
    "of the co-purchase self-join. All inputs are exact integer "
    "counts, so the double divisions are engine-identical; the "
    "per-part count table broadcasts against the bounded pair set and "
    "the order total is a broadcast-1-row crossJoin.",
)
def copurchase_lift(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n = F.broadcast(li.agg(F.count_distinct("l_orderkey").alias("n_orders")))
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 2)
    )
    pa = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na"))
    pb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb"))
    t = F.col("together").cast("double")
    return (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(n)
        .select(
            "part_a",
            "part_b",
            "together",
            F.round(t / F.col("n_orders"), 6).alias("support"),
            F.round(t / F.col("na"), 6).alias("confidence"),
            F.round(
                t * F.col("n_orders") / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("together").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "embedding_norm_outliers",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             CAST(sqrt(list_inner_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[]))
                  AS DECIMAL(18,9)) AS nrm
      FROM embeddings
    ),
    s1 AS (
      SELECT count(*) AS n,
             CAST(round(CAST(sum(nrm) AS DOUBLE) / count(*), 6)
                  AS DECIMAL(12,6)) AS c
      FROM v
    ),
    d AS (
      SELECT vec_id, nrm,
             CAST(nrm - c AS DECIMAL(18,9)) AS dev
      FROM v, s1
    ),
    s2 AS (
      SELECT sum(dev) AS m1s, sum(dev * dev) AS m2s FROM d
    ),
    z AS (
      SELECT vec_id, nrm,
             (CAST(dev AS DOUBLE) - CAST(m1s AS DOUBLE) / n)
             / sqrt(CAST(m2s AS DOUBLE) / n
                    - (CAST(m1s AS DOUBLE) / n) * (CAST(m1s AS DOUBLE) / n))
               AS zval
      FROM d, s2, s1
    )
    SELECT vec_id, CAST(round(CAST(nrm AS DOUBLE), 6) AS DOUBLE) AS norm,
           round(zval, 4) AS z
    FROM z WHERE abs(zval) > 2
    ORDER BY vec_id
    """,
    doc="Embedding QA: vectors whose L2 norm is a >2-sigma outlier — "
    "the malformed-embedding detector run before indexing/clustering. "
    "Per-vector norms fold deterministically in index order (bit-"
    "identical across engines) and get cast to DECIMAL so moment sums "
    "are EXACT on any partitioning. Moments are CENTERED on a 6-dp "
    "anchor (round(mean)) before squaring: the raw sum-of-squares "
    "formulation put a large scale-18 decimal through a decimal→double "
    "cast whose rounding differs across engines by an ulp, and with "
    "near-constant norms the variance is pure cancellation — centering "
    "keeps every decimal that crosses into double TINY, so the cast is "
    "well-conditioned and z is engine-identical. Two broadcast stats "
    "rows, shift-invariant z, same output.",
)
def embedding_norm_outliers(spark: SparkSession, sf: str) -> DataFrame:
    v = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    base = table(spark, sf, "embeddings").select(
        "vec_id", F.sqrt(dot).cast("decimal(18,9)").alias("nrm")
    )
    s1 = F.broadcast(
        base.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("nrm").cast("double") / F.count(F.lit(1)), 6)
            .cast("decimal(12,6)")
            .alias("c"),
        )
    )
    d = base.crossJoin(s1).withColumn(
        "dev", (F.col("nrm") - F.col("c")).cast("decimal(18,9)")
    )
    s2 = F.broadcast(
        d.agg(
            F.sum("dev").alias("m1s"),
            F.sum(F.col("dev") * F.col("dev")).alias("m2s"),
        )
    )
    m1 = F.col("m1s").cast("double") / F.col("n")
    var = F.col("m2s").cast("double") / F.col("n") - m1 * m1
    zval = (F.col("dev").cast("double") - m1) / F.sqrt(var)
    return (
        d.crossJoin(s2)
        .withColumn("_z", zval)
        .filter(F.abs(F.col("_z")) > 2)
        .select(
            "vec_id",
            F.round(F.col("nrm").cast("double"), 6).alias("norm"),
            F.round(F.col("_z"), 4).alias("z"),
        )
        .orderBy("vec_id")
    )


@register(
    "text_bigram_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS bg
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
    ),
    top AS (
      SELECT bg FROM (
        SELECT bg, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, bg) AS r
        FROM bg GROUP BY bg
      ) WHERE r <= 100
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(CAST(count(*) FILTER (WHERE top.bg IS NULL) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM bg LEFT JOIN top ON top.bg = bg.bg
    WHERE doc_id <= 100
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Corpus bigram-novelty quality score: fraction of each "
    "document's token bigrams outside the corpus top-100 bigram list — "
    "the boilerplate/template detector (low novelty = templated text). "
    "The top list is bounded (100 rows) and broadcast; the per-doc "
    "pass is one explode + broadcast left join + re-agg on doc_id, so "
    "the corpus never shuffles by bigram except inside the bounded "
    "top-k aggregation.",
)
def text_bigram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents").select(
        "doc_id", T.tokens(F.col("text")).alias("toks")
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    # Top-100 via orderBy+limit (TakeOrderedAndProject — per-partition
    # top-k then a 100-row merge), NOT a global row_number window.
    top = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bg")
        .limit(100)
        .select(F.col("bg").alias("top_bg"))
    )
    return (
        bg.filter(F.col("doc_id") <= 100)
        .join(F.broadcast(top), bg.bg == F.col("top_bg"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.count_if(F.col("top_bg").isNull()).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )




# ---------------------------------------------------------------------------
# Misra-Gries / SpaceSaving heavy hitters (deterministic mergeable counters)
# ---------------------------------------------------------------------------

_MG_S = 4    # shards (the per-executor summary analogy)
_MG_K = 8    # counters per shard summary (fixture vocab is 31
             # distinct tokens, so K=8 makes compression REAL: thr > 0)
_MG_TOP = 12  # served heavy hitters


@register(
    "docs_token_mg_hitters",
    oracle=f"""
    WITH tok0 AS MATERIALIZED (
      SELECT doc_id % {_MG_S} AS shard, unnest({_TOKS}) AS token
      FROM documents WHERE text IS NOT NULL
    ),
    tok AS MATERIALIZED (
      SELECT shard, token,
        CASE WHEN ('0x' || substr(md5(token), 1, 12))::BIGINT % 8 = 0
             THEN 32 ELSE 1 END AS w
      FROM tok0
    ),
    freq AS MATERIALIZED (
      SELECT shard, token, CAST(sum(w) AS BIGINT) AS f
      FROM tok GROUP BY shard, token
    ),
    ranked AS (
      SELECT shard, token, f,
        row_number() OVER (
          PARTITION BY shard ORDER BY f DESC, token) AS rn
      FROM freq
    ),
    thr AS (
      SELECT shard,
        CAST(coalesce(max(CASE WHEN rn = {_MG_K} + 1 THEN f END), 0)
             AS BIGINT) AS thr
      FROM ranked GROUP BY shard
    ),
    summ AS MATERIALIZED (
      SELECT r.shard, r.token, r.f - t.thr AS c
      FROM ranked r JOIN thr t ON t.shard = r.shard
      WHERE r.rn <= {_MG_K} AND r.f - t.thr > 0
    ),
    bound AS (SELECT CAST(sum(thr) AS BIGINT) AS b FROM thr),
    merged AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS est
      FROM summ GROUP BY token
    ),
    truth AS (
      SELECT token, CAST(sum(w) AS BIGINT) AS true_cnt
      FROM tok GROUP BY token
    ),
    served AS (
      SELECT m.token, m.est, t.true_cnt,
        row_number() OVER (ORDER BY m.est DESC, m.token) AS pos
      FROM merged m JOIN truth t ON t.token = m.token
    )
    SELECT CAST(pos AS INT) AS pos, token, est, true_cnt,
      (SELECT b FROM bound) AS err_bound,
      est <= true_cnt AND true_cnt - est <= (SELECT b FROM bound)
        AS within_bound
    FROM served WHERE pos <= {_MG_TOP}
    ORDER BY pos
    """,
    doc=f"MISRA-GRIES / SPACESAVING HEAVY HITTERS — the DETERMINISTIC "
    "counter-based sibling of text_cms_heavy_hitters (CMS bounds "
    "OVERcounts probabilistically via hashed rows; MG counters bound "
    "UNDERcounts exactly with zero randomness — the pair covers both "
    f"error directions). Per shard (doc_id % {_MG_S}, the "
    "per-executor summary analogy) the batch-equivalent MG summary "
    f"keeps the top-{_MG_K} tokens by frequency with counts reduced "
    f"by the (K+1)-th frequency thr_s: every token's shard estimate "
    "undercounts by at most thr_s (kept: f - thr_s; dropped: f <= "
    "thr_s, est 0), so the PLAIN-SUM merge — associative and "
    "commutative, any tree shape — satisfies est <= true <= est + "
    "sum_s(thr_s), the bound SHIPPED in the output next to the exact "
    "count (the in-output verification anchor) and pinned per row by "
    f"within_bound. Serves the top-{_MG_TOP} by merged estimate with "
    "deterministic tie-break. State is {_MG_K} (token, count) pairs "
    "per shard — the fixed-size summary a 100 TB token-frequency "
    "pipeline ships from each executor instead of the full "
    "vocabulary; the exact `truth` relation here is the bounded-"
    "fixture anchor, not part of the serving path. Pure integer "
    "arithmetic end-to-end. FIXTURE NOTE: the synthetic corpus is "
    "near-uniform by construction (measured max/median token freq "
    "964/900 at sf0.01 — no natural hitters), so the stream "
    "injects deterministic skew the dup-injected-corpus way: a "
    "portable-md5-selected 1/8 of the vocabulary weighs 32x per "
    "occurrence, giving real hitters far above the tail with the "
    "bound well below hitter mass — the regime MG exists for.",
)
def docs_token_mg_hitters(spark: SparkSession, sf: str) -> DataFrame:
    tok = (
        table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            (F.col("doc_id") % _MG_S).alias("shard"),
            F.explode(T.tokens(F.col("text"))).alias("token"),
        )
        .withColumn(
            "w",
            F.when(
                T.portable_hash64(F.col("token")) % 8 == 0, F.lit(32)
            ).otherwise(F.lit(1)),
        )
    )
    freq = tok.groupBy("shard", "token").agg(
        F.sum("w").cast("long").alias("f")
    )
    wr = Window.partitionBy("shard").orderBy(F.col("f").desc(), "token")
    ranked = freq.withColumn("rn", F.row_number().over(wr)).localCheckpoint(
        eager=True
    )
    thr = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _MG_K + 1, F.col("f"))), F.lit(0)
        )
        .cast("long")
        .alias("thr")
    )
    summ = (
        ranked.filter(F.col("rn") <= _MG_K)
        .join(thr, "shard")
        .withColumn("c", F.col("f") - F.col("thr"))
        .filter(F.col("c") > 0)
    )
    bound = thr.agg(F.sum("thr").cast("long").alias("err_bound"))
    merged = summ.groupBy("token").agg(F.sum("c").cast("long").alias("est"))
    truth = tok.groupBy("token").agg(
        F.sum("w").cast("long").alias("true_cnt")
    )
    # TakeOrdered top-k, pos over the bounded frame, 1-row bound
    # crossJoin (test_plans allowlists).
    wp = Window.orderBy(F.col("est").desc(), "token")
    return (
        merged.join(truth, "token")
        .orderBy(F.col("est").desc(), "token")
        .limit(_MG_TOP)
        .withColumn("pos", F.row_number().over(wp))
        .crossJoin(bound)
        .select(
            "pos",
            "token",
            "est",
            "true_cnt",
            "err_bound",
            (
                (F.col("est") <= F.col("true_cnt"))
                & (F.col("true_cnt") - F.col("est") <= F.col("err_bound"))
            ).alias("within_bound"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# Equi-depth range-partition planner (histogram-driven repartitioning)
# ---------------------------------------------------------------------------

_RPP_P = 8   # planned partitions
_RPP_W = 8   # histogram bucket width (token counts), the _QHS_W layout


@register(
    "docs_tok_range_partition_plan",
    oracle=f"""
    WITH d AS (
      SELECT CAST(len({_TOKS}) AS BIGINT) AS v
      FROM (SELECT coalesce(text, '') AS text FROM documents)
    ),
    hist AS MATERIALIZED (
      SELECT v // {_RPP_W} AS bkt, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY bkt
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(max(c) AS BIGINT) AS max_c
      FROM hist
    ),
    cum AS (
      SELECT bkt, c,
        sum(c) OVER (ORDER BY bkt ROWS UNBOUNDED PRECEDING) AS cw
      FROM hist
    ),
    assigned AS (
      -- bucket goes to the FIRST partition whose depth target its
      -- cumulative mass has not yet exceeded: pid = ceil(cw / target)
      SELECT c2.bkt, c2.c,
        least({_RPP_P}, (c2.cw + t.target - 1) // t.target) AS pid
      FROM cum c2, (
        SELECT (n + {_RPP_P} - 1) // {_RPP_P} AS target FROM tot
      ) t
    ),
    parts AS (
      SELECT pid,
        CAST(min(bkt) * {_RPP_W} AS BIGINT) AS lo_v,
        CAST((max(bkt) + 1) * {_RPP_W} AS BIGINT) AS hi_v,
        CAST(sum(c) AS BIGINT) AS n_docs_part
      FROM assigned GROUP BY pid
    )
    SELECT CAST(p.pid AS INT) AS pid, p.lo_v, p.hi_v, p.n_docs_part,
      CAST((t.n + {_RPP_P} - 1) // {_RPP_P} AS BIGINT) AS target,
      t.max_c AS slack,
      p.n_docs_part <= (t.n + {_RPP_P} - 1) // {_RPP_P} + t.max_c - 1
        AS within_bound
    FROM parts p, tot t
    ORDER BY pid
    """,
    doc=f"EQUI-DEPTH RANGE-PARTITION PLANNER — the skew-aware "
    "repartitioning plan a 100 TB engine computes BEFORE a range "
    "shuffle (Spark's own RangePartitioner samples; this plans from "
    f"the mergeable width-{_RPP_W} bucket histogram the warehouse already "
    "maintains — docs_tok_quantile_hist_serving's layout — so the "
    "plan costs one bounded scan of pre-aggregated state, zero "
    "re-sampling). Greedy bucket assignment by cumulative mass: "
    "bucket b lands in partition ceil(cum(b)/target), target = "
    f"ceil(n/{_RPP_P}) — pure integer arithmetic, identical on both "
    "engines. The depth GUARANTEE ships in the output: every planned "
    "partition holds at most target + max_bucket_count - 1 docs "
    "(the straddling bucket is the atomic unit — the bound is "
    "structural, pinned per row by within_bound), so partition skew "
    "is bounded by the histogram resolution, not the data. Emits the "
    "value ranges [lo_v, hi_v) with exact per-partition counts — the "
    "row a planner feeds to repartitionByRange. Scale shape: one "
    "combinable histogram agg + windows over the value-bounded "
    "bucket list.",
)
def docs_tok_range_partition_plan(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents").select(
        F.size(T.tokens(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("v")
    )
    hist = (
        d.withColumn("bkt", F.expr(f"v div {_RPP_W}"))
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.max("c").cast("long").alias("max_c"),
    )
    wc = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cumulative window over the VALUE-bounded bucket list (the
    # orders_pareto_share pattern); 1-row totals crossJoin (_BNLJ_OK).
    cum = hist.withColumn("cw", F.sum("c").over(wc)).crossJoin(tot)
    assigned = cum.withColumn(
        "target", F.expr(f"(n + {_RPP_P} - 1) div {_RPP_P}")
    ).withColumn(
        "pid",
        F.least(
            F.lit(_RPP_P),
            F.expr("(cw + target - 1) div target"),
        ),
    )
    return (
        assigned.groupBy("pid")
        .agg(
            (F.min("bkt") * _RPP_W).cast("long").alias("lo_v"),
            ((F.max("bkt") + 1) * _RPP_W).cast("long").alias("hi_v"),
            F.sum("c").cast("long").alias("n_docs_part"),
            F.max("target").cast("long").alias("target"),
            F.max("max_c").cast("long").alias("slack"),
        )
        .withColumn(
            "within_bound",
            F.col("n_docs_part") <= F.col("target") + F.col("slack") - 1,
        )
        .select(
            F.col("pid").cast("int"),
            "lo_v",
            "hi_v",
            "n_docs_part",
            "target",
            "slack",
            "within_bound",
        )
        .orderBy("pid")
    )


# ---------------------------------------------------------------------------
# Range-partition plan drift audit (re-plan after a skewed append)
# ---------------------------------------------------------------------------

_RPD_MOD = 10  # doc_id % 10 == 0 -> the appended batch (dup-injected, v*4)


def _rpd_plan_sql(tag: str, hist: str) -> str:
    """Greedy equi-depth plan over histogram CTE ``hist`` (bkt, c):
    emits ({tag}parts): pid, lo_bkt, hi_bkt, n_part, target, max_c."""
    return f"""
    {tag}tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n, CAST(max(c) AS BIGINT) AS max_c
      FROM {hist}
    ),
    {tag}cum AS (
      SELECT bkt, c, sum(c) OVER (ORDER BY bkt ROWS UNBOUNDED PRECEDING) AS cw
      FROM {hist}
    ),
    {tag}assigned AS (
      SELECT c2.bkt, c2.c,
        least({_RPP_P}, (c2.cw + t.target - 1) // t.target) AS pid
      FROM {tag}cum c2,
           (SELECT (n + {_RPP_P} - 1) // {_RPP_P} AS target FROM {tag}tot) t
    ),
    {tag}parts AS (
      SELECT pid, CAST(min(bkt) AS BIGINT) AS lo_bkt,
             CAST(max(bkt) AS BIGINT) AS hi_bkt,
             CAST(sum(c) AS BIGINT) AS n_part
      FROM {tag}assigned GROUP BY pid
    )"""


@register(
    "docs_tok_partition_plan_drift",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT CAST(len({_TOKS}) AS BIGINT) AS v
      FROM (SELECT coalesce(text, '') AS text FROM documents)
    ),
    batch AS MATERIALIZED (
      SELECT CAST(len({_TOKS}) AS BIGINT) * 4 AS v
      FROM (SELECT coalesce(text, '') AS text FROM documents
            WHERE doc_id % {_RPD_MOD} = 0)
    ),
    newd AS MATERIALIZED (
      SELECT v FROM base UNION ALL SELECT v FROM batch
    ),
    ohist AS MATERIALIZED (
      SELECT v // {_RPP_W} AS bkt, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY bkt
    ),
    nhist AS MATERIALIZED (
      SELECT v // {_RPP_W} AS bkt, CAST(count(*) AS BIGINT) AS c
      FROM newd GROUP BY bkt
    ),
    {_rpd_plan_sql("o", "ohist")},
    {_rpd_plan_sql("n", "nhist")},
    obounds AS (
      -- upper value bound of old pids 1..P-1: route v to
      -- 1 + #(bounds <= v)
      SELECT (hi_bkt + 1) * {_RPP_W} AS b FROM oparts
      WHERE pid < {_RPP_P}
    ),
    vpid AS (
      SELECT d.v,
        1 + CAST(coalesce(sum(CASE WHEN d.v >= b.b THEN 1 END), 0)
                 AS BIGINT) AS pid
      FROM (SELECT DISTINCT v FROM newd) d
      LEFT JOIN obounds b ON TRUE
      GROUP BY d.v
    ),
    old_route_cnt AS (
      SELECT p.pid, CAST(sum(h.c) AS BIGINT) AS n_old_route
      FROM vpid p
      JOIN (SELECT v, CAST(count(*) AS BIGINT) AS c FROM newd GROUP BY v) h
        ON h.v = p.v
      GROUP BY p.pid
    ),
    grid AS (SELECT unnest(generate_series(1, {_RPP_P})) AS pid)
    SELECT CAST(g.pid AS INT) AS pid,
      CAST(coalesce(orc.n_old_route, 0) AS BIGINT) AS n_old_route,
      CAST(coalesce(np.n_part, 0) AS BIGINT) AS n_new_route,
      CAST((SELECT (n + {_RPP_P} - 1) // {_RPP_P} FROM ntot) AS BIGINT)
        AS target_new,
      CAST((SELECT max(n_old_route) FROM old_route_cnt) * 1000000
           // (SELECT (n + {_RPP_P} - 1) // {_RPP_P} FROM ntot)
           AS BIGINT) AS skew_old_ppm,
      CAST((SELECT max(n_part) FROM nparts) * 1000000
           // (SELECT (n + {_RPP_P} - 1) // {_RPP_P} FROM ntot)
           AS BIGINT) AS skew_new_ppm,
      coalesce(op.hi_bkt, -1) <> coalesce(np.hi_bkt, -1) AS boundary_moved
    FROM grid g
    LEFT JOIN old_route_cnt orc ON orc.pid = g.pid
    LEFT JOIN nparts np ON np.pid = g.pid
    LEFT JOIN oparts op ON op.pid = g.pid
    ORDER BY g.pid
    """,
    doc="RANGE-PARTITION PLAN DRIFT AUDIT — composes the equi-depth "
    "planner with the incremental theme: a deterministically skewed "
    f"batch appends (docs with doc_id % {_RPD_MOD} == 0 re-ingested "
    "at 4x token length — the dup-injection discipline standing in "
    "for a heavy-tailed source landing), and the audit quantifies, "
    "per partition, what a STALE plan would do to the new data vs the "
    "re-plan: n_old_route (rows routed by the old value boundaries — "
    "routing is 1 + #(boundaries <= v), exactly how a deployed "
    "repartitionByRange ships rows) against n_new_route, the moved "
    "boundaries, and the headline skew ratios in exact integer ppm "
    "(max partition / depth target). The operational answer to 'do we "
    "need to re-plan after this ingest' — at 100 TB a stale range "
    "plan is the silent hot-partition generator, and this audit costs "
    "two bounded histogram passes, never a re-shuffle. skew_new <= "
    "skew_old is pinned in tests/test_round12_ops.py along with a "
    "Python replay. Scale shape: combinable histogram aggs, bounded "
    "boundary fanout (|hist| x 7), windows over the bucket list.",
)
def docs_tok_partition_plan_drift(spark: SparkSession, sf: str) -> DataFrame:
    base = table(spark, sf, "documents").select(
        F.size(T.tokens(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("v")
    )
    batch = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") % _RPD_MOD == 0)
        .select(
            (
                F.size(T.tokens(F.coalesce(F.col("text"), F.lit("")))) * 4
            )
            .cast("long")
            .alias("v")
        )
    )
    newd = base.unionByName(batch).localCheckpoint(eager=True)

    def hist_of(d: DataFrame) -> DataFrame:
        return (
            d.withColumn("bkt", F.expr(f"v div {_RPP_W}"))
            .groupBy("bkt")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    def plan_of(h: DataFrame) -> DataFrame:
        tot = h.agg(
            F.sum("c").cast("long").alias("n"),
            F.max("c").cast("long").alias("max_c"),
        )
        wc = Window.orderBy("bkt").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        assigned = (
            h.withColumn("cw", F.sum("c").over(wc))
            .crossJoin(tot)
            .withColumn("target", F.expr(f"(n + {_RPP_P} - 1) div {_RPP_P}"))
            .withColumn(
                "pid",
                F.least(F.lit(_RPP_P), F.expr("(cw + target - 1) div target")),
            )
        )
        return assigned.groupBy("pid").agg(
            F.min("bkt").cast("long").alias("lo_bkt"),
            F.max("bkt").cast("long").alias("hi_bkt"),
            F.sum("c").cast("long").alias("n_part"),
            F.max("target").cast("long").alias("target"),
        )

    oparts = plan_of(hist_of(base)).localCheckpoint(eager=True)
    nhist = hist_of(newd).localCheckpoint(eager=True)
    nparts = plan_of(nhist).localCheckpoint(eager=True)

    # Route the NEW data by the OLD boundaries: bounded 7-row fanout.
    obounds = oparts.filter(F.col("pid") < _RPP_P).select(
        ((F.col("hi_bkt") + 1) * _RPP_W).alias("b")
    )
    vcnt = newd.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    old_route = (
        vcnt.join(F.broadcast(obounds))
        .groupBy("v", "c")
        .agg(
            (
                F.lit(1)
                + F.coalesce(
                    F.sum(F.when(F.col("v") >= F.col("b"), 1)), F.lit(0)
                )
            )
            .cast("long")
            .alias("pid")
        )
        .groupBy("pid")
        .agg(F.sum("c").cast("long").alias("n_old_route"))
    )
    target_new = nparts.agg(F.max("target").cast("long").alias("target_new"))
    skew_old = old_route.agg(
        F.max("n_old_route").cast("long").alias("mx_old")
    )
    skew_new = nparts.agg(F.max("n_part").cast("long").alias("mx_new"))
    grid = spark.range(1, _RPP_P + 1).select(F.col("id").cast("int").alias("pid"))
    return (
        grid.join(old_route, "pid", "left")
        .join(
            nparts.select(
                "pid",
                F.col("n_part").alias("n_new_route"),
                F.col("hi_bkt").alias("hi_new"),
            ),
            "pid",
            "left",
        )
        .join(
            oparts.select("pid", F.col("hi_bkt").alias("hi_old")),
            "pid",
            "left",
        )
        .crossJoin(target_new)
        .crossJoin(skew_old)
        .crossJoin(skew_new)
        .select(
            "pid",
            F.coalesce("n_old_route", F.lit(0)).cast("long").alias("n_old_route"),
            F.coalesce("n_new_route", F.lit(0)).cast("long").alias("n_new_route"),
            F.col("target_new"),
            F.expr("mx_old * 1000000 div target_new")
            .cast("long")
            .alias("skew_old_ppm"),
            F.expr("mx_new * 1000000 div target_new")
            .cast("long")
            .alias("skew_new_ppm"),
            (
                F.coalesce("hi_old", F.lit(-1))
                != F.coalesce("hi_new", F.lit(-1))
            ).alias("boundary_moved"),
        )
        .orderBy("pid")
    )
