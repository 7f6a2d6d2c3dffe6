"""Sketch / probabilistic-counting catalog queries: HyperLogLog
cardinality + shard merge, Count-Min-Sketch heavy hitters + merge, and
the AMS self-join-size sketch.  Split out of llm_queries.py (round 9,
pure move).

Every sketch is pure integer arithmetic over the portable 48-bit
md5-prefix hash (functions/text.py ``portable_hash64``), so the Spark
sketch and the DuckDB oracle build the identical registers/counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.llm_queries import TOKS, H

@register(
    "dedup_hll_cardinality",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id % 4 AS shard,
        md5(array_to_string(list_sort(list_distinct({TOKS})), ' ')) AS fp
      FROM documents
    ),
    h AS (
      SELECT shard, fp, {H.format(v="fp")} % 64 AS j,
             {H.format(v="fp")} // 64 AS w
      FROM fp
    ),
    rk AS (
      SELECT shard, j,
        CASE WHEN w = 0 THEN 43
             ELSE 43 - length(bin(w)) END AS rank
      FROM h
    ),
    regs AS (
      SELECT shard, j, max(rank) AS m FROM rk GROUP BY shard, j
    ),
    acc AS (
      SELECT shard,
        CAST(count(*) AS BIGINT) AS n_present,
        CAST(sum(CAST(pow(2.0, 50 - m) AS BIGINT)) AS BIGINT) AS s_present
      FROM regs GROUP BY shard
    ),
    ex AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT fp) AS BIGINT) AS exact_distinct
      FROM fp GROUP BY shard
    ),
    est AS (
      SELECT e.shard, e.n_rows, e.exact_distinct,
        CAST(64 - a.n_present AS BIGINT) AS n_zero_registers,
        0.709 * 4096.0 * (1125899906842624.0 /
          CAST(a.s_present + (64 - a.n_present) * 1125899906842624 AS DOUBLE))
          AS raw
      FROM ex e JOIN acc a ON e.shard = a.shard
    ),
    fin AS (
      SELECT shard, n_rows, exact_distinct, n_zero_registers,
        CASE WHEN raw <= 160.0 AND n_zero_registers > 0
             THEN 64.0 * round(ln(64.0 / n_zero_registers), 9)
             ELSE raw END AS estimate
      FROM est
    )
    SELECT shard, n_rows, exact_distinct, n_zero_registers,
      round(estimate, 3) AS hll_estimate,
      round(abs(estimate - exact_distinct) / exact_distinct, 6) AS rel_err
    FROM fin ORDER BY shard
    """,
    doc="Portable HyperLogLog cardinality sketch (m=64 registers), "
    "built explicitly so BOTH engines compute identical registers — "
    "unlike approx_count_distinct, whose HLL++ internals are "
    "engine-private (that entry's oracle is exact-count + tolerance; "
    "THIS entry value-hash-matches the sketch itself): the 48-bit "
    "portable hash of each document fingerprint splits into a 6-bit "
    "register index and a 42-bit value whose leading-zero rank "
    "(computed as binary digit length, no loops) feeds a per-register "
    "MAX — a fully combinable, order-free aggregate, the reason HLL "
    "is THE 100-TB distinct-counter (map-side partial maxes merge "
    "associatively; state is 64 bytes per group regardless of "
    "cardinality). The harmonic-mean denominator sums EXACT BIGINTs "
    "(2^(50-M) per register, so register sums never touch float "
    "order), the one transcendental (linear-counting ln, engaged for "
    "the small shards) is pre-rounded to 9 dp like docs_bm25_topk's "
    "idf, and the raw/linear-counting branch switch compares "
    "deterministic doubles. Per-shard output also carries the exact "
    "distinct count and realized relative error.",
)
def dedup_hll_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    fp = table(spark, sf, "documents").select(
        (F.col("doc_id") % 4).alias("shard"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    hh = T.portable_hash64(F.col("fp"))
    h = fp.select(
        "shard",
        "fp",
        (hh % 64).alias("j"),
        F.shiftright(hh, 6).alias("w"),
    )
    rk = h.select(
        "shard",
        "j",
        F.when(F.col("w") == 0, F.lit(43))
        .otherwise(F.lit(43) - F.length(F.bin("w")))
        .alias("rank"),
    )
    regs = rk.groupBy("shard", "j").agg(F.max("rank").alias("m"))
    acc = regs.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), 50 - F.col("m")).cast("long"))
        .cast("long")
        .alias("s_present"),
    )
    ex = fp.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("fp").cast("long").alias("exact_distinct"),
    )
    p50 = 1125899906842624  # 2^50
    est = ex.join(acc, "shard").select(
        "shard",
        "n_rows",
        "exact_distinct",
        (F.lit(64) - F.col("n_present")).cast("long").alias("n_zero_registers"),
        (
            F.lit(0.709)
            * F.lit(4096.0)
            * (
                F.lit(float(p50))
                / (
                    F.col("s_present")
                    + (F.lit(64) - F.col("n_present")) * F.lit(p50)
                ).cast("double")
            )
        ).alias("raw"),
    )
    estimate = F.when(
        (F.col("raw") <= 160.0) & (F.col("n_zero_registers") > 0),
        F.lit(64.0)
        * F.round(F.log(F.lit(64.0) / F.col("n_zero_registers")), 9),
    ).otherwise(F.col("raw"))
    return (
        est.withColumn("estimate", estimate)
        .select(
            "shard",
            "n_rows",
            "exact_distinct",
            "n_zero_registers",
            F.round(F.col("estimate"), 3).alias("hll_estimate"),
            F.round(
                F.abs(F.col("estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("shard")
    )


@register(
    "text_cms_heavy_hitters",
    oracle=f"""
    WITH tokc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    sk AS (
      SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT 0 AS r, (('0x' || substr(md5('cms0:' || tok), 1, 12))::BIGINT % 256) AS bucket, cnt FROM tokc
      UNION ALL SELECT 1 AS r, (('0x' || substr(md5('cms1:' || tok), 1, 12))::BIGINT % 256) AS bucket, cnt FROM tokc
      UNION ALL SELECT 2 AS r, (('0x' || substr(md5('cms2:' || tok), 1, 12))::BIGINT % 256) AS bucket, cnt FROM tokc
      UNION ALL SELECT 3 AS r, (('0x' || substr(md5('cms3:' || tok), 1, 12))::BIGINT % 256) AS bucket, cnt FROM tokc
      ) GROUP BY r, bucket
    ),
    top AS (SELECT tok, cnt FROM tokc ORDER BY cnt DESC, tok LIMIT 20),
    tq AS (SELECT tok, cnt, 0 AS r, (('0x' || substr(md5('cms0:' || tok), 1, 12))::BIGINT % 256) AS bucket FROM top
      UNION ALL SELECT tok, cnt, 1 AS r, (('0x' || substr(md5('cms1:' || tok), 1, 12))::BIGINT % 256) AS bucket FROM top
      UNION ALL SELECT tok, cnt, 2 AS r, (('0x' || substr(md5('cms2:' || tok), 1, 12))::BIGINT % 256) AS bucket FROM top
      UNION ALL SELECT tok, cnt, 3 AS r, (('0x' || substr(md5('cms3:' || tok), 1, 12))::BIGINT % 256) AS bucket FROM top
    ),
    est AS (
      SELECT tok, cnt, min(c) AS cms
      FROM tq JOIN sk USING (r, bucket) GROUP BY tok, cnt
    )
    SELECT tok, cnt AS exact_cnt, CAST(cms AS BIGINT) AS cms_estimate,
           CAST(cms - cnt AS BIGINT) AS overestimate
    FROM est ORDER BY tok
    """,
    doc="Count-min-sketch heavy hitters (d=4 rows x w=256 "
    "buckets): the second portable distributed sketch beside "
    "dedup_hll_cardinality, and the streaming-friendly way to track "
    "frequent tokens at 100 TB — the sketch is a fixed 4x256 "
    "integer matrix built by one combinable keyed SUM (vocabulary "
    "counts fold into buckets map-side; state is bounded regardless "
    "of vocabulary size), and each of the exact top-20 tokens is "
    "estimated as the MIN over its 4 bucket counters. "
    "Everything is integer arithmetic over the portable 48-bit md5 "
    "hash — no floats anywhere, so the sketch value-hash-matches the "
    "oracle bit-for-bit. The output carries exact vs estimated counts "
    "and the overestimate, whose one-sidedness (cms >= exact, the CMS "
    "guarantee) is pinned in tests.",
)
def text_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    tokc = (
        table(spark, sf, "documents")
        .select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    def rb_array():
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            T.portable_hash64(
                                F.concat(F.lit(f"cms{r}:"), F.col("tok"))
                            )
                            % 256
                        ).alias("bucket"),
                    )
                    for r in range(4)
                ]
            )
        )

    pairs = tokc.select("tok", "cnt", rb_array().alias("rb")).select(
        "tok", "cnt", "rb.r", "rb.bucket"
    )
    sk = pairs.groupBy("r", "bucket").agg(
        F.sum("cnt").cast("long").alias("c")
    )
    top = tokc.orderBy(F.col("cnt").desc(), "tok").limit(20)
    tq = top.select("tok", "cnt", rb_array().alias("rb")).select(
        "tok", "cnt", "rb.r", "rb.bucket"
    )
    est = (
        tq.join(F.broadcast(sk), ["r", "bucket"])
        .groupBy("tok", "cnt")
        .agg(F.min("c").cast("long").alias("cms"))
    )
    return est.select(
        "tok",
        F.col("cnt").alias("exact_cnt"),
        F.col("cms").alias("cms_estimate"),
        (F.col("cms") - F.col("cnt")).cast("long").alias("overestimate"),
    ).orderBy("tok")


@register(
    "dedup_hll_merge",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id % 8 AS shard,
        md5(array_to_string(list_sort(list_distinct({TOKS})), ' ')) AS fp
      FROM documents
    ),
    h AS (
      SELECT shard, {H.format(v="fp")} % 64 AS j,
             {H.format(v="fp")} // 64 AS w
      FROM fp
    ),
    rk AS (
      SELECT shard, j,
        CASE WHEN w = 0 THEN 43 ELSE 43 - length(bin(w)) END AS rank
      FROM h
    ),
    shard_regs AS (
      SELECT shard, j, max(rank) AS m FROM rk GROUP BY shard, j
    ),
    merged AS (
      SELECT j, CAST(count(*) AS BIGINT) AS n_shards_present,
             max(m) AS m_merged
      FROM shard_regs GROUP BY j
    ),
    whole AS (
      SELECT j, max(rank) AS m_whole FROM rk GROUP BY j
    )
    SELECT merged.j, n_shards_present,
           CAST(m_merged AS BIGINT) AS m_merged,
           CAST(m_whole AS BIGINT) AS m_whole,
           m_merged = m_whole AS registers_equal
    FROM merged JOIN whole ON whole.j = merged.j
    ORDER BY merged.j
    """,
    doc="HLL MERGEABILITY proof — the property that makes the sketch "
    "usable in a map-reduce tree at 100 TB: 8 per-shard m=64 register "
    "sets (the map-side artifacts a 1000-executor job would emit, 64 "
    "bytes each) are merged AS DATA by per-register MAX — associative, "
    "commutative, AND idempotent, so any tree shape, shard order, or "
    "duplicated delivery yields identical registers — and the merged "
    "sketch is pinned register-for-register equal to the whole-corpus "
    "single-pass sketch (same portable 48-bit hash discipline as "
    "dedup_hll_cardinality, whose estimator these registers feed). "
    "Equality of the resulting cardinality estimates is pinned in "
    "tests/test_llm_ops.py. Both paths are combinable hash-aggs; the "
    "merge input is 8x64 rows regardless of corpus size.",
)
def dedup_hll_merge(spark: SparkSession, sf: str) -> DataFrame:
    fp = table(spark, sf, "documents").select(
        (F.col("doc_id") % 8).alias("shard"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    hh = T.portable_hash64(F.col("fp"))
    rk = fp.select(
        "shard",
        (hh % 64).alias("j"),
        F.when(F.shiftright(hh, 6) == 0, F.lit(43))
        .otherwise(F.lit(43) - F.length(F.bin(F.shiftright(hh, 6))))
        .alias("rank"),
    )
    shard_regs = rk.groupBy("shard", "j").agg(F.max("rank").alias("m"))
    merged = shard_regs.groupBy("j").agg(
        F.count(F.lit(1)).cast("long").alias("n_shards_present"),
        F.max("m").alias("m_merged"),
    )
    whole = rk.groupBy("j").agg(F.max("rank").alias("m_whole"))
    return (
        merged.join(whole, "j")
        .select(
            "j",
            "n_shards_present",
            F.col("m_merged").cast("long").alias("m_merged"),
            F.col("m_whole").cast("long").alias("m_whole"),
            (F.col("m_merged") == F.col("m_whole")).alias("registers_equal"),
        )
        .orderBy("j")
    )


_JS_ROWS = 4
_JS_W = 256


@register(
    "join_selfjoin_size_cms",
    oracle=f"""
    WITH keyc AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS f
      FROM lineitem GROUP BY l_partkey
    ),
    exact AS (SELECT CAST(sum(f * f) AS BIGINT) AS exact_pairs FROM keyc),
    sk AS (
      SELECT r, bucket, CAST(sum(sf) AS BIGINT) AS c
      FROM (
        {" UNION ALL ".join(
          f"SELECT {r} AS r,"
          f" (('0x' || substr(md5('jsb{r}:' || k), 1, 12))::BIGINT % {_JS_W})"
          f" AS bucket,"
          f" f * (1 - 2 * (('0x' || substr(md5('jss{r}:' || k), 1, 12))::BIGINT % 2))"
          f" AS sf FROM keyc"
          for r in range(_JS_ROWS)
        )}
      ) GROUP BY r, bucket
    ),
    est AS (
      SELECT r, CAST(sum(c * c) AS BIGINT) AS row_estimate
      FROM sk GROUP BY r
    )
    SELECT CAST(r AS BIGINT) AS r, row_estimate, exact_pairs,
      CAST((1000000 * row_estimate) // exact_pairs - 1000000 AS BIGINT)
        AS err_ppm
    FROM est, exact ORDER BY r
    """,
    doc="SELF-JOIN SIZE ESTIMATION from AMS/Count-Sketch sign sketches "
    "(Alon-Matias-Szegedy F2; Charikar-Chen-Farach-Colton buckets) — "
    "the query-planning primitive a 100-TB optimizer wants: the "
    "self-join size of lineitem on l_partkey (= sum of squared key "
    "frequencies, the F2 moment — exactly the pre-predicate row count "
    "of graph_copurchase_pairs' expansion) is estimated WITHOUT "
    "running the join: each key's frequency enters one of "
    f"w={_JS_W} buckets per row with a hash-drawn +-1 SIGN, and "
    "sum(c^2) over a row's signed bucket counts is an UNBIASED F2 "
    "estimate with relative std ~ sqrt(2/w) ~ 9%, INDEPENDENT of "
    "stream length (a plain unsigned-CMS inner product overestimates "
    "by F1^2/w — measured 8.7x at sf0.01 in the first cut of this "
    "entry, which is why the signed sketch is the published "
    "algorithm). The sketch is one combinable keyed SUM into a fixed "
    f"{_JS_ROWS} x {_JS_W} integer matrix; err_ppm is an exact "
    "positive-operand integer floor minus 1e6 (DuckDB // floors but "
    "Spark div truncates — they only agree on nonnegative operands, "
    "so the subtraction keeps the division nonnegative). Per-row "
    "median accuracy is pinned in pytest.",
)
def join_selfjoin_size_cms(spark: SparkSession, sf: str) -> DataFrame:
    keyc = (
        table(spark, sf, "lineitem")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    exact = keyc.agg(
        F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_pairs")
    )
    rows = []
    for r in range(_JS_ROWS):
        ks = F.col("k").cast("string")
        b = T.portable_hash64(F.concat(F.lit(f"jsb{r}:"), ks)) % _JS_W
        sign = F.lit(1) - F.lit(2) * (
            T.portable_hash64(F.concat(F.lit(f"jss{r}:"), ks)) % 2
        )
        rows.append(
            keyc.select(
                F.lit(r).alias("r"),
                b.alias("bucket"),
                (F.col("f") * sign).cast("long").alias("sf"),
            )
        )
    allrows = rows[0]
    for x in rows[1:]:
        allrows = allrows.unionByName(x)
    sk = allrows.groupBy("r", "bucket").agg(
        F.sum("sf").cast("long").alias("c")
    )
    est = sk.groupBy("r").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("row_estimate")
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.col("r").cast("long").alias("r"),
            "row_estimate",
            "exact_pairs",
            (
                F.expr(
                    "CAST((1000000 * row_estimate) div exact_pairs AS BIGINT)"
                )
                - F.lit(1000000)
            ).alias("err_ppm"),
        )
        .orderBy("r")
    )


_CMS_MERGE_ROWS = 4


def _cms_bucket_sql(r: int) -> str:
    return f"(('0x' || substr(md5('cms{r}:' || tok), 1, 12))::BIGINT % 256)"


@register(
    "text_cms_merge",
    oracle=f"""
    WITH tokc AS (
      SELECT shard, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT doc_id % 4 AS shard, unnest({TOKS}) AS tok FROM documents
      ) GROUP BY shard, tok
    ),
    cells AS (
      {" UNION ALL ".join(
        f"SELECT shard, {r} AS r, {_cms_bucket_sql(r)} AS bucket, cnt FROM tokc"
        for r in range(_CMS_MERGE_ROWS)
      )}
    ),
    shard_sk AS (
      SELECT shard, r, bucket, CAST(sum(cnt) AS BIGINT) AS c
      FROM cells GROUP BY shard, r, bucket
    ),
    merged AS (
      SELECT r, bucket, CAST(sum(c) AS BIGINT) AS c_merged,
             CAST(count(*) AS BIGINT) AS n_shards_present
      FROM shard_sk GROUP BY r, bucket
    ),
    whole AS (
      SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS c_whole
      FROM cells GROUP BY r, bucket
    )
    SELECT merged.r, merged.bucket, n_shards_present, c_merged, c_whole,
           c_merged = c_whole AS cells_equal
    FROM merged JOIN whole
      ON whole.r = merged.r AND whole.bucket = merged.bucket
    ORDER BY merged.r, merged.bucket
    """,
    doc="Count-min-sketch MERGEABILITY proof, the sum-matrix sibling of "
    "dedup_hll_merge: 4 per-shard 4x256 integer matrices merge by "
    "elementwise SUM (associative + commutative — any aggregation-tree "
    "shape over 1000 executors gives the same matrix, though unlike "
    "HLL's idempotent MAX a CMS shard must be delivered exactly once) "
    "and the merged matrix is pinned cell-for-cell equal to the "
    "whole-corpus single-pass sketch. The merge input is at most "
    "4 shards x 4x256 cells regardless of corpus size; both paths are "
    "combinable keyed SUMs over the same portable md5 bucket hash as "
    "text_cms_heavy_hitters. All-integer, so the pin is bit-exact.",
)
def text_cms_merge(spark: SparkSession, sf: str) -> DataFrame:
    tokc = (
        table(spark, sf, "documents")
        .select(
            (F.col("doc_id") % 4).alias("shard"),
            F.explode(T.tokens(F.col("text"))).alias("tok"),
        )
        .groupBy("shard", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cells = tokc.select(
        "shard",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            T.portable_hash64(
                                F.concat(F.lit(f"cms{r}:"), F.col("tok"))
                            )
                            % 256
                        ).alias("bucket"),
                    )
                    for r in range(_CMS_MERGE_ROWS)
                ]
            )
        ).alias("rb"),
    ).select("shard", "cnt", "rb.r", "rb.bucket")
    shard_sk = cells.groupBy("shard", "r", "bucket").agg(
        F.sum("cnt").cast("long").alias("c")
    )
    merged = shard_sk.groupBy("r", "bucket").agg(
        F.sum("c").cast("long").alias("c_merged"),
        F.count(F.lit(1)).cast("long").alias("n_shards_present"),
    )
    whole = cells.groupBy("r", "bucket").agg(
        F.sum("cnt").cast("long").alias("c_whole")
    )
    return (
        merged.join(whole, ["r", "bucket"])
        .select(
            "r",
            "bucket",
            "n_shards_present",
            "c_merged",
            "c_whole",
            (F.col("c_merged") == F.col("c_whole")).alias("cells_equal"),
        )
        .orderBy("r", "bucket")
    )


@register(
    "events_hll_hourly_rollup",
    oracle=f"""
    WITH ev AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(extract('hour' FROM ts) AS BIGINT) AS hr,
             user_id
      FROM events
    ),
    h AS (
      SELECT day, hr, user_id,
             {H.format(v="'uhll' || user_id")} % 64 AS j,
             {H.format(v="'uhll' || user_id")} // 64 AS w
      FROM ev
    ),
    rk AS (
      SELECT day, hr, user_id, j,
        CASE WHEN w = 0 THEN 43 ELSE 43 - length(bin(w)) END AS rank
      FROM h
    ),
    hour_regs AS (
      SELECT day, hr, j, max(rank) AS m FROM rk GROUP BY day, hr, j
    ),
    merged AS (
      SELECT day, j, max(m) AS m_merged FROM hour_regs GROUP BY day, j
    ),
    direct AS (
      SELECT day, j, max(rank) AS m_direct FROM rk GROUP BY day, j
    ),
    reg_cmp AS (
      SELECT mg.day, bool_and(mg.m_merged = d.m_direct) AS merged_equals_direct
      FROM merged mg JOIN direct d ON d.day = mg.day AND d.j = mg.j
      GROUP BY mg.day
    ),
    acc AS (
      SELECT day,
        CAST(count(*) AS BIGINT) AS n_present,
        CAST(sum(CAST(pow(2.0, 50 - m_merged) AS BIGINT)) AS BIGINT)
          AS s_present
      FROM merged GROUP BY day
    ),
    ex AS (
      SELECT day,
        CAST(count(DISTINCT hr) AS BIGINT) AS n_hours,
        CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM ev GROUP BY day
    ),
    est AS (
      SELECT e.day, e.n_hours, e.exact_users,
        CAST(64 - a.n_present AS BIGINT) AS n_zero_registers,
        0.709 * 4096.0 * (1125899906842624.0 /
          CAST(a.s_present + (64 - a.n_present) * 1125899906842624 AS DOUBLE))
          AS raw
      FROM ex e JOIN acc a ON a.day = e.day
    ),
    fin AS (
      SELECT day, n_hours, exact_users, n_zero_registers,
        CASE WHEN raw <= 160.0 AND n_zero_registers > 0
             THEN 64.0 * round(ln(64.0 / n_zero_registers), 9)
             ELSE raw END AS estimate
      FROM est
    )
    SELECT f.day, f.n_hours, f.n_zero_registers,
      round(f.estimate, 3) AS hll_estimate,
      f.exact_users,
      round(abs(f.estimate - f.exact_users) / f.exact_users, 6) AS rel_err,
      r.merged_equals_direct
    FROM fin f JOIN reg_cmp r ON r.day = f.day
    ORDER BY f.day
    """,
    doc="HLL TIME-AXIS ROLLUP — the range-query serving pattern that "
    "completes the sketch-mergeability family on its second axis: "
    "dedup_hll_merge proves shard-merge = whole-corpus (the map-reduce "
    "tree); this entry proves TIME-BUCKET merge = whole-range (the "
    "streaming warehouse layout, where a 100 TB pipeline keeps one "
    "64-byte register set per hour and answers ANY time-range "
    "distinct-users query by per-register MAX over the covered "
    "buckets — no re-scan of raw events, ever). Per (day, hour) "
    "register sets over the portable 48-bit user hash roll up to "
    "per-day sketches; merged registers are pinned "
    "register-for-register equal to the direct per-day build "
    "(bool_and per day — MAX is associative/commutative/idempotent, "
    "so hourly pre-aggregation is lossless), and the daily estimate "
    "(same exact-BIGINT harmonic denominator + 9-dp-pre-rounded "
    "linear-counting branch as dedup_hll_cardinality) is reported "
    "against the exact daily distinct with realized error. All "
    "aggregates are combinable keyed MAX/SUM over at most "
    "|days|x24x64 rows of state.",
)
def events_hll_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        F.date_trunc("DAY", "ts").alias("day"),
        F.hour("ts").alias("hr"),
        "user_id",
    )
    hh = T.portable_hash64(
        F.concat(F.lit("uhll"), F.col("user_id").cast("string"))
    )
    rk = ev.select(
        "day",
        "hr",
        "user_id",
        (hh % 64).alias("j"),
        F.when(F.shiftright(hh, 6) == 0, F.lit(43))
        .otherwise(F.lit(43) - F.length(F.bin(F.shiftright(hh, 6))))
        .alias("rank"),
    )
    hour_regs = rk.groupBy("day", "hr", "j").agg(F.max("rank").alias("m"))
    merged = hour_regs.groupBy("day", "j").agg(
        F.max("m").alias("m_merged")
    )
    direct = rk.groupBy("day", "j").agg(F.max("rank").alias("m_direct"))
    reg_cmp = (
        merged.join(direct, ["day", "j"])
        .groupBy("day")
        .agg(
            F.every(F.col("m_merged") == F.col("m_direct")).alias(
                "merged_equals_direct"
            )
        )
    )
    acc = merged.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), 50 - F.col("m_merged")).cast("long"))
        .cast("long")
        .alias("s_present"),
    )
    ex = ev.groupBy("day").agg(
        F.countDistinct("hr").cast("long").alias("n_hours"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
    )
    p50 = 1125899906842624  # 2^50
    est = ex.join(acc, "day").select(
        "day",
        "n_hours",
        "exact_users",
        (F.lit(64) - F.col("n_present")).cast("long").alias("n_zero_registers"),
        (
            F.lit(0.709)
            * F.lit(4096.0)
            * (
                F.lit(float(p50))
                / (
                    F.col("s_present")
                    + (F.lit(64) - F.col("n_present")) * F.lit(p50)
                ).cast("double")
            )
        ).alias("raw"),
    )
    estimate = F.when(
        (F.col("raw") <= 160.0) & (F.col("n_zero_registers") > 0),
        F.lit(64.0)
        * F.round(F.log(F.lit(64.0) / F.col("n_zero_registers")), 9),
    ).otherwise(F.col("raw"))
    return (
        est.withColumn("estimate", estimate)
        .join(reg_cmp, "day")
        .select(
            "day",
            "n_hours",
            "n_zero_registers",
            F.round(F.col("estimate"), 3).alias("hll_estimate"),
            "exact_users",
            F.round(
                F.abs(F.col("estimate") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ).alias("rel_err"),
            "merged_equals_direct",
        )
        .orderBy("day")
    )
