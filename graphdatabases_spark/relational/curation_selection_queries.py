"""Training-data curation: corpus SELECTION and mixture control.

Split out of ``curation_queries`` (round-8 pure-move refactor — same
entries, same oracles, registry unchanged): split manifests, the
water-filling quota rebalance family (token- and quality-mass) and its
selection window, the filter-funnel attribution, quality-bucket
profiles, bigram-LM gibberish scoring, and the rendezvous-hash shard
rebalance.  Determinism/scale discipline is curation_queries.py's —
see that module's docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.curation_queries import (
    _EMAIL_RE,
    _H,
    _IP_RE,
    _PHONE_RE,
)
from graphdatabases_spark.relational.llm_queries import TOKS as _TOKS


@register(
    "docs_split_manifest",
    oracle="""
    WITH t AS (
      SELECT source, lang, doc_id,
        len(list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
            x -> x <> '')) AS n_toks,
        ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 AS b
      FROM documents
    ),
    g AS (
      SELECT source, lang,
        CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
             ELSE 'test' END AS split,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS n_toks
      FROM t GROUP BY source, lang, split
    )
    SELECT source, lang, split, n_docs, n_toks,
      CAST(sum(n_docs) OVER (PARTITION BY source, lang) AS BIGINT)
        AS stratum_docs,
      round(100.0 * n_docs
            / sum(n_docs) OVER (PARTITION BY source, lang), 6) AS pct
    FROM g ORDER BY source, lang, split
    """,
    doc="Stratified train/val/test SPLIT manifest: per-(source, lang) "
    "stratum, every document draws a stable 0-9 bucket from the "
    "portable 48-bit md5 of its id (salt 'splt' — distinct from "
    "docs_hash_sample's 'smpl' draw, so the two draws are independent) "
    "and lands in train (<8) / val (8) / test (9). Because the split "
    "is a PURE FUNCTION of doc_id, no document can sit in two splits "
    "and re-runs/re-partitionings/new shards reproduce the same "
    "assignment — the only leakage-safe way to split 100 TB (pairwise "
    "split-intersection emptiness is pinned in "
    "tests/test_round9_curation.py). The manifest rolls up per-stratum "
    "doc and token counts with realized split percentages (exact "
    "integer ratios divided once). One scan, one keyed agg, one "
    "stratum-partitioned window that reuses the agg's partitioning.",
)
def docs_split_manifest(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

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
    t = table(spark, sf, "documents").select(
        "source",
        "lang",
        split.alias("split"),
        F.size(T.tokens(F.col("text"))).alias("n_toks"),
    )
    g = t.groupBy("source", "lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_toks"),
    )
    w = Window.partitionBy("source", "lang")
    return g.select(
        "source",
        "lang",
        "split",
        "n_docs",
        "n_toks",
        F.sum("n_docs").over(w).cast("long").alias("stratum_docs"),
        F.round(
            F.lit(100.0) * F.col("n_docs") / F.sum("n_docs").over(w), 6
        ).alias("pct"),
    ).orderBy("source", "lang", "split")


# ---------------------------------------------------------------------------
# Water-filling quota rebalancing (shared by docs_split_rebalance and
# docs_rebalance_select).  The CTE chain and the DataFrame builder are
# the SAME logic kept side by side: a global token budget (60% of the
# train split, exact integer floor) is distributed across (source,
# lang) strata; with strata sorted ascending by size, the cut k is the
# largest index whose prefix sum plus (n-k) copies of its own size
# fits the budget, the integer cap is one exact division, and the
# division remainder goes one token each to the first remainder-many
# capped strata in deterministic order — so sum(quota) == budget
# EXACTLY whenever anything is capped.
# ---------------------------------------------------------------------------

_WATERFILL_CTES = f"""t AS (
      SELECT source, lang, len({_TOKS}) AS n_toks
      FROM documents
      WHERE ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 < 8
    ),
    s AS (
      SELECT source, lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS stratum_toks
      FROM t GROUP BY source, lang
    ),
    tot AS (
      SELECT (sum(stratum_toks) * 3) // 5 AS budget,
             CAST(count(*) AS BIGINT) AS n
      FROM s
    ),
    r AS (
      SELECT s.*, tot.budget, tot.n,
        row_number() OVER (ORDER BY stratum_toks, source, lang) AS idx,
        sum(stratum_toks) OVER (ORDER BY stratum_toks, source, lang
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      FROM s, tot
    ),
    kk AS (
      SELECT
        coalesce(max(CASE WHEN pre + (n - idx) * stratum_toks <= budget
                          THEN idx END), 0) AS k,
        coalesce(max(CASE WHEN pre + (n - idx) * stratum_toks <= budget
                          THEN pre END), 0) AS pk
      FROM r
    ),
    wq AS (
      SELECT r.*, kk.k,
        CAST(CASE WHEN idx <= kk.k THEN stratum_toks
             ELSE (CASE WHEN r.n > kk.k
                        THEN (r.budget - kk.pk) // (r.n - kk.k)
                        ELSE 0 END)
                  + (CASE WHEN idx - kk.k <=
                          (CASE WHEN r.n > kk.k
                                THEN (r.budget - kk.pk) % (r.n - kk.k)
                                ELSE 0 END)
                          THEN 1 ELSE 0 END)
             END AS BIGINT) AS quota_toks
      FROM r, kk
    )"""


def _waterfill_over(s: DataFrame, mass: str, quota_name: str) -> DataFrame:
    """Water-fill a 60% budget (exact integer floor of total ``mass``)
    across the strata of ``s``: returns every column of ``s`` plus
    (idx, k, ``quota_name``).  ``s`` must carry (source, lang) for
    deterministic tie-breaking and a BIGINT ``mass`` column.

    Scale shape: everything here runs on the STRATA relation, bounded
    by |sources| x |langs| regardless of corpus size — the window and
    both 1-row scalar joins never see per-document rows.
    """
    tot = s.agg(
        F.expr(f"(sum({mass}) * 3) div 5").alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ww = Window.orderBy(mass, "source", "lang")
    r = (
        s.crossJoin(F.broadcast(tot))
        .withColumn("idx", F.row_number().over(ww).cast("long"))
        .withColumn(
            "pre",
            F.sum(mass)
            .over(ww.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
    )
    fits = F.col("pre") + (F.col("n") - F.col("idx")) * F.col(
        mass
    ) <= F.col("budget")
    kk = r.agg(
        F.coalesce(F.max(F.when(fits, F.col("idx"))), F.lit(0).cast("long"))
        .alias("k"),
        F.coalesce(F.max(F.when(fits, F.col("pre"))), F.lit(0).cast("long"))
        .alias("pk"),
    )
    q = (
        r.crossJoin(F.broadcast(kk))
        .withColumn(
            "cap",
            F.when(
                F.col("n") > F.col("k"),
                F.expr("(budget - pk) div (n - k)"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "rem",
            F.when(
                F.col("n") > F.col("k"),
                (F.col("budget") - F.col("pk")) % (F.col("n") - F.col("k")),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    quota = F.when(F.col("idx") <= F.col("k"), F.col(mass)).otherwise(
        F.col("cap")
        + F.when(F.col("idx") - F.col("k") <= F.col("rem"), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    return q.select(
        *s.columns, "idx", "k", quota.cast("long").alias(quota_name)
    )


def _waterfill_quotas(spark: SparkSession, sf: str) -> DataFrame:
    """Per-stratum water-filling quotas as a DataFrame (the exact
    DataFrame mirror of ``_WATERFILL_CTES``): columns (source, lang,
    n_docs, stratum_toks, idx, k, quota_toks)."""
    b = (
        T.portable_hash64(
            F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
        )
        % 10
    )
    t = (
        table(spark, sf, "documents")
        .filter(b < 8)
        .select(
            "source", "lang", F.size(T.tokens(F.col("text"))).alias("n_toks")
        )
    )
    s = t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("stratum_toks"),
    )
    return _waterfill_over(s, "stratum_toks", "quota_toks")


@register(
    "docs_split_rebalance",
    oracle=f"""
    WITH {_WATERFILL_CTES}
    SELECT source, lang, n_docs, stratum_toks, quota_toks,
      CAST(CASE WHEN idx <= k THEN 0 ELSE 1 END AS BIGINT) AS capped,
      round(CAST(quota_toks AS DOUBLE)
            / greatest(stratum_toks, 1), 6) AS fill_frac
    FROM wq ORDER BY source, lang
    """,
    doc="Per-stratum QUOTA REBALANCING over the split manifest (the "
    "staged round-8 candidate): a global token budget — 60%% of the "
    "train split's tokens, exact integer floor — is distributed "
    "across (source, lang) strata by WATER-FILLING: every stratum "
    "smaller than the water level keeps all its tokens, every larger "
    "stratum is capped at the level, and the level is the unique "
    "integer cap where the allocation exactly exhausts the budget "
    "(the division remainder goes one token each to the first "
    "remainder-many capped strata in deterministic order, so "
    "sum(quota_toks) == budget EXACTLY — pinned as an invariant). "
    "The closed form avoids iteration: with strata sorted ascending "
    "by size, the cut k is the largest index whose prefix sum plus "
    "(n-k) copies of its own size fits the budget; the cap is then "
    "one exact integer division. Scale shape: the only per-document "
    "work is one filtered scan + one keyed agg; the water-filling "
    "windows and both 1-row scalar joins run on the STRATA relation, "
    "bounded by |sources| x |langs| regardless of corpus size "
    "(allowlisted in _GLOBAL_WINDOW_OK / _BNLJ_OK on that bound). "
    "Reuses docs_split_manifest's salt-'splt' pure-function split, so "
    "quota composes with the manifest without a second assignment.",
)
def docs_split_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    q = _waterfill_quotas(spark, sf)
    return q.select(
        "source",
        "lang",
        "n_docs",
        "stratum_toks",
        "quota_toks",
        F.when(F.col("idx") <= F.col("k"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("capped"),
        F.round(
            F.col("quota_toks").cast("double")
            / F.greatest(F.col("stratum_toks"), F.lit(1)),
            6,
        ).alias("fill_frac"),
    ).orderBy("source", "lang")


@register(
    "docs_rebalance_select",
    oracle=f"""
    WITH {_WATERFILL_CTES},
    d AS (
      SELECT source, lang, doc_id, len({_TOKS}) AS n_toks,
        round((CASE WHEN len({_TOKS}) BETWEEN 10 AND 1000
               THEN 1.0 ELSE 0.5 END) * 0.4
              + (1.0 - (length(lower(text))
                        - length(regexp_replace(lower(text),
                                 '[^a-z0-9 ]', '', 'g')))
                   / greatest(length(lower(text)), 1)) * 0.3
              + (len(list_distinct({_TOKS}))
                 / greatest(len({_TOKS}), 1)) * 0.3, 6) AS quality
      FROM documents
      WHERE ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 < 8
    ),
    c AS (
      SELECT d.source, d.lang, d.doc_id, d.n_toks, d.quality,
        wq.quota_toks,
        sum(d.n_toks) OVER (PARTITION BY d.source, d.lang
          ORDER BY d.quality DESC, d.doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d JOIN wq ON wq.source = d.source AND wq.lang = d.lang
    )
    SELECT source, lang,
      CAST(any_value(quota_toks) AS BIGINT) AS quota_toks,
      CAST(count(CASE WHEN cum <= quota_toks THEN 1 END) AS BIGINT)
        AS n_selected,
      CAST(coalesce(sum(CASE WHEN cum <= quota_toks THEN n_toks END), 0)
           AS BIGINT) AS tok_selected,
      round(CAST(coalesce(sum(CASE WHEN cum <= quota_toks THEN n_toks END),
                          0) AS DOUBLE)
            / greatest(any_value(quota_toks), 1), 6) AS quota_util
    FROM c GROUP BY source, lang ORDER BY source, lang
    """,
    doc="Quota APPLICATION — the selection manifest that turns "
    "docs_split_rebalance's water-filling quotas into an actual "
    "document list: within every (source, lang) train stratum, "
    "documents are ranked by the deterministic quality score (ties "
    "by doc_id, exactly docs_select_budget's discipline) and greedily "
    "kept while the running token sum stays within THAT STRATUM'S "
    "rebalanced quota (not a constant budget). The rollup reports "
    "docs/tokens selected and quota utilization; greedy never "
    "overshoots, and under-filled strata (quota_util < 1) expose "
    "where greedy whole-document packing strands budget — the "
    "bin-packing slack a mixture designer watches. Scale shape: the "
    "tiny quota relation broadcast-joins onto the per-doc scan, the "
    "greedy cumsum is a stratum-PARTITIONED window (parallel across "
    "strata, never global), and the final agg reuses the window's "
    "partitioning — one document shuffle end to end.",
)
def docs_rebalance_select(spark: SparkSession, sf: str) -> DataFrame:
    b = (
        T.portable_hash64(
            F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
        )
        % 10
    )
    toks = T.tokens(F.col("text"))
    d = (
        table(spark, sf, "documents")
        .filter(b < 8)
        .select(
            "source",
            "lang",
            "doc_id",
            F.size(toks).alias("n_toks"),
            T.quality_score(F.col("text")).alias("quality"),
        )
    )
    quotas = _waterfill_quotas(spark, sf).select(
        "source", "lang", "quota_toks"
    )
    w = (
        Window.partitionBy("source", "lang")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.join(F.broadcast(quotas), ["source", "lang"]).withColumn(
        "cum", F.sum("n_toks").over(w)
    )
    kept = F.col("cum") <= F.col("quota_toks")
    return (
        c.groupBy("source", "lang")
        .agg(
            F.first("quota_toks").cast("long").alias("quota_toks"),
            F.count(F.when(kept, F.lit(1))).cast("long").alias("n_selected"),
            F.coalesce(F.sum(F.when(kept, F.col("n_toks"))), F.lit(0))
            .cast("long")
            .alias("tok_selected"),
            F.round(
                F.coalesce(F.sum(F.when(kept, F.col("n_toks"))), F.lit(0))
                .cast("double")
                / F.greatest(F.first("quota_toks"), F.lit(1)),
                6,
            ).alias("quota_util"),
        )
        .orderBy("source", "lang")
    )



_FUNNEL_STAGES = [
    (1, "length"),
    (2, "language"),
    (3, "punctuation"),
    (4, "diversity"),
    (5, "pii"),
    (6, "pass"),
]

# PII-augmented text (docs_pii_redaction's deterministic injection),
# exposed as a column named ``text`` so the shared token fragment
# applies unchanged.
_FUNNEL_AUG_SQL = """
      SELECT doc_id,
        text
        || CASE WHEN doc_id % 7 = 0
             THEN ' contact user' || doc_id || '@example.com now'
             ELSE '' END
        || CASE WHEN doc_id % 11 = 0
             THEN ' call 555-' || (1000 + doc_id % 9000) || ' today'
             ELSE '' END
        || CASE WHEN doc_id % 13 = 0
             THEN ' from 10.' || (doc_id % 256) || '.'
                  || ((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256)
             ELSE '' END AS text
      FROM documents
"""


def _funnel_stopword_sql() -> str:
    from graphdatabases_spark.functions.text import LANG_STOPWORDS

    words = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "docs_filter_funnel",
    oracle=f"""
    WITH aug AS ({_FUNNEL_AUG_SQL}),
    d AS (
      SELECT doc_id,
        len(tk) AS n_toks,
        len(list_distinct(tk)) AS n_uniq,
        len(list_filter(list_distinct(tk),
            x -> list_contains({_funnel_stopword_sql()}, x))) AS stop_hits,
        length(lower(text)) AS n_ch,
        length(lower(text))
          - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
          AS n_punct,
        len(regexp_extract_all(text, '{_EMAIL_RE}'))
          + len(regexp_extract_all(text, '\\b555-[0-9]{{4}}\\b'))
          + len(regexp_extract_all(text,
                '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS pii
      FROM (SELECT doc_id, text, {{toks}} AS tk FROM aug)
    ),
    staged AS (
      SELECT n_toks,
        CASE WHEN n_toks NOT BETWEEN 10 AND 1000 THEN 1
             WHEN stop_hits = 0 THEN 2
             WHEN (10000 * n_punct) // greatest(n_ch, 1) >= 2000 THEN 3
             WHEN (10000 * n_uniq) // greatest(n_toks, 1) < 3000 THEN 4
             WHEN pii > 0 THEN 5
             ELSE 6 END AS stage
      FROM d
    ),
    agg AS (
      SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_toks
      FROM staged GROUP BY stage
    ),
    spec AS (
      SELECT * FROM (VALUES {", ".join(f"({s}, '{n}')" for s, n in _FUNNEL_STAGES)})
        v(stage, stage_name)
    ),
    filled AS (
      SELECT spec.stage, spec.stage_name,
        coalesce(agg.n_docs, 0) AS n_docs,
        coalesce(agg.n_toks, 0) AS n_toks
      FROM spec LEFT JOIN agg USING (stage)
    )
    SELECT CAST(stage AS BIGINT) AS stage, stage_name,
      CAST(n_docs AS BIGINT) AS n_docs,
      CAST(n_toks AS BIGINT) AS n_toks,
      CAST(sum(n_docs) OVER () - sum(CASE WHEN stage <= 5 THEN n_docs ELSE 0 END)
             OVER (ORDER BY stage ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS surviving_docs,
      CAST((1000000 * n_docs) // greatest(sum(n_docs) OVER (), 1) AS BIGINT)
        AS share_ppm
    FROM filled ORDER BY stage
    """.replace("{toks}", _TOKS),
    doc="Curation FILTER-FUNNEL attribution: the ordered filter chain "
    "(length band 10..1000 -> language-ID by stopword evidence -> "
    "punctuation share < 20%% -> vocabulary diversity >= 30%% -> "
    "PII-free) is applied first-failure-wins, so every document is "
    "attributed to exactly ONE stage (or 'pass') — the per-stage "
    "rejection table a pipeline publishes to explain where its corpus "
    "went, which a chain of independent filter counts cannot do "
    "(double-counting). PII uses docs_pii_redaction's deterministic "
    "injection so stage 5 has real attrition. All thresholds are "
    "INTEGER basis-point floors and the share column is exact integer "
    "ppm — no rounded continuous value anywhere. surviving_docs is "
    "the running survivor count (input minus rejections through this "
    "stage; the 'pass' row equals its own n_docs by construction — "
    "pinned in pytest with a per-document Python replay). Scale "
    "shape: ONE scan computes every per-row predicate (regex + HOF "
    "folds, no UDFs), one 6-group hash-agg; the window/cumsum run on "
    "the 6-row stage relation (bounded by the stage list, allowlisted "
    "like the quantile-spec frame).",
)
def docs_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions.text import LANG_STOPWORDS

    doc_id = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            doc_id % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                doc_id.cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(""),
        F.when(
            doc_id % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                (F.lit(1000) + doc_id % 9000).cast("string"),
                F.lit(" today"),
            ),
        ).otherwise(""),
        F.when(
            doc_id % 13 == 0,
            F.concat(
                F.lit(" from 10."),
                (doc_id % 256).cast("string"),
                F.lit("."),
                ((doc_id * 7) % 256).cast("string"),
                F.lit("."),
                ((doc_id * 13) % 256).cast("string"),
            ),
        ).otherwise(""),
    )
    stops = F.array(
        *[
            F.lit(w)
            for w in sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
        ]
    )
    t = F.col("text")
    low = F.lower(t)
    toks = T.tokens(t)
    d = (
        table(spark, sf, "documents")
        .select("doc_id", aug.alias("text"))
        .select(
            F.size(toks).alias("n_toks"),
            F.size(F.array_distinct(toks)).alias("n_uniq"),
            F.size(
                F.filter(
                    F.array_distinct(toks),
                    lambda x: F.array_contains(stops, x),
                )
            ).alias("stop_hits"),
            F.length(low).alias("n_ch"),
            (
                F.length(low)
                - F.length(F.regexp_replace(low, "[^a-z0-9 ]", ""))
            ).alias("n_punct"),
            (
                F.regexp_count(t, F.lit(_EMAIL_RE))
                + F.regexp_count(t, F.lit(_PHONE_RE))
                + F.regexp_count(t, F.lit(_IP_RE))
            ).alias("pii"),
        )
    )
    stage = (
        F.when(~F.col("n_toks").between(10, 1000), F.lit(1))
        .when(F.col("stop_hits") == 0, F.lit(2))
        .when(
            F.expr("(10000 * n_punct) div greatest(n_ch, 1)") >= 2000,
            F.lit(3),
        )
        .when(
            F.expr("(10000 * n_uniq) div greatest(n_toks, 1)") < 3000,
            F.lit(4),
        )
        .when(F.col("pii") > 0, F.lit(5))
        .otherwise(F.lit(6))
    )
    agg = (
        d.select(stage.alias("stage"), "n_toks")
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_toks"),
        )
    )
    spec = spark.createDataFrame(
        _FUNNEL_STAGES, "stage int, stage_name string"
    )
    filled = (
        spec.join(agg, "stage", "left")
        .select(
            "stage",
            "stage_name",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("n_docs").over(w_all)
    rejected_cum = F.sum(
        F.when(F.col("stage") <= 5, F.col("n_docs")).otherwise(F.lit(0))
    ).over(w_cum)
    return filled.select(
        F.col("stage").cast("long").alias("stage"),
        "stage_name",
        "n_docs",
        "n_toks",
        (total - rejected_cum).cast("long").alias("surviving_docs"),
        F.expr(
            f"CAST((1000000 * n_docs) div greatest(sum(n_docs) OVER (), 1)"
            f" AS BIGINT)"
        ).alias("share_ppm"),
    ).orderBy("stage")


_QBP_DOC_SQL = """
      SELECT source, lang, n_toks,
        n_toks * (
          (CASE WHEN n_toks BETWEEN 10 AND 1000 THEN 4000 ELSE 2000 END)
          + (3000 - (3000 * n_punct) // greatest(n_ch, 1))
          + ((3000 * n_uniq) // greatest(n_toks, 1))
        ) AS qmass
      FROM (
        SELECT source, lang,
          len(tk) AS n_toks,
          len(list_distinct(tk)) AS n_uniq,
          length(lower(text)) AS n_ch,
          length(lower(text))
            - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
            AS n_punct
        FROM (
          SELECT source, lang, text, {toks} AS tk FROM documents
          WHERE ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 < 8
        )
      )
""".format(toks=_TOKS)


@register(
    "docs_rebalance_quality",
    oracle=f"""
    WITH t AS ({_QBP_DOC_SQL}),
    s AS (
      SELECT source, lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS stratum_toks,
        CAST(sum(qmass) AS BIGINT) AS stratum_qmass
      FROM t GROUP BY source, lang
    ),
    tot AS (
      SELECT (sum(stratum_qmass) * 3) // 5 AS budget,
             CAST(count(*) AS BIGINT) AS n
      FROM s
    ),
    r AS (
      SELECT s.*, tot.budget, tot.n,
        row_number() OVER (ORDER BY stratum_qmass, source, lang) AS idx,
        sum(stratum_qmass) OVER (ORDER BY stratum_qmass, source, lang
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      FROM s, tot
    ),
    kk AS (
      SELECT
        coalesce(max(CASE WHEN pre + (n - idx) * stratum_qmass <= budget
                          THEN idx END), 0) AS k,
        coalesce(max(CASE WHEN pre + (n - idx) * stratum_qmass <= budget
                          THEN pre END), 0) AS pk
      FROM r
    ),
    wq AS (
      SELECT r.*, kk.k,
        CAST(CASE WHEN idx <= kk.k THEN stratum_qmass
             ELSE (CASE WHEN r.n > kk.k
                        THEN (r.budget - kk.pk) // (r.n - kk.k)
                        ELSE 0 END)
                  + (CASE WHEN idx - kk.k <=
                          (CASE WHEN r.n > kk.k
                                THEN (r.budget - kk.pk) % (r.n - kk.k)
                                ELSE 0 END)
                          THEN 1 ELSE 0 END)
             END AS BIGINT) AS quota_qmass
      FROM r, kk
    )
    SELECT source, lang, n_docs, stratum_toks, stratum_qmass,
      CAST(stratum_qmass // greatest(stratum_toks, 1) AS BIGINT) AS avg_q_bp,
      quota_qmass,
      CAST(CASE WHEN idx <= k THEN 0 ELSE 1 END AS BIGINT) AS capped,
      round(CAST(quota_qmass AS DOUBLE)
            / greatest(stratum_qmass, 1), 6) AS fill_frac
    FROM wq ORDER BY source, lang
    """,
    doc="QUALITY-MASS-weighted quota rebalancing — the "
    "docs_split_rebalance variant where the water level is set over "
    "per-stratum QUALITY mass instead of raw token counts, so a "
    "stratum full of boilerplate-heavy low-quality documents draws a "
    "smaller share of the training budget than its token count alone "
    "would buy. Each train-split document scores an INTEGER quality "
    "weight in basis points (0..10000): a length-band term (4000 in "
    "the 10..1000-token band, else 2000), a cleanliness term (3000 "
    "minus the punctuation-character share, integer floor), and a "
    "vocabulary-diversity term (3000 x distinct/total tokens, integer "
    "floor) — the integer rubric of text_quality_score's float "
    "heuristic, chosen so per-doc mass = n_toks x q_bp and every "
    "stratum sum is an EXACT BIGINT (order- and partitioning-"
    "invariant, no float accumulation). The budget is 60%% of total "
    "train quality mass (integer floor) and the closed-form "
    "water-filling (shared _waterfill_over kernel) distributes it "
    "with the remainder rule, so sum(quota_qmass) == budget exactly "
    "whenever anything is capped. avg_q_bp exposes each stratum's "
    "realized mean quality. Scale shape: one filtered scan + one "
    "keyed agg do all per-document work; the window and 1-row scalar "
    "joins run on the strata relation, bounded by |sources| x |langs|.",
)
def docs_rebalance_quality(spark: SparkSession, sf: str) -> DataFrame:
    b = (
        T.portable_hash64(
            F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
        )
        % 10
    )
    low = F.lower(F.col("text"))
    toks = T.tokens(F.col("text"))
    t = (
        table(spark, sf, "documents")
        .filter(b < 8)
        .select(
            "source",
            "lang",
            F.size(toks).alias("n_toks"),
            F.size(F.array_distinct(toks)).alias("n_uniq"),
            F.length(low).alias("n_ch"),
            (
                F.length(low)
                - F.length(F.regexp_replace(low, "[^a-z0-9 ]", ""))
            ).alias("n_punct"),
        )
        .select(
            "source",
            "lang",
            "n_toks",
            (
                F.col("n_toks").cast("long")
                * (
                    F.when(
                        F.col("n_toks").between(10, 1000), F.lit(4000)
                    ).otherwise(F.lit(2000))
                    + (
                        F.lit(3000)
                        - F.expr("(3000 * n_punct) div greatest(n_ch, 1)")
                    )
                    + F.expr("(3000 * n_uniq) div greatest(n_toks, 1)")
                ).cast("long")
            ).alias("qmass"),
        )
    )
    s = t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("stratum_toks"),
        F.sum("qmass").cast("long").alias("stratum_qmass"),
    )
    q = _waterfill_over(s, "stratum_qmass", "quota_qmass")
    return q.select(
        "source",
        "lang",
        "n_docs",
        "stratum_toks",
        "stratum_qmass",
        F.expr("stratum_qmass div greatest(stratum_toks, 1)")
        .cast("long")
        .alias("avg_q_bp"),
        "quota_qmass",
        F.when(F.col("idx") <= F.col("k"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("capped"),
        F.round(
            F.col("quota_qmass").cast("double")
            / F.greatest(F.col("stratum_qmass"), F.lit(1)),
            6,
        ).alias("fill_frac"),
    ).orderBy("source", "lang")


@register(
    "docs_bigram_lm_score",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks,
        ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 AS b
      FROM documents
    ),
    trn AS (SELECT doc_id, toks FROM d WHERE b < 8),
    val AS (SELECT doc_id, toks FROM d WHERE b = 8 AND len(toks) >= 2),
    tu AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c1
      FROM (SELECT unnest(toks) AS tok FROM trn) GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM tu),
    tb AS (
      SELECT big, CAST(count(*) AS BIGINT) AS c2 FROM (
        SELECT unnest(list_transform(range(1, len(toks)),
          i -> toks[i] || ' ' || toks[i+1])) AS big
        FROM trn
      ) GROUP BY big
    ),
    vb AS (
      SELECT doc_id, big,
        string_split(big, ' ')[1] AS w1,
        string_split(big, ' ')[2] AS w2
      FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          i -> toks[i] || ' ' || toks[i+1])) AS big
        FROM val
      )
    ),
    sc AS (
      SELECT v.doc_id,
        CASE WHEN tb.c2 IS NOT NULL
             THEN CAST(length(bin(u1.c1 // tb.c2)) - 1 AS BIGINT)
             WHEN u2.c1 IS NOT NULL
             THEN 4 + CAST(length(bin(tot.n_total // u2.c1)) - 1 AS BIGINT)
             ELSE 8 + CAST(length(bin(tot.n_total)) - 1 AS BIGINT)
        END AS surprise,
        CASE WHEN tb.c2 IS NULL AND u2.c1 IS NOT NULL
             THEN 1 ELSE 0 END AS is_backoff,
        CASE WHEN tb.c2 IS NULL AND u2.c1 IS NULL
             THEN 1 ELSE 0 END AS is_oov
      FROM vb v
      LEFT JOIN tb ON tb.big = v.big
      LEFT JOIN tu u1 ON u1.tok = v.w1
      LEFT JOIN tu u2 ON u2.tok = v.w2
      CROSS JOIN tot
    )
    SELECT doc_id,
      CAST(count(*) AS BIGINT) AS n_bigrams,
      CAST(sum(is_backoff) AS BIGINT) AS n_backoff,
      CAST(sum(is_oov) AS BIGINT) AS n_oov,
      CAST(sum(surprise) AS BIGINT) AS sum_surprise,
      round(CAST(sum(surprise) AS DOUBLE) / count(*), 6) AS avg_surprise,
      round(CAST(sum(surprise) AS DOUBLE) / count(*), 6) > 4.5
        AS flagged_gibberish
    FROM sc GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Bigram-LM scoring (the CCNet/KenLM statistical-quality shape, "
    "trained ON-ENGINE): bigram and unigram count tables are built "
    "from the TRAIN split (salt-'splt' bucket < 8 — the same "
    "pure-function split the manifest/rebalance entries use, so the "
    "LM never sees its own eval data), and every VAL-split document "
    "(bucket == 8, >= 2 tokens) is scored by mean conditional "
    "surprise with stupid-backoff: a train-seen bigram costs "
    "floor(log2(C(w1)/C(w1w2))) bits, an unseen bigram backs off to "
    "the unigram surprise plus a fixed 4-bit penalty, and an "
    "out-of-vocabulary token pays the full-corpus surprise plus 8 — "
    "all INTEGER bit counts via binary digit length, so both engines "
    "agree with no libm log involved (docs_unigram_surprise's "
    "discipline, lifted to conditional probabilities). Documents the "
    "train LM predicts worst (avg > 4.5 bits — the operating point "
    "for THIS fixture corpus; production recalibrates it per run on "
    "the score histogram) are flagged — the "
    "gibberish filter a curation pipeline runs after the heuristic "
    "passes. Scale shape: both count tables are hash-aggs bounded by "
    "(bi)vocabulary size, not corpus size; scoring is three "
    "fixed-width left equi-joins + one keyed agg, and the corpus "
    "total is a broadcast 1-row scalar. At 100 TB the bigram table "
    "outgrows broadcast and the join degrades gracefully to a "
    "shuffle hash join on the bigram key.",
)
def docs_bigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    b = (
        T.portable_hash64(
            F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
        )
        % 10
    )
    d = table(spark, sf, "documents").select(
        "doc_id", T.tokens(F.col("text")).alias("toks"), b.alias("b")
    )
    trn = d.filter(F.col("b") < 8)
    val = d.filter((F.col("b") == 8) & (F.size("toks") >= 2))

    def bigrams(toks):
        return F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        )

    tu = (
        trn.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    tot = tu.agg(F.sum("c1").cast("long").alias("n_total"))
    tb = (
        trn.select(F.explode(bigrams(F.col("toks"))).alias("big"))
        .groupBy("big")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    vb = val.select(
        "doc_id", F.explode(bigrams(F.col("toks"))).alias("big")
    ).select(
        "doc_id",
        "big",
        F.split(F.col("big"), " ")[0].alias("w1"),
        F.split(F.col("big"), " ")[1].alias("w2"),
    )
    u1 = tu.select(F.col("tok").alias("w1"), F.col("c1").alias("c1_w1"))
    u2 = tu.select(F.col("tok").alias("w2"), F.col("c1").alias("c1_w2"))
    bits = lambda x: (F.length(F.bin(x)) - 1).cast("long")  # noqa: E731
    sc = (
        vb.join(tb, "big", "left")
        .join(F.broadcast(u1), "w1", "left")
        .join(F.broadcast(u2), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(
                F.col("c2").isNotNull(),
                bits(F.expr("c1_w1 div c2")),
            )
            .when(
                F.col("c1_w2").isNotNull(),
                F.lit(4) + bits(F.expr("n_total div c1_w2")),
            )
            .otherwise(F.lit(8) + bits(F.col("n_total")))
            .alias("surprise"),
            F.when(
                F.col("c2").isNull() & F.col("c1_w2").isNotNull(), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("is_backoff"),
            F.when(F.col("c2").isNull() & F.col("c1_w2").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_oov"),
        )
    )
    avg = F.round(
        F.col("sum_surprise").cast("double") / F.col("n_bigrams"), 6
    )
    return (
        sc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("is_backoff").cast("long").alias("n_backoff"),
            F.sum("is_oov").cast("long").alias("n_oov"),
            F.sum("surprise").cast("long").alias("sum_surprise"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_backoff",
            "n_oov",
            "sum_surprise",
            avg.alias("avg_surprise"),
            (avg > 4.5).alias("flagged_gibberish"),
        )
        .orderBy("doc_id")
    )


@register(
    "docs_shard_rebalance",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id,
        ('0x' || substr(md5('shrd' || doc_id), 1, 12))::BIGINT AS h
      FROM documents
    ),
    a AS (
      SELECT source, doc_id,
        h % 10 AS mod10, h % 11 AS mod11,
        list_max(list_transform(range(0, 10), s ->
          (('0x' || substr(md5(doc_id || '#' || s), 1, 12))::BIGINT) * 16
          + s)) % 16 AS hrw10,
        list_max(list_transform(range(0, 11), s ->
          (('0x' || substr(md5(doc_id || '#' || s), 1, 12))::BIGINT) * 16
          + s)) % 16 AS hrw11
      FROM d
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN mod10 <> mod11 THEN 1 ELSE 0 END) AS BIGINT)
        AS moved_mod,
      CAST(sum(CASE WHEN hrw10 <> hrw11 THEN 1 ELSE 0 END) AS BIGINT)
        AS moved_hrw,
      CAST(sum(CASE WHEN hrw10 <> hrw11 AND hrw11 = 10
               THEN 1 ELSE 0 END) AS BIGINT) AS moved_to_new,
      round(CAST(sum(CASE WHEN mod10 <> mod11 THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS frac_moved_mod,
      round(CAST(sum(CASE WHEN hrw10 <> hrw11 THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS frac_moved_hrw
    FROM a GROUP BY source ORDER BY source
    """,
    doc="Shard REBALANCE cost under modulo vs RENDEZVOUS (highest-"
    "random-weight) hashing when the shard count grows 10 -> 11 — the "
    "operational question behind every 100-TB resharding: modulo "
    "reassigns ~10/11 of all keys (every byte re-shuffles), while HRW "
    "— shard(k) = argmax_s H(k||s), computed portably as max over "
    "(48-bit salted md5)*16+s so the argmax decodes from one BIGINT "
    "max with deterministic tie-break in both engines — moves only "
    "the ~1/11 of keys claimed by the NEW shard, and NEVER between "
    "two old shards (moved_to_new == moved_hrw, visible in the "
    "value hash; also pinned as an invariant). Pure per-row folds + "
    "one keyed agg — zero joins, zero shuffle beyond the final agg; "
    "at 100 TB the frac_moved_hrw column IS the fraction of the "
    "corpus a shard-add forces through the network.",
)
def docs_shard_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    def hrw(n):
        return (
            F.array_max(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n - 1)),
                    lambda s: T.portable_hash64(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#"),
                            s.cast("string"),
                        )
                    )
                    * 16
                    + s,
                )
            )
            % 16
        )

    h = T.portable_hash64(
        F.concat(F.lit("shrd"), F.col("doc_id").cast("string"))
    )
    a = table(spark, sf, "documents").select(
        "source",
        (h % 10).alias("mod10"),
        (h % 11).alias("mod11"),
        hrw(10).alias("hrw10"),
        hrw(11).alias("hrw11"),
    )
    moved_mod = F.sum(F.when(F.col("mod10") != F.col("mod11"), 1).otherwise(0))
    moved_hrw = F.sum(F.when(F.col("hrw10") != F.col("hrw11"), 1).otherwise(0))
    return (
        a.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            moved_mod.cast("long").alias("moved_mod"),
            moved_hrw.cast("long").alias("moved_hrw"),
            F.sum(
                F.when(
                    (F.col("hrw10") != F.col("hrw11"))
                    & (F.col("hrw11") == 10),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("moved_to_new"),
            F.round(moved_mod.cast("double") / F.count(F.lit(1)), 6).alias(
                "frac_moved_mod"
            ),
            F.round(moved_hrw.cast("double") / F.count(F.lit(1)), 6).alias(
                "frac_moved_hrw"
            ),
        )
        .orderBy("source")
    )


_PPS_PER_SOURCE = 8


@register(
    "docs_pps_sample",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS w
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, w,
             CAST(sum(w) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS tot
      FROM t
    ),
    s AS (
      SELECT source, doc_id, w, cum, tot,
             greatest(tot // {_PPS_PER_SOURCE}, 1) AS step
      FROM c
    )
    SELECT source, doc_id, w AS n_tokens,
           CAST(cum // step - (cum - w) // step AS BIGINT) AS n_hits,
           CAST((cum - w) // step + 1 AS BIGINT) AS first_tick
    FROM s
    WHERE cum // step > (cum - w) // step
    ORDER BY source, doc_id
    """,
    doc=f"PPS SYSTEMATIC SAMPLING (probability proportional to size): "
    "the survey-sampling / data-selection operator that draws "
    f"~{_PPS_PER_SOURCE} docs per source with inclusion probability "
    "∝ token count — per-source token cumsum, tick interval = "
    "total_tokens // n, a doc is drawn iff its cumulative span "
    "crosses a tick (n_hits counts multi-tick whales, the "
    "with-replacement convention; first_tick names the draw). Pure "
    "integer arithmetic end-to-end (cumsum, floor-divided ticks), so "
    "the realized sample is a deterministic pure function of the "
    "corpus — same selection on any engine, any partitioning — "
    "unlike rand()-based PPS. Complements docs_hash_sample (uniform "
    "Bernoulli) and docs_stratified_sample (per-stratum uniform): "
    "this is the size-biased axis selection pipelines use for "
    "token-budget-faithful subsamples. Scale shape: one per-source "
    "window cumsum (partitioned — never a global sort) + a per-row "
    "tick test; output bounded by ~n per source.",
)
def docs_pps_sample(spark: SparkSession, sf: str) -> DataFrame:
    t = table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("long").alias("w"),
    )
    w_cum = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy("source")
    c = t.select(
        "source",
        "doc_id",
        "w",
        F.sum("w").over(w_cum).cast("long").alias("cum"),
        F.sum("w").over(w_tot).cast("long").alias("tot"),
    ).withColumn(
        "step", F.greatest(F.expr(f"tot div {_PPS_PER_SOURCE}"), F.lit(1))
    )
    return (
        c.filter(F.expr("cum div step > (cum - w) div step"))
        .select(
            "source",
            F.col("doc_id"),
            F.col("w").alias("n_tokens"),
            F.expr("CAST(cum div step - (cum - w) div step AS BIGINT)").alias(
                "n_hits"
            ),
            F.expr("CAST((cum - w) div step + 1 AS BIGINT)").alias(
                "first_tick"
            ),
        )
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling weights
# ---------------------------------------------------------------------------

_DSIR_B = 1024  # hashed feature buckets
_DSIR_SCALE = 24  # fixed-point ratio scale: r = (p_t/p_c) * 2^24
_DSIR_CLIP = 48  # temperature clip: |per-feature log ratio| <= 6 bits (48/8)
# Round-to-NEAREST eighth-bit log2 thresholds: rm in [2^20, 2^21) gets
# k extra eighths iff rm >= floor(2^((2k-1)/16) * 2^20) — half-quantum
# offsets, so the quantizer rounds instead of floors (a floor quantizer
# biases every near-1 ratio a half-quantum negative, which at ~90
# features/doc buried the target-domain signal under a −62 milli
# offset; measured during round 9).
_DSIR_EIGHTH_THRESHOLDS = [
    __import__("math").floor(2 ** ((2 * k - 1) / 16) * 2 ** 20)
    for k in range(1, 9)
]


def _dsir_eighths_sql(rm: str) -> str:
    """Σ_k [rm >= c_k] — the fractional eighth-bits of log2(rm/2^20)."""
    return " + ".join(
        f"CASE WHEN {rm} >= {c} THEN 1 ELSE 0 END"
        for c in _DSIR_EIGHTH_THRESHOLDS
    )


@register(
    "docs_dsir_weights",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks,
        lang,
        ('0x' || substr(md5('splt' || doc_id), 1, 12))::BIGINT % 10 AS b
      FROM documents
    ),
    feats AS MATERIALIZED (
      SELECT doc_id, lang, b,
        ('0x' || substr(md5('dsir:' || g), 1, 12))::BIGINT % {_DSIR_B}
          AS bkt
      FROM (
        SELECT doc_id, lang, b, unnest(toks) AS g FROM d
        UNION ALL
        SELECT doc_id, lang, b,
          unnest(list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i+1]))
        FROM d
      )
    ),
    tmod AS (SELECT bkt, CAST(count(*) AS BIGINT) AS tc FROM feats
             WHERE b < 8 AND lang = 'en' GROUP BY bkt),
    cmod AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cc FROM feats
             WHERE b < 8 GROUP BY bkt),
    tots AS (
      SELECT CAST((SELECT coalesce(sum(tc), 0) FROM tmod) AS BIGINT) AS tt,
             CAST((SELECT coalesce(sum(cc), 0) FROM cmod) AS BIGINT) AS ct
    ),
    lr0 AS (
      SELECT g.range AS bkt,
        CAST((CAST(coalesce(t.tc, 0) + 1 AS DECIMAL(38,0))
              * (ct + {_DSIR_B}) * {2 ** _DSIR_SCALE})
             // ((coalesce(c.cc, 0) + 1) * (tt + {_DSIR_B}))
          AS BIGINT) AS r
      FROM range(0, {_DSIR_B}) g
      LEFT JOIN tmod t ON t.bkt = g.range
      LEFT JOIN cmod c ON c.bkt = g.range
      CROSS JOIN tots
    ),
    lr1 AS (
      SELECT bkt, length(bin(r)) - 1 AS e,
        CASE WHEN length(bin(r)) - 1 >= 20
             THEN r // (1::BIGINT << (length(bin(r)) - 1 - 20))
             ELSE r * (1::BIGINT << (20 - (length(bin(r)) - 1)))
        END AS rm
      FROM lr0
    ),
    lr AS (
      SELECT bkt,
        greatest(-{_DSIR_CLIP}, least({_DSIR_CLIP},
          8 * (e - {_DSIR_SCALE}) + ({_dsir_eighths_sql("rm")}))) AS lr
      FROM lr1
    ),
    per AS (
      SELECT f.doc_id, min(f.b) AS b,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(l.lr) AS BIGINT) AS w_ebits
      FROM feats f JOIN lr l ON l.bkt = f.bkt
      GROUP BY f.doc_id
    )
    SELECT doc_id,
      CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
           ELSE 'test' END AS split,
      n_feats, w_ebits,
      CAST((125 * (w_ebits + {_DSIR_CLIP} * n_feats)) // n_feats
           AS BIGINT) - 6000 AS w_milli,
      (b < 8 AND CAST((125 * (w_ebits + {_DSIR_CLIP} * n_feats))
                      // n_feats AS BIGINT) - 6000 > 0) AS selected
    FROM per WHERE n_feats > 0 ORDER BY doc_id
    """,
    doc="DSIR-style importance resampling weights (Xie et al. 2023, "
    "Data Selection via Importance Resampling): hashed n-gram "
    f"features (unigrams + adjacent bigrams, portable-md5 into "
    f"{_DSIR_B} buckets), a TARGET bag-of-buckets model fit on "
    "train-split English docs vs a CORPUS model fit on the whole "
    "train split (Laplace +1 both), and a per-document importance "
    "weight = Σ per-feature log2(p_target/p_corpus). The log ratio "
    "is computed ENTIRELY in integers at EIGHTH-BIT resolution: the "
    f"2^{_DSIR_SCALE}-scaled cross-model ratio (DECIMAL(38,0) "
    "product) is normalized to a 21-bit mantissa by its bit length "
    "(the docs_unigram_surprise bin() trick) and the fractional "
    "eighths come from 8 precomputed ROUND-TO-NEAREST thresholds "
    "2^((2k−1)/16)·2^20 — a floor quantizer's half-quantum bias "
    "(−62 milli-bits/feature, measured) buried the domain signal; "
    "rounding centers non-informative buckets at exactly 0. Each "
    f"feature's ratio is TEMPERATURE-CLIPPED to ±6 bits "
    "(DSIR's heavy-tail control), and the per-doc normalized w_milli "
    "floor-division is shifted nonnegative so DuckDB floor and Spark "
    "truncate agree on negative weights. LEAKAGE-SAFE by "
    "construction: both models see only the salt-'splt' train split; "
    "val/test docs are scored but never fit. selected = train docs "
    "with positive mean log ratio — the deterministic stand-in for "
    "DSIR's Gumbel top-k; at sf0.01 it keeps 75/174 English train "
    "docs vs 1–4 per other language (90% target precision). Scale: "
    "two bucket-bounded (1024-row) model aggs, a broadcast ratio "
    "table re-joined per feature occurrence, one keyed per-doc agg — "
    "no shuffle grows beyond the feature explode.",
)
def docs_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents").select(
        "doc_id",
        T.tokens(F.col("text")).alias("toks"),
        "lang",
        (
            T.portable_hash64(
                F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
            )
            % 10
        ).alias("b"),
    )

    def bigrams(toks):
        return F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        )

    grams = d.select(
        "doc_id", "lang", "b", F.explode("toks").alias("g")
    ).unionByName(
        d.filter(F.size("toks") >= 2).select(
            "doc_id", "lang", "b", F.explode(bigrams(F.col("toks"))).alias("g")
        )
    )
    feats = grams.select(
        "doc_id",
        "lang",
        "b",
        (
            T.portable_hash64(F.concat(F.lit("dsir:"), F.col("g")))
            % _DSIR_B
        ).alias("bkt"),
    )
    train = feats.filter(F.col("b") < 8)
    tmod = (
        train.filter(F.col("lang") == "en")
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
    )
    cmod = train.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    )
    tots = tmod.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).cast("long").alias("tt")
    ).crossJoin(
        cmod.agg(F.coalesce(F.sum("cc"), F.lit(0)).cast("long").alias("ct"))
    )
    r_expr = F.expr(
        f"CAST((CAST(coalesce(tc, 0) + 1 AS DECIMAL(38,0))"
        f" * (ct + {_DSIR_B}) * {2 ** _DSIR_SCALE})"
        f" div ((coalesce(cc, 0) + 1) * (tt + {_DSIR_B})) AS BIGINT)"
    )
    rm_expr = F.expr(
        "CASE WHEN length(bin(r)) - 1 >= 20"
        " THEN r div shiftleft(CAST(1 AS BIGINT),"
        "                      CAST(length(bin(r)) - 1 - 20 AS INT))"
        " ELSE r * shiftleft(CAST(1 AS BIGINT),"
        "                    CAST(20 - (length(bin(r)) - 1) AS INT)) END"
    )
    eighths = " + ".join(
        f"CASE WHEN rm >= {c} THEN 1 ELSE 0 END"
        for c in _DSIR_EIGHTH_THRESHOLDS
    )
    lr = (
        spark.range(_DSIR_B)
        .select(F.col("id").alias("bkt"))
        .join(tmod, "bkt", "left")
        .join(cmod, "bkt", "left")
        .crossJoin(F.broadcast(tots))
        .select("bkt", r_expr.alias("r"))
        .select("bkt", "r", (F.length(F.bin("r")) - 1).alias("e"))
        .select("bkt", "e", rm_expr.alias("rm"))
        .select(
            "bkt",
            F.greatest(
                F.lit(-_DSIR_CLIP),
                F.least(
                    F.lit(_DSIR_CLIP),
                    8 * (F.col("e") - _DSIR_SCALE) + F.expr(eighths),
                ),
            ).alias("lr"),
        )
    )
    per = (
        feats.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.min("b").alias("b"),
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr").cast("long").alias("w_ebits"),
        )
        .filter(F.col("n_feats") > 0)
    )
    w_milli = F.expr(
        f"CAST((125 * (w_ebits + {_DSIR_CLIP} * n_feats)) div n_feats"
        f" AS BIGINT) - 6000"
    )
    return per.select(
        "doc_id",
        F.when(F.col("b") < 8, "train")
        .when(F.col("b") == 8, "val")
        .otherwise("test")
        .alias("split"),
        "n_feats",
        "w_ebits",
        w_milli.alias("w_milli"),
        ((F.col("b") < 8) & (w_milli > 0)).alias("selected"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-split context windows)
# ---------------------------------------------------------------------------

_PACK_CTX = 2048  # context window (tokens)
_PACK_SHARDS = 16  # independent packing streams


@register(
    "docs_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
        CAST(len({_TOKS}) AS BIGINT) AS n_tok,
        ('0x' || substr(md5('pck' || doc_id), 1, 12))::BIGINT
          % {_PACK_SHARDS} AS shard
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tok,
        sum(n_tok) OVER (
          PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum
      FROM d WHERE n_tok > 0
    ),
    marked AS (
      SELECT shard, n_tok, cum,
        CASE WHEN (cum - n_tok) // {_PACK_CTX}
             <> (cum - 1) // {_PACK_CTX} THEN 1 ELSE 0 END AS straddles
      FROM c
    )
    SELECT shard,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      CAST((sum(n_tok) + {_PACK_CTX - 1}) // {_PACK_CTX} AS BIGINT)
        AS n_bins,
      CAST(sum(straddles) AS BIGINT) AS n_straddlers,
      CAST((sum(n_tok) + {_PACK_CTX - 1}) // {_PACK_CTX} * {_PACK_CTX}
           - sum(n_tok) AS BIGINT) AS tail_pad,
      CAST((1000000 * sum(n_tok))
           // ((sum(n_tok) + {_PACK_CTX - 1}) // {_PACK_CTX}
               * {_PACK_CTX}) AS BIGINT) AS util_ppm
    FROM marked GROUP BY shard ORDER BY shard
    """,
    doc="SEQUENCE PACKING for LLM training batches — the concat-and-"
    "split strategy every GPT-style pipeline runs before batching: "
    f"docs are concatenated in a deterministic order ({_PACK_SHARDS} "
    "independent hash shards, doc_id order within a shard — exactly "
    "how per-worker packing streams run in production) and split at "
    f"{_PACK_CTX}-token context boundaries. Per shard the entry "
    "reports the packing telemetry a training job monitors: bins "
    "produced, documents straddling a context boundary (the "
    "cross-document-attention contamination count the no-split "
    "variants trade padding against), tail padding, and utilization "
    "in exact ppm (concat packing wastes only the final partial bin "
    "— util ≈ 1 — while the straddler count is the quality cost that "
    "motivates best-fit packing research). A doc straddles iff its "
    "first and last token indices (cum−n, cum−1) land in different "
    "bins — pure integer floor division, engine-exact. Scale: one "
    "per-shard running-sum window (shard count is the parallelism "
    "knob — packing streams never cross shards, so no global window "
    "and no skew beyond shard hash balance) + one bounded per-shard "
    "agg.",
)
def docs_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            T.token_count(F.col("text")).cast("long").alias("n_tok"),
            (
                T.portable_hash64(
                    F.concat(F.lit("pck"), F.col("doc_id").cast("string"))
                )
                % _PACK_SHARDS
            ).alias("shard"),
        )
        .filter(F.col("n_tok") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    straddles = F.when(
        F.expr(f"(cum - n_tok) div {_PACK_CTX}")
        != F.expr(f"(cum - 1) div {_PACK_CTX}"),
        1,
    ).otherwise(0)
    return (
        c.withColumn("straddles", straddles)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.expr(
                f"CAST((sum(n_tok) + {_PACK_CTX - 1}) div {_PACK_CTX}"
                " AS BIGINT)"
            ).alias("n_bins"),
            F.sum("straddles").cast("long").alias("n_straddlers"),
            F.expr(
                f"CAST((sum(n_tok) + {_PACK_CTX - 1}) div {_PACK_CTX}"
                f" * {_PACK_CTX} - sum(n_tok) AS BIGINT)"
            ).alias("tail_pad"),
            F.expr(
                f"CAST((1000000 * sum(n_tok))"
                f" div ((sum(n_tok) + {_PACK_CTX - 1}) div {_PACK_CTX}"
                f" * {_PACK_CTX}) AS BIGINT)"
            ).alias("util_ppm"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Priority sampling (Duffield–Lund–Thorup) — weighted bottom-k sketch
# ---------------------------------------------------------------------------

_PRIO_K = 20
# key = (h48 * 2^15) div n_tok: h48 < 2^48, so h48 * 2^15 <= 2^63 - 2^15
# — the largest scale that cannot overflow BIGINT for any hash value.
_PRIO_SCALE = 32768


@register(
    "docs_priority_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tok
      FROM documents
    ),
    k AS (
      SELECT doc_id, source, n_tok,
        (('0x' || substr(md5('prio' || doc_id), 1, 12))::BIGINT
         * {_PRIO_SCALE}) // n_tok AS key
      FROM d WHERE n_tok >= 1
    ),
    r AS (
      SELECT doc_id, source, n_tok, key,
        row_number() OVER (ORDER BY key, doc_id) AS pos
      FROM k
    )
    SELECT CAST(pos AS INT) AS pos, doc_id, source, n_tok,
           CAST(key AS BIGINT) AS key,
           (SELECT CAST(key AS BIGINT) FROM r WHERE pos = {_PRIO_K + 1})
             AS tau_key
    FROM r WHERE pos <= {_PRIO_K}
    ORDER BY pos
    """,
    doc=f"PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM 2007): the "
    "weighted bottom-k sketch — each doc gets priority q = w/u "
    "(w = token count, u = its deterministic 48-bit md5 uniform), the "
    f"sample is the top-{_PRIO_K} by q, and the (k+1)-th priority is "
    "the threshold τ that makes max(w, τ-as-weight) an UNBIASED "
    "per-item estimator of any subset-sum over the whole corpus. "
    "Ranking by q descending ⇔ ranking by the EXACT INTEGER key "
    f"(h48 · 2^15) div w ascending (u = h48/2^48, so q ∝ 2^63/key — "
    "a monotone transform), which keeps the realized sample a pure "
    "integer function of the corpus: no float ever carries the "
    "selection (the engine-exactness discipline of docs_pps_sample "
    "and the quantile kernel), no ln()/pow() whose last-ulp "
    "divergence across engines could flip a boundary rank. "
    "Complements the sampling family: docs_hash_sample (uniform "
    "Bernoulli), docs_stratified_sample (per-stratum uniform), "
    "docs_pps_sample (systematic ∝-size ticks) — priority sampling "
    "is the MERGEABLE ∝-size variant: top-k by key is associative, "
    "so per-shard top-k then merge equals the whole-corpus sample "
    "(the shard-merge = whole-corpus proof pinned in "
    "tests/test_round11_ops.py alongside a Fraction-exact DLT "
    "estimator check). Scale shape: one scan computing w and the "
    "hash key, then TakeOrdered (per-partition heaps + one "
    f"{_PRIO_K + 1}-row merge — never a global sort); the pos window "
    "runs on the bounded k+1-row frame. NULL/empty text drops on "
    "both engines (n_tok >= 1 on NULL-propagating length).",
)
def docs_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            "source",
            F.size(T.tokens(F.coalesce(F.col("text"), F.lit(""))))
            .cast("long")
            .alias("n_tok"),
        )
        .filter(F.col("n_tok") >= 1)
    )
    keyed = d.withColumn(
        "h",
        T.portable_hash64(
            F.concat(F.lit("prio"), F.col("doc_id").cast("string"))
        ),
    ).withColumn("key", F.expr(f"(h * {_PRIO_SCALE}) div n_tok"))
    # TakeOrdered to k+1 rows, THEN number them — the bounded-window
    # top-k pattern (test_plans._GLOBAL_WINDOW_OK).
    top = (
        keyed.orderBy("key", "doc_id")
        .limit(_PRIO_K + 1)
        .withColumn(
            "pos",
            F.row_number().over(Window.orderBy("key", "doc_id")),
        )
    )
    # Aggregate to EXACTLY one row (NULL tau_key when the corpus has
    # <= k docs) so the crossJoin matches the oracle's scalar-subquery
    # semantics — a filter-built tau frame is EMPTY in that case and
    # the crossJoin would wrongly drop the whole sample.
    tau = top.agg(
        F.max(
            F.when(F.col("pos") == _PRIO_K + 1, F.col("key"))
        ).alias("tau_key")
    )
    return (
        top.filter(F.col("pos") <= _PRIO_K)
        .crossJoin(tau)  # 1-row threshold frame (test_plans._BNLJ_OK)
        .select(
            "pos",
            "doc_id",
            "source",
            "n_tok",
            F.col("key").cast("long"),
            F.col("tau_key").cast("long"),
        )
        .orderBy("pos")
    )
