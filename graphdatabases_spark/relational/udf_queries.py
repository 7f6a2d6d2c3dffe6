"""Catalog entries exercising the Arrow UDF surface (functions/udfs.py).

Each flavor — scalar pandas_udf, grouped-agg UDAF, applyInPandas,
mapInPandas — runs against a DuckDB oracle. Floats are rounded at 4
decimals: the Python side reduces with numpy (pairwise summation) and
DuckDB sequentially, so last-ulp differences are expected and rounded
away (the catalog's determinism discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions.udfs import (
    BIGRAM_SCHEMA,
    ZSCORE_SCHEMA,
    expand_bigrams,
    geo_mean,
    l2_norm,
    zscore_per_group,
)
from graphdatabases_spark.relational.catalog import register, table


@register(
    "udf_embedding_l2norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
    FROM embeddings
    ORDER BY vec_id
    """,
    doc="Scalar pandas_udf: vectorized L2 norm per embedding — the Arrow "
    "batch path for numeric kernels built-ins can't express.",
)
def udf_embedding_l2norm(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    return (
        emb.select("vec_id", F.round(l2_norm()(F.col("embedding")), 4).alias("norm"))
        .orderBy("vec_id")
    )


@register(
    "udaf_priority_geomean",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 4) AS geomean_price
    FROM orders
    WHERE o_totalprice > 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="GROUPED_AGG pandas UDAF: per-priority geometric mean of order "
    "totals (exp-mean-log, no Catalyst builtin).",
)
def udaf_priority_geomean(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders").filter(F.col("o_totalprice") > 0)
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(geo_mean()(F.col("o_totalprice")), 4).alias("geomean_price"))
        .orderBy("o_orderpriority")
    )


@register(
    "grouped_map_zscore",
    oracle="""
    -- Mirrors the pandas kernel op-for-op: exact HUGEINT sums of cent
    -- values, then the identical double expression.  Output rounds to
    -- 6 dp: once the group's sum-of-squares exceeds 2^53 (sf >= 0.1),
    -- DuckDB's two-step hugeint->double cast can differ from Python's
    -- correctly-rounded int->float by one ulp (~1e-16 on the zscore) —
    -- far below the 6-dp boundary, so rounding absorbs it; raw floats
    -- would hash-mismatch on that last ulp.
    WITH g AS (
      SELECT o_orderpriority,
             count(*) AS n,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)) AS sx,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)
                 * CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)) AS sxx
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o.o_orderpriority,
           round(
             CASE WHEN CAST(sxx AS DOUBLE) / n
                       - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) > 0
                  THEN (floor(o_totalprice * 100 + 0.5) - CAST(sx AS DOUBLE) / n)
                       / sqrt(CAST(sxx AS DOUBLE) / n
                              - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                  ELSE 0.0 END, 6) AS zscore
    FROM orders o JOIN g ON g.o_orderpriority = o.o_orderpriority
    ORDER BY o_orderkey
    """,
    doc="applyInPandas grouped map: per-priority z-score of order totals "
    "— whole group as one pandas frame, arbitrary per-group math "
    "(exact-cent-sum discipline; see functions/udfs.py).",
)
def grouped_map_zscore(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(zscore_per_group, schema=ZSCORE_SCHEMA)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("zscore", 6).alias("zscore"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "udtf_bigram_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\W+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest([t[i] || ' ' || t[i + 1]
                     for i in generate_series(1, len(t) - 1)]) AS bigram
      FROM toks
    )
    SELECT bigram, count(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
    doc="mapInPandas UDTF: 1→N bigram expansion streamed per Arrow batch, "
    "then a JVM-side count — the decode/expand pipeline pattern.",
)
def udtf_bigram_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("doc_id", "text")
    grams = docs.mapInPandas(expand_bigrams, schema=BIGRAM_SCHEMA)
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )
