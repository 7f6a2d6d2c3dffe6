"""Embedding-similarity / ANN catalog queries over the ``embeddings``
fixture: brute-force cosine anchors, SRP-LSH and IVF approximate
retrieval, scalar/truncation/product quantization, and the recall
operating curves that score each approximate path against the exact
anchor.  Split out of llm_queries.py (round 9, pure move).

Every entry pairs the Spark operator (functions/similarity.py) with a
DuckDB SQL mirror built on the same portable md5-derived hyperplanes /
deterministic lowest-id k-means seeds, so buckets, centroids, and
scores match bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions import similarity as S
from graphdatabases_spark.functions.similarity import EMBEDDING_DIM
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.llm_queries import TOKS

# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_inner_product(a.e, b.e) / "
    "(sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e)))"
)


@register(
    "similarity_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({_COS_SQL.replace('a.e', 'q2.e').replace('b.e', 'c.e')}, 6) AS cos
      FROM q q2 JOIN v c ON c.vec_id <> q2.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM (SELECT q2.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_inner_product(q2.e, c.e) /
                         (sqrt(list_inner_product(q2.e, q2.e)) * sqrt(list_inner_product(c.e, c.e))), 6) AS cos
            FROM q q2 JOIN v c ON c.vec_id <> q2.vec_id)
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="Brute-force cosine top-3 neighbors for 5 query vectors — the "
    "exact ANN baseline (zip_with/aggregate fold, no UDFs).",
)
def similarity_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.cosine_topk(q, emb, k=3).orderBy("query_id", "rank")


@register(
    "similarity_threshold_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 200)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round({_COS_SQL}, 6) >= 0.3
    ORDER BY id_a, id_b
    """,
    doc="All-pairs cosine ≥ 0.3 (bounded-n exact variant; the SRP-LSH "
    "bucketed operator is the unbounded-n path, pytest-checked recall).",
)
def similarity_threshold_pairs(spark: SparkSession, sf: str) -> DataFrame:
    v = table(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    return S.threshold_pairs(v, threshold=0.3).orderBy("id_a", "id_b")


def _lsh_bucket_sql(num_planes: int = 8, dim: int = EMBEDDING_DIM) -> str:
    """DuckDB mirror of ``lsh_bucket_signature``: the ±1 hyperplane
    signs are module-level constants (driver-side md5, similarity.py
    ``_hyperplane_signs``), inlined here as signed element sums in the
    SAME left-to-right fold order — so bucket longs are bit-identical
    across engines and the ANN result is value-hash-checkable."""
    from graphdatabases_spark.functions.similarity import _hyperplane_signs

    bits = []
    for p in range(num_planes):
        signs = _hyperplane_signs(dim, p)
        terms = "".join(
            f"{'+' if s > 0 else '-'}e[{j + 1}]" for j, s in enumerate(signs)
        )
        bits.append(f"CAST(({terms}) >= 0 AS BIGINT) * {2 ** p}")
    return " + ".join(bits)


@register(
    "similarity_ann_lsh",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    b AS (
      SELECT vec_id, e, {_lsh_bucket_sql()} AS bucket FROM v
    ),
    q AS (SELECT * FROM b WHERE vec_id < 5),
    ranked AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_inner_product(q.e, c.e)
                   / (sqrt(list_inner_product(q.e, q.e))
                      * sqrt(list_inner_product(c.e, c.e))), 6) AS cos,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_inner_product(q.e, c.e)
                              / (sqrt(list_inner_product(q.e, q.e))
                                 * sqrt(list_inner_product(c.e, c.e))), 6)
                        DESC, c.vec_id
             ) AS rank
      FROM q JOIN b c
        ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="Approximate top-k via random-hyperplane LSH buckets — the "
    "100 TB path (bucket join replaces the crossJoin). The hyperplane "
    "signs are portable md5-derived constants, so the oracle rebuilds "
    "the same buckets in SQL and the whole ANN result (bucket "
    "restriction + within-bucket exact cosine ranking) is value-hash-"
    "checked, not just recall-gated.",
)
def similarity_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ann_cosine_topk(q, emb, k=3).orderBy("query_id", "rank")


# Cosine between a vector row (alias x: e, nrm) and a centroid row
# (alias s: ce, cnrm), rounded like _nearest_centroids.
_IVF_CC = (
    "round(list_inner_product({x}.e, {s}.ce) / ({x}.nrm * {s}.cnrm), 6)"
)


# Shared IVF-build oracle prefix (train + assign), used verbatim by
# similarity_ann_ivf AND similarity_ivf_recall so the two entries pin
# the SAME index build; dedup_semantic_semdedup reuses the identical
# build body over a dup-injected corpus via the generator.
def _ivf_build_cte(v_sql: str) -> str:
    return f"""v AS MATERIALIZED (
      {v_sql}
    ),
    seeds AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             e AS ce, nrm AS cnrm
      FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)
    ),
    a0 AS MATERIALIZED (
      SELECT vec_id, cid, e FROM (
        SELECT x.vec_id, s.cid, x.e,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {_IVF_CC.format(x='x', s='s')} DESC, s.cid
               ) AS rr
        FROM v x CROSS JOIN seeds s
      ) WHERE rr = 1
    ),
    m AS MATERIALIZED (
      SELECT cid, i,
             CAST(sum(CAST(e[CAST(i AS INT)] AS DECIMAL(28,15))) AS DOUBLE)
               / count(*) AS mval
      FROM a0 CROSS JOIN range(1, {EMBEDDING_DIM + 1}) t(i)
      GROUP BY cid, i
    ),
    cents AS MATERIALIZED (
      SELECT cid, ce, sqrt(list_inner_product(ce, ce)) AS cnrm FROM (
        SELECT cid, list(mval ORDER BY i) AS ce FROM m GROUP BY cid
      )
    ),
    c_idx AS (
      SELECT vec_id AS neighbor_id, cid, e, nrm FROM (
        SELECT x.vec_id, s.cid, x.e, x.nrm,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {_IVF_CC.format(x='x', s='s')} DESC, s.cid
               ) AS rr
        FROM v x CROSS JOIN cents s
      ) WHERE rr = 1
    )"""


_IVF_BUILD_SQL = _ivf_build_cte(
    """SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_inner_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS nrm
      FROM embeddings"""
)


@register(
    "similarity_ann_ivf",
    oracle=f"""
    WITH {_IVF_BUILD_SQL},
    q_probe AS (
      SELECT vec_id AS query_id, cid, e, nrm FROM (
        SELECT x.vec_id, s.cid, x.e, x.nrm,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {_IVF_CC.format(x='x', s='s')} DESC, s.cid
               ) AS rr
        FROM v x CROSS JOIN cents s
        WHERE x.vec_id < 5
      ) WHERE rr <= 2
    ),
    ranked AS (
      SELECT q.query_id, c.neighbor_id,
             round(list_inner_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cos,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round(list_inner_product(q.e, c.e)
                              / (q.nrm * c.nrm), 6) DESC, c.neighbor_id
             ) AS rank
      FROM q_probe q JOIN c_idx c
        ON c.cid = q.cid AND c.neighbor_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
    doc="Approximate top-k via an inverted file (deterministic k-means "
    "coarse quantizer, nprobe cluster probing) — the alternative 100 TB "
    "path: the corpus shuffles once by cluster id at index build, each "
    "query touches only nprobe clusters. The quantizer is fully "
    "deterministic (lowest-id seeds, one Lloyd round with DECIMAL-"
    "exact centroid means, 6-dp-rounded cosine ranking with cid "
    "tie-break), so the oracle replays the entire build+probe in SQL "
    "and the ANN result is value-hash-checked, not just recall-gated.",
)
def similarity_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return S.ivf_ann_topk(q, emb, k=3, num_clusters=8, nprobe=2).orderBy(
        "query_id", "rank"
    )


@register(
    "embedding_label_centroids",
    oracle="""
    WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT label,
           count(*) AS n,
           round(avg(e[1]), 6) AS avg_dim0,
           round(avg(sqrt(list_inner_product(e, e))), 6) AS avg_norm
    FROM v GROUP BY label
    ORDER BY label
    """,
    doc="Per-label embedding stats (centroid component + mean norm).",
)
def embedding_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        emb.select("label", F.element_at(v, 1).alias("d0"), F.sqrt(dot).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("d0"), 6).alias("avg_dim0"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
        .orderBy("label")
    )



_RECALL_NQ = 20
_RECALL_K = 5
_RECALL_PROBES = (1, 2, 4)


@register(
    "similarity_ivf_recall",
    oracle=f"""
    WITH {{build}},
    q_probe AS (
      SELECT vec_id AS query_id, cid, rr, e, nrm FROM (
        SELECT x.vec_id, s.cid, x.e, x.nrm,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {{cc}} DESC, s.cid
               ) AS rr
        FROM v x CROSS JOIN cents s
        WHERE x.vec_id < {_RECALL_NQ}
      ) WHERE rr <= {max(_RECALL_PROBES)}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_inner_product(q.e, c.e)
                                / (q.nrm * c.nrm), 6) DESC, c.vec_id
               ) AS rank
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_RECALL_NQ}
      ) WHERE rank <= {_RECALL_K}
    ),
    ann AS (
      SELECT np, query_id, neighbor_id FROM (
        SELECT p.np, q.query_id, c.neighbor_id,
               row_number() OVER (
                 PARTITION BY p.np, q.query_id
                 ORDER BY round(list_inner_product(q.e, c.e)
                                / (q.nrm * c.nrm), 6) DESC, c.neighbor_id
               ) AS rank
        FROM (VALUES {", ".join(f"({p})" for p in _RECALL_PROBES)}) p(np)
        JOIN q_probe q ON q.rr <= p.np
        JOIN c_idx c ON c.cid = q.cid AND c.neighbor_id <> q.query_id
      ) WHERE rank <= {_RECALL_K}
    )
    SELECT CAST(np AS BIGINT) AS nprobe,
           CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_results,
           CAST(count(b.query_id) AS BIGINT) AS n_hits,
           round(CAST(count(b.query_id) AS DOUBLE)
                 / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k
    FROM ann a LEFT JOIN brute b
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY np ORDER BY np
    """.format(build=_IVF_BUILD_SQL, cc=_IVF_CC.format(x="x", s="s")),
    doc=f"IVF-ANN operating curve — recall@{_RECALL_K} at nprobe ∈ "
    f"{{{', '.join(str(p) for p in _RECALL_PROBES)}}} over a "
    f"{_RECALL_NQ}-query batch against the exact brute-force top-"
    f"{_RECALL_K} (the published table every ANN deployment tunes "
    "against: probe more cells → touch more of the corpus → higher "
    "recall). The index builds ONCE (ivf_build; same deterministic "
    "quantizer the similarity_ann_ivf oracle replays — the shared "
    "_IVF_BUILD_SQL prefix pins build parity between the two entries) "
    "and the three probe levels reuse it, exactly how a deployment "
    "sweeps its operating point. Recall is an exact-integer hit count "
    "over (query, neighbor) pairs divided once at the end, so the "
    "whole curve value-hash-matches — not just a recall>=threshold "
    "gate. Scale: brute force is the O(nq·N) calibration anchor on a "
    "bounded query batch; each probed level joins only the probed "
    "cells' posting lists.",
)
def similarity_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _RECALL_NQ)
    index = S.ivf_build(emb, num_clusters=8, lloyd_iters=1)
    brute = S.cosine_topk(q, emb, k=_RECALL_K).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    ann = None
    for p in _RECALL_PROBES:
        part = S.ivf_query(index, q, k=_RECALL_K, nprobe=p).select(
            F.lit(p).cast("long").alias("nprobe"), "query_id", "neighbor_id"
        )
        ann = part if ann is None else ann.unionByName(part)
    return (
        ann.join(brute, ["query_id", "neighbor_id"], "left")
        .groupBy("nprobe")
        .agg(
            F.lit(_RECALL_NQ).cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / F.lit(_RECALL_NQ * _RECALL_K),
                6,
            ).alias("recall_at_k"),
        )
        .orderBy("nprobe")
    )


_LSH_RECALL_PLANES = (4, 6, 8)


def _lsh_recall_ann_sql(np: int) -> str:
    return f"""
      SELECT {np} AS nplanes, query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_inner_product(q.e, c.e)
                                / (sqrt(list_inner_product(q.e, q.e))
                                   * sqrt(list_inner_product(c.e, c.e))), 6)
                          DESC, c.vec_id
               ) AS rank
        FROM b{np} q JOIN b{np} c
          ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {_RECALL_NQ}
      ) WHERE rank <= {_RECALL_K}"""


@register(
    "similarity_lsh_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    {",".join(
      f"b{np} AS (SELECT vec_id, e, {_lsh_bucket_sql(np)} AS bucket FROM v)"
      for np in _LSH_RECALL_PLANES
    )},
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_inner_product(q.e, c.e)
                                / (sqrt(list_inner_product(q.e, q.e))
                                   * sqrt(list_inner_product(c.e, c.e))), 6)
                          DESC, c.vec_id
               ) AS rank
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_RECALL_NQ}
      ) WHERE rank <= {_RECALL_K}
    ),
    ann AS ({" UNION ALL ".join(_lsh_recall_ann_sql(np) for np in _LSH_RECALL_PLANES)}
    )
    SELECT CAST(nplanes AS BIGINT) AS nplanes,
           CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_results,
           CAST(count(b.query_id) AS BIGINT) AS n_hits,
           round(CAST(count(b.query_id) AS DOUBLE)
                 / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k
    FROM ann a LEFT JOIN brute b
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY nplanes ORDER BY nplanes
    """,
    doc=f"SRP-LSH operating curve — similarity_ivf_recall's sibling for "
    "the hyperplane path: recall@5 at num_planes ∈ "
    f"{{{', '.join(str(p) for p in _LSH_RECALL_PLANES)}}} over the "
    f"same {_RECALL_NQ}-query batch vs the exact brute-force top-"
    f"{_RECALL_K}. Fewer planes → coarser buckets → more candidates → "
    "higher recall at higher cost; the curve is what an LSH deployment "
    "tunes instead of nprobe. The md5-derived plane signs are shared "
    "module constants, so the oracle rebuilds identical buckets in "
    "SQL and the whole curve value-hash-matches. Recall is an "
    "exact-integer hit count divided once. Scale: each plane count is "
    "one bucket equi-join (never all-pairs); brute force is the "
    "bounded-batch calibration anchor.",
)
def similarity_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _RECALL_NQ)
    brute = S.cosine_topk(q, emb, k=_RECALL_K).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    ann = None
    for np_ in _LSH_RECALL_PLANES:
        part = S.ann_cosine_topk(
            q, emb, k=_RECALL_K, num_planes=np_
        ).select(
            F.lit(np_).cast("long").alias("nplanes"),
            "query_id",
            "neighbor_id",
        )
        ann = part if ann is None else ann.unionByName(part)
    return (
        ann.join(brute, ["query_id", "neighbor_id"], "left")
        .groupBy("nplanes")
        .agg(
            F.lit(_RECALL_NQ).cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / F.lit(_RECALL_NQ * _RECALL_K),
                6,
            ).alias("recall_at_k"),
        )
        .orderBy("nplanes")
    )


_QUANT_BITS = (4, 6, 8)


def _quant_sql(bits: int) -> str:
    lv = float((1 << (bits - 1)) - 1)
    return f"list_transform(e, x -> floor(x * {lv} / vmax))"


def _qnorm_sql(bits: int) -> str:
    return (
        f"sqrt(list_inner_product({_quant_sql(bits)}, {_quant_sql(bits)}))"
        f" AS n{bits}"
    )


def _qcos_sql(b: int) -> str:
    # Per-vector norms are precomputed in qz (one fold per vector, not
    # one per pair); sqrt(x)*sqrt(y) is the same IEEE expression in
    # both engines, so relocating it preserves the value hash.
    return (
        f"round(list_inner_product(q.e{b}, c.e{b}) / "
        f"greatest(q.n{b} * c.n{b}, 1e-30), 6)"
    )


@register(
    "similarity_quantized_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
        greatest(list_max(list_transform(embedding::DOUBLE[],
                                         x -> abs(x))), 1e-30) AS vmax
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id, e,
        {", ".join(f"{_quant_sql(b)} AS e{b}" for b in _QUANT_BITS)},
        {", ".join(_qnorm_sql(b) for b in _QUANT_BITS)}
      FROM v
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(list_inner_product(q.e, c.e)
              / (sqrt(list_inner_product(q.e, q.e))
                 * sqrt(list_inner_product(c.e, c.e))), 6) AS fp_cos,
        {", ".join(f"{_qcos_sql(b)} AS qc{b}" for b in _QUANT_BITS)}
      FROM qz q JOIN qz c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_RECALL_NQ}
    ),
    br AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY fp_cos DESC, neighbor_id
      ) AS brank
      FROM scored
    ),
    stacked AS (
      {" UNION ALL ".join(
        f"SELECT query_id, neighbor_id, brank, {b} AS bits, "
        f"qc{b} AS qcos, fp_cos FROM br"
        for b in _QUANT_BITS
      )}
    ),
    rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY bits, query_id ORDER BY qcos DESC, neighbor_id
      ) AS qrank
      FROM stacked
    )
    SELECT CAST(bits AS BIGINT) AS bits,
      CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
      CAST(sum(CASE WHEN qrank <= {_RECALL_K} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_results,
      CAST(sum(CASE WHEN qrank <= {_RECALL_K} AND brank <= {_RECALL_K}
               THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      round(CAST(sum(CASE WHEN qrank <= {_RECALL_K}
                     AND brank <= {_RECALL_K} THEN 1 ELSE 0 END)
                 AS DOUBLE) / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k,
      round(CAST(sum(CAST(round(abs(fp_cos - qcos), 6)
                          AS DECIMAL(18,6))) AS DOUBLE)
            / count(*), 6) AS mean_abs_err,
      round(bits / 32.0, 6) AS bytes_ratio
    FROM rk GROUP BY bits ORDER BY bits
    """,
    doc=f"Scalar-quantization operating curve — the third sibling of "
    "the IVF-nprobe and SRP-plane recall curves, for the memory- "
    f"bandwidth axis: recall@{_RECALL_K} and mean |cos error| of "
    f"signed {{{', '.join(str(b) for b in _QUANT_BITS)}}}-bit "
    "per-vector symmetric quantization (floor, not round — floor is "
    "bit-identical across engines) against the exact fp top-"
    f"{_RECALL_K} over the same {_RECALL_NQ}-query batch. Quantized "
    "dot products are integers exactly representable in double, so "
    "the whole curve value-hash-matches; the mean error sums "
    "DECIMAL(18,6) terms (order-invariant) and divides once. ONE "
    "scan scores fp + all bit-widths per pair (the per-bits relation "
    "is an explode, not a re-join), one partitioned window ranks "
    "each. Scale: quantization itself is a pure per-row fold — at "
    "100 TB the int8 corpus is bits/32 of the fp32 bytes, which is "
    "what makes brute re-ranking after a coarse ANN stage affordable; "
    "the brute pass here is the bounded-batch calibration anchor.",
)
def similarity_quantized_recall(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    v = S.with_norm(table(spark, sf, "embeddings"))
    qz = v.select(
        "vec_id",
        "_vec",
        "_norm",
        *[
            S.quantize_symmetric(F.col("_vec"), b).alias(f"e{b}")
            for b in _QUANT_BITS
        ],
    )
    qz = qz.select(
        "*",
        *[
            F.sqrt(S._dot(F.col(f"e{b}"), F.col(f"e{b}"))).alias(f"n{b}")
            for b in _QUANT_BITS
        ],
    )

    def side(prefix):
        return qz.select(
            F.col("vec_id").alias(f"{prefix}_id"),
            F.col("_vec").alias(f"{prefix}v"),
            F.col("_norm").alias(f"{prefix}n"),
            *[F.col(f"e{b}").alias(f"{prefix}e{b}") for b in _QUANT_BITS],
            *[F.col(f"n{b}").alias(f"{prefix}n{b}") for b in _QUANT_BITS],
        )

    q = side("q").filter(F.col("q_id") < _RECALL_NQ)
    c = side("c")

    def qcos(b):
        dot = S._dot(F.col(f"qe{b}"), F.col(f"ce{b}"))
        return F.round(
            dot / F.greatest(F.col(f"qn{b}") * F.col(f"cn{b}"), F.lit(1e-30)),
            6,
        )

    scored = (
        F.broadcast(q)
        .join(c, F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(
                S._dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("fp_cos"),
            *[qcos(b).alias(f"qc{b}") for b in _QUANT_BITS],
        )
    )
    br = scored.withColumn(
        "brank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("fp_cos").desc(), "neighbor_id"
            )
        ),
    )
    stacked = br.select(
        "query_id",
        "neighbor_id",
        "brank",
        "fp_cos",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("bits"),
                        F.col(f"qc{b}").alias("qcos"),
                    )
                    for b in _QUANT_BITS
                ]
            )
        ).alias("s"),
    ).select(
        "query_id",
        "neighbor_id",
        "brank",
        "fp_cos",
        F.col("s.bits").alias("bits"),
        F.col("s.qcos").alias("qcos"),
    )
    rk = stacked.withColumn(
        "qrank",
        F.row_number().over(
            Window.partitionBy("bits", "query_id").orderBy(
                F.col("qcos").desc(), "neighbor_id"
            )
        ),
    )
    in_k = F.col("qrank") <= _RECALL_K
    hit = in_k & (F.col("brank") <= _RECALL_K)
    return (
        rk.groupBy("bits")
        .agg(
            F.lit(_RECALL_NQ).cast("long").alias("n_queries"),
            F.sum(F.when(in_k, 1).otherwise(0)).cast("long").alias("n_results"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0)).cast("double")
                / F.lit(_RECALL_NQ * _RECALL_K),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.sum(
                    F.round(F.abs(F.col("fp_cos") - F.col("qcos")), 6).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_abs_err"),
        )
        .select(
            "bits",
            "n_queries",
            "n_results",
            "n_hits",
            "recall_at_k",
            "mean_abs_err",
            F.round(F.col("bits") / 32.0, 6).alias("bytes_ratio"),
        )
        .orderBy("bits")
    )


_TRUNC_DIMS = (16, 32, 64)


def _tcos_sql(d: int) -> str:
    # Truncated-dimension cosine: per-vector truncated norms are
    # precomputed once per vector (tz CTE), not per pair.
    return (
        f"round(list_inner_product(q.t{d}, c.t{d}) / "
        f"greatest(q.tn{d} * c.tn{d}, 1e-30), 6)"
    )


@register(
    "similarity_truncation_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    tz AS (
      SELECT vec_id, e,
        {", ".join(f"e[1:{d}] AS t{d}" for d in _TRUNC_DIMS)},
        {", ".join(
          f"sqrt(list_inner_product(e[1:{d}], e[1:{d}])) AS tn{d}"
          for d in _TRUNC_DIMS
        )}
      FROM v
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(list_inner_product(q.e, c.e)
              / (sqrt(list_inner_product(q.e, q.e))
                 * sqrt(list_inner_product(c.e, c.e))), 6) AS fp_cos,
        {", ".join(f"{_tcos_sql(d)} AS tc{d}" for d in _TRUNC_DIMS)}
      FROM tz q JOIN tz c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_RECALL_NQ}
    ),
    br AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY fp_cos DESC, neighbor_id
      ) AS brank
      FROM scored
    ),
    stacked AS (
      {" UNION ALL ".join(
        f"SELECT query_id, neighbor_id, brank, {d} AS dims, "
        f"tc{d} AS tcos FROM br"
        for d in _TRUNC_DIMS
      )}
    ),
    rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY dims, query_id ORDER BY tcos DESC, neighbor_id
      ) AS trank
      FROM stacked
    )
    SELECT CAST(dims AS BIGINT) AS dims,
      CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
      CAST(sum(CASE WHEN trank <= {_RECALL_K} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_results,
      CAST(sum(CASE WHEN trank <= {_RECALL_K} AND brank <= {_RECALL_K}
               THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      round(CAST(sum(CASE WHEN trank <= {_RECALL_K}
                     AND brank <= {_RECALL_K} THEN 1 ELSE 0 END)
                 AS DOUBLE) / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k,
      round(dims / {EMBEDDING_DIM}.0, 6) AS bytes_ratio
    FROM rk GROUP BY dims ORDER BY dims
    """,
    doc=f"DIMENSION-TRUNCATION recall curve (the Matryoshka/MRL "
    "serving pattern): recall@"
    f"{_RECALL_K} of cosine retrieval over only the FIRST "
    f"{{', '.join(str(d) for d in _TRUNC_DIMS)}} of "
    f"{EMBEDDING_DIM} embedding dimensions vs the exact full-width "
    f"top-{_RECALL_K}, over the same {_RECALL_NQ}-query batch as the "
    "IVF/SRP/quantization curves — the fourth axis of the ANN "
    "operating surface (prefix truncation trades recall for "
    "bytes/vector linearly, and MRL-style indexes retrieve on a "
    "prefix then re-rank full-width; the full-width row is the "
    "identity anchor, recall exactly 1 — pinned). Truncated "
    "per-vector norms are precomputed once per vector; ONE scan "
    "scores the full-width and every truncated cosine per pair; "
    "per-(dims, query) ranking is a partitioned window. The brute "
    "pass is the bounded-batch calibration anchor, exactly like its "
    "three siblings.",
)
def similarity_truncation_recall(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    v = S.with_norm(table(spark, sf, "embeddings"))
    tz = v.select(
        "vec_id",
        "_vec",
        "_norm",
        *[F.slice(F.col("_vec"), 1, d).alias(f"t{d}") for d in _TRUNC_DIMS],
    )
    tz = tz.select(
        "*",
        *[
            F.sqrt(S._dot(F.col(f"t{d}"), F.col(f"t{d}"))).alias(f"tn{d}")
            for d in _TRUNC_DIMS
        ],
    )

    def side(prefix):
        return tz.select(
            F.col("vec_id").alias(f"{prefix}_id"),
            F.col("_vec").alias(f"{prefix}v"),
            F.col("_norm").alias(f"{prefix}n"),
            *[F.col(f"t{d}").alias(f"{prefix}t{d}") for d in _TRUNC_DIMS],
            *[F.col(f"tn{d}").alias(f"{prefix}tn{d}") for d in _TRUNC_DIMS],
        )

    q = side("q").filter(F.col("q_id") < _RECALL_NQ)
    c = side("c")

    def tcos(d):
        dot = S._dot(F.col(f"qt{d}"), F.col(f"ct{d}"))
        return F.round(
            dot
            / F.greatest(F.col(f"qtn{d}") * F.col(f"ctn{d}"), F.lit(1e-30)),
            6,
        )

    scored = (
        F.broadcast(q)
        .join(c, F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round(
                S._dot(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("fp_cos"),
            *[tcos(d).alias(f"tc{d}") for d in _TRUNC_DIMS],
        )
    )
    br = scored.withColumn(
        "brank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("fp_cos").desc(), "neighbor_id"
            )
        ),
    )
    stacked = br.select(
        "query_id",
        "neighbor_id",
        "brank",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("dims"),
                        F.col(f"tc{d}").alias("tcos"),
                    )
                    for d in _TRUNC_DIMS
                ]
            )
        ).alias("s"),
    ).select(
        "query_id",
        "neighbor_id",
        "brank",
        F.col("s.dims").alias("dims"),
        F.col("s.tcos").alias("tcos"),
    )
    rk = stacked.withColumn(
        "trank",
        F.row_number().over(
            Window.partitionBy("dims", "query_id").orderBy(
                F.col("tcos").desc(), "neighbor_id"
            )
        ),
    )
    in_k = F.col("trank") <= _RECALL_K
    hit = in_k & (F.col("brank") <= _RECALL_K)
    return (
        rk.groupBy("dims")
        .agg(
            F.lit(_RECALL_NQ).cast("long").alias("n_queries"),
            F.sum(F.when(in_k, 1).otherwise(0)).cast("long").alias("n_results"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0)).cast("double")
                / F.lit(_RECALL_NQ * _RECALL_K),
                6,
            ).alias("recall_at_k"),
            F.round(F.col("dims") / F.lit(float(EMBEDDING_DIM)), 6).alias(
                "bytes_ratio"
            ),
        )
        .orderBy("dims")
    )


_PQ_MS = (2, 4, 8)
_PQ_CODES = 8


def _pq_cte(m: int) -> str:
    """Per-m PQ oracle CTEs: codebook build + encode
    (``_pq_build_cte``) followed by the all-pairs ADC top-k."""
    return f"{_pq_build_cte(m)},\n    {_pq_adc_cte(m)}"


def _pq_build_cte(m: int) -> str:
    """Subspace fan-out, deterministic per-subspace k-means (seeds =
    lowest-8 ids, one Lloyd round with DECIMAL(28,15) means —
    byte-for-byte the ivf_train recipe), and corpus encoding.
    Mirrors similarity.pq_train_encode expression-for-expression;
    shared by similarity_pq_recall and similarity_ivfpq_recall."""
    d = EMBEDDING_DIM // m
    sub_union = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS j, list_slice(e, {j * d + 1}, {(j + 1) * d})"
        f" AS sv FROM v"
        for j in range(m)
    )
    score = (
        "round(2 * list_inner_product(x.sv, s.ce) "
        "- list_inner_product(s.ce, s.ce), 6)"
    )
    return f"""
    sub{m} AS MATERIALIZED ({sub_union}),
    seeds{m} AS MATERIALIZED (
      SELECT x.j,
             CAST(row_number() OVER (PARTITION BY x.j ORDER BY x.vec_id) - 1
                  AS INT) AS cid,
             x.sv AS ce
      FROM sub{m} x JOIN s8 ON s8.vec_id = x.vec_id
    ),
    a0{m} AS MATERIALIZED (
      SELECT vec_id, j, cid, sv FROM (
        SELECT x.vec_id, x.j, s.cid, x.sv,
               row_number() OVER (
                 PARTITION BY x.j, x.vec_id
                 ORDER BY {score} DESC, s.cid
               ) AS rr
        FROM sub{m} x JOIN seeds{m} s ON s.j = x.j
      ) WHERE rr = 1
    ),
    mm{m} AS MATERIALIZED (
      SELECT j, cid, i,
             CAST(sum(CAST(sv[CAST(i AS INT)] AS DECIMAL(28,15))) AS DOUBLE)
               / count(*) AS mval
      FROM a0{m} CROSS JOIN range(1, {d + 1}) t(i)
      GROUP BY j, cid, i
    ),
    cents{m} AS MATERIALIZED (
      SELECT j, cid, ce, round(list_inner_product(ce, ce), 6) AS cn2 FROM (
        SELECT j, cid, list(mval ORDER BY i) AS ce FROM mm{m} GROUP BY j, cid
      )
    ),
    codes{m} AS MATERIALIZED (
      SELECT vec_id, j, cid FROM (
        SELECT x.vec_id, x.j, s.cid,
               row_number() OVER (
                 PARTITION BY x.j, x.vec_id
                 ORDER BY {score} DESC, s.cid
               ) AS rr
        FROM sub{m} x JOIN cents{m} s ON s.j = x.j
      ) WHERE rr = 1
    )"""


def _pq_adc_cte(m: int) -> str:
    """All-pairs ADC top-k over the ``_pq_build_cte`` codebooks —
    mirrors similarity.pq_adc_topk (no candidate restriction)."""
    return f"""adc{m} AS (
      SELECT {m} AS m, query_id, neighbor_id FROM (
        SELECT p.query_id, p.neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id ORDER BY p.adc DESC, p.neighbor_id
               ) AS rank
        FROM (
          SELECT qs.vec_id AS query_id, co.vec_id AS neighbor_id,
                 round(CAST(sum(CAST(round(list_inner_product(qs.sv, ct.ce),
                                           6) AS DECIMAL(18,6))) AS DOUBLE)
                       / (max(qn.nrm)
                          * sqrt(greatest(
                              CAST(sum(CAST(ct.cn2 AS DECIMAL(18,6)))
                                   AS DOUBLE), 1e-30))), 6) AS adc
          FROM sub{m} qs
          JOIN v qn ON qn.vec_id = qs.vec_id
          JOIN codes{m} co ON co.j = qs.j AND co.vec_id <> qs.vec_id
          JOIN cents{m} ct ON ct.j = co.j AND ct.cid = co.cid
          WHERE qs.vec_id < {_RECALL_NQ}
          GROUP BY qs.vec_id, co.vec_id
        ) p
      ) WHERE rank <= {_RECALL_K}
    )"""


@register(
    "similarity_pq_recall",
    oracle=f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_inner_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    s8 AS MATERIALIZED (
      SELECT vec_id FROM v ORDER BY vec_id LIMIT {_PQ_CODES}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_inner_product(q.e, c.e)
                                / (q.nrm * c.nrm), 6) DESC, c.vec_id
               ) AS rank
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_RECALL_NQ}
      ) WHERE rank <= {_RECALL_K}
    ),
    {",".join(_pq_cte(m) for m in _PQ_MS)},
    ann AS ({" UNION ALL ".join(f"SELECT * FROM adc{m}" for m in _PQ_MS)}
    )
    SELECT CAST(m AS BIGINT) AS m,
           CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_results,
           CAST(count(b.query_id) AS BIGINT) AS n_hits,
           round(CAST(count(b.query_id) AS DOUBLE)
                 / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k,
           round(m * {(_PQ_CODES - 1).bit_length()}.0
                 / {EMBEDDING_DIM * 32}, 6) AS bytes_ratio
    FROM ann a LEFT JOIN brute b
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY m ORDER BY m
    """,
    doc=f"PRODUCT-QUANTIZATION ADC operating curve — the fifth ANN "
    "axis after nprobe (IVF), planes (SRP), int-bits (scalar "
    f"quantization) and prefix dims (truncation): recall@{_RECALL_K} "
    f"of asymmetric-distance retrieval with m ∈ "
    f"{{{', '.join(str(mm) for mm in _PQ_MS)}}} per-subspace codebooks "
    f"({_PQ_CODES} codewords each, trained by the repo's deterministic "
    "k-means recipe — lowest-8-id seeds, one Lloyd round, exact "
    "DECIMAL(28,15) means, identical to ivf_train) over the same "
    f"{_RECALL_NQ}-query batch vs the exact brute-force top-"
    f"{_RECALL_K}. ADC keeps the query full-precision and scores each "
    "candidate from its codes through a per-query lookup table: "
    "approx cos = Σⱼ⟨qⱼ,ce⟩ / (‖q‖·√Σⱼ‖ce‖²), per-subspace terms "
    "rounded at 6 and summed as DECIMAL(18,6) so the score is order- "
    "invariant and the whole curve value-hash-matches the SQL replay. "
    "More subspaces → finer reconstruction → higher recall at "
    "m·log₂(k) bits/vector (bytes_ratio); with 8 codewords the m=8 "
    "corpus is 24 bits/vector vs 2048 fp32 bits. Scale: training is "
    "two broadcast codebook joins + one (j,cid,pos) agg; serving "
    "touches only the m-rows-per-vector code table through a "
    "broadcast LUT join — the reason PQ serves 100-TB corpora. The "
    "brute pass is the bounded-batch calibration anchor, like its "
    "four siblings.",
)
def similarity_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _RECALL_NQ)
    brute = S.cosine_topk(q, emb, k=_RECALL_K).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    ann = None
    for m in _PQ_MS:
        cents, codes = S.pq_train_encode(emb, m=m, num_codes=_PQ_CODES)
        part = S.pq_adc_topk(q, cents, codes, m=m, k=_RECALL_K).select(
            F.lit(m).cast("long").alias("m"), "query_id", "neighbor_id"
        )
        ann = part if ann is None else ann.unionByName(part)
    bits = (_PQ_CODES - 1).bit_length()
    return (
        ann.join(brute, ["query_id", "neighbor_id"], "left")
        .groupBy("m")
        .agg(
            F.lit(_RECALL_NQ).cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / F.lit(_RECALL_NQ * _RECALL_K),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.col("m") * F.lit(float(bits)) / F.lit(EMBEDDING_DIM * 32),
                6,
            ).alias("bytes_ratio"),
        )
        .orderBy("m")
    )


_IVFPQ_M = 4


def _ivfpq_cand_sql(np: int) -> str:
    return f"""cand{np} AS (
      SELECT q.query_id, c.neighbor_id
      FROM q_probe q JOIN c_idx c
        ON c.cid = q.cid AND c.neighbor_id <> q.query_id
      WHERE q.rr <= {np}
    )"""


def _ivfpq_rank_sql(np: int) -> str:
    m = _IVFPQ_M
    return f"""ivfpq{np} AS (
      SELECT {np} AS nprobe, query_id, neighbor_id FROM (
        SELECT p.query_id, p.neighbor_id,
               row_number() OVER (
                 PARTITION BY p.query_id ORDER BY p.adc DESC, p.neighbor_id
               ) AS rank
        FROM (
          SELECT qs.vec_id AS query_id, co.vec_id AS neighbor_id,
                 round(CAST(sum(CAST(round(list_inner_product(qs.sv, ct.ce),
                                           6) AS DECIMAL(18,6))) AS DOUBLE)
                       / (max(qn.nrm)
                          * sqrt(greatest(
                              CAST(sum(CAST(ct.cn2 AS DECIMAL(18,6)))
                                   AS DOUBLE), 1e-30))), 6) AS adc
          FROM sub{m} qs
          JOIN v qn ON qn.vec_id = qs.vec_id
          JOIN codes{m} co ON co.j = qs.j AND co.vec_id <> qs.vec_id
          JOIN cents{m} ct ON ct.j = co.j AND ct.cid = co.cid
          JOIN cand{np} cd ON cd.query_id = qs.vec_id
                          AND cd.neighbor_id = co.vec_id
          WHERE qs.vec_id < {_RECALL_NQ}
          GROUP BY qs.vec_id, co.vec_id
        ) p
      ) WHERE rank <= {_RECALL_K}
    )"""


@register(
    "similarity_ivfpq_recall",
    oracle=f"""
    WITH {_IVF_BUILD_SQL},
    s8 AS MATERIALIZED (
      SELECT vec_id FROM v ORDER BY vec_id LIMIT {_PQ_CODES}
    ),
    {_pq_build_cte(_IVFPQ_M)},
    q_probe AS (
      SELECT vec_id AS query_id, cid, rr FROM (
        SELECT x.vec_id, s.cid,
               row_number() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {_IVF_CC.format(x="x", s="s")} DESC, s.cid
               ) AS rr
        FROM v x CROSS JOIN cents s
        WHERE x.vec_id < {_RECALL_NQ}
      ) WHERE rr <= {max(_RECALL_PROBES)}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_inner_product(q.e, c.e)
                                / (q.nrm * c.nrm), 6) DESC, c.vec_id
               ) AS rank
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_RECALL_NQ}
      ) WHERE rank <= {_RECALL_K}
    ),
    {",".join(_ivfpq_cand_sql(np) for np in _RECALL_PROBES)},
    {",".join(_ivfpq_rank_sql(np) for np in _RECALL_PROBES)},
    ann AS ({" UNION ALL ".join(f"SELECT * FROM ivfpq{np}" for np in _RECALL_PROBES)}
    )
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_results,
           CAST(count(b.query_id) AS BIGINT) AS n_hits,
           round(CAST(count(b.query_id) AS DOUBLE)
                 / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k
    FROM ann a LEFT JOIN brute b
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY nprobe ORDER BY nprobe
    """,
    doc=f"IVF-PQ COMPOSED retrieval (the FAISS IndexIVFPQ "
    "architecture, the two prior pieces chained): the coarse IVF "
    "quantizer (shared _IVF_BUILD_SQL build — byte-identical to "
    "similarity_ann_ivf's) picks each query's nprobe ∈ "
    f"{{{', '.join(str(p) for p in _RECALL_PROBES)}}} cells, and ONLY "
    f"those cells' candidates are scored — by m={_IVFPQ_M} "
    "product-quantization ADC (shared _pq_build_cte codebooks — "
    "byte-identical to similarity_pq_recall's), never the exact "
    "vectors. Reading this curve against similarity_ivf_recall "
    "(same cells, exact scoring) isolates the ADC recall cost at "
    "each operating point; against similarity_pq_recall (ADC over "
    "the whole corpus) it isolates the probe-miss cost. Candidate "
    "restriction happens BEFORE the per-pair aggregation (semi-join "
    "on the probed pairs), so compute ∝ probed candidates — the "
    "100-TB serving shape: coarse cells cut the corpus, m-byte codes "
    "cut the bytes, and the exact vectors are never touched at "
    "query time. Recall is the exact-integer hit count divided "
    "once, like its five sibling curves.",
)
def similarity_ivfpq_recall(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _RECALL_NQ)
    brute = S.cosine_topk(q, emb, k=_RECALL_K).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    cents_ivf, c_idx = S.ivf_build(emb, num_clusters=8, lloyd_iters=1)
    pq_cents, pq_codes = S.pq_train_encode(emb, m=_IVFPQ_M, num_codes=_PQ_CODES)
    qn = S.with_norm(q).select(
        F.col("vec_id").alias("query_id"), "_vec", "_norm"
    )
    ann = None
    for np_ in _RECALL_PROBES:
        probe = S._nearest_centroids(
            qn, cents_ivf, nprobe=np_, id_name="query_id"
        ).select("cid", "query_id")
        cand = (
            c_idx.join(F.broadcast(probe), "cid")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
        )
        part = S.pq_adc_topk(
            q, pq_cents, pq_codes, m=_IVFPQ_M, k=_RECALL_K, candidates=cand
        ).select(
            F.lit(np_).cast("long").alias("nprobe"),
            "query_id",
            "neighbor_id",
        )
        ann = part if ann is None else ann.unionByName(part)
    return (
        ann.join(brute, ["query_id", "neighbor_id"], "left")
        .groupBy("nprobe")
        .agg(
            F.lit(_RECALL_NQ).cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / F.lit(_RECALL_NQ * _RECALL_K),
                6,
            ).alias("recall_at_k"),
        )
        .orderBy("nprobe")
    )


@register(
    "embedding_source_drift",
    oracle="""
    WITH j AS (
      SELECT d.source, e.embedding::DOUBLE[] AS v
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ),
    dims AS (
      SELECT source, s.i - 1 AS dim, v[s.i] AS x
      FROM j, generate_series(1, 64) s(i)
    ),
    per_src AS (
      SELECT source, dim,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(x AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS s
      FROM dims GROUP BY source, dim
    ),
    gl AS (
      SELECT dim,
        CAST(sum(n) AS BIGINT) AS gn,
        CAST(sum(s) AS DECIMAL(28,12)) AS gs
      FROM per_src GROUP BY dim
    ),
    cent AS (
      SELECT p.source, p.dim, p.n,
        CAST(p.s AS DOUBLE) / p.n AS c,
        CAST(g.gs AS DOUBLE) / g.gn AS gc
      FROM per_src p JOIN gl g USING (dim)
    ),
    terms AS (
      SELECT source, n,
        CAST((c - gc) * (c - gc) AS DECIMAL(28,12)) AS d2,
        CAST(c * gc AS DECIMAL(28,12)) AS cg,
        CAST(c * c AS DECIMAL(28,12)) AS cc,
        CAST(gc * gc AS DECIMAL(28,12)) AS gg
      FROM cent
    )
    SELECT source,
      CAST(max(n) AS BIGINT) AS n_vecs,
      sqrt(CAST(sum(d2) AS DOUBLE)) AS l2_drift,
      CAST(sum(cg) AS DOUBLE)
        / greatest(sqrt(CAST(sum(cc) AS DOUBLE))
                   * sqrt(CAST(sum(gg) AS DOUBLE)), 1e-30) AS cos_global
    FROM terms GROUP BY source ORDER BY source
    """,
    doc="Per-source EMBEDDING CENTROID DRIFT — the distribution-shift "
    "audit a 100-TB multi-source corpus runs before mixing: each "
    "source's centroid (per-dimension mean) is compared to the global "
    "centroid by L2 distance and cosine, exposing sources whose "
    "embedding mass sits away from the corpus (encoder drift, "
    "domain skew, ingestion bugs). ARITHMETIC DISCIPLINE: "
    "per-dimension sums accumulate as DECIMAL(28,12) (exact, "
    "order-invariant — the only data-sized aggregation); centroids "
    "are one division each; the 64 per-dimension comparison terms "
    "cast to DECIMAL(28,12) before the final sum so the dim-order "
    "of accumulation cannot move a digit; outputs are raw doubles "
    "via identical scalar algebra — no round(). Scale shape: one "
    "equi-join (vec id), one explode to (source, dim), two keyed "
    "aggs bounded by |sources| x dims; the global centroid derives "
    "from the per-source sums (no second corpus pass).",
)
def embedding_source_drift(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    d = table(spark, sf, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    dims = (
        e.join(d, "vec_id")
        .select("source", F.posexplode(F.col("v")).alias("dim", "x"))
    )
    per_src = dims.groupBy("source", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)"))
        .cast("decimal(28,12)")
        .alias("s"),
    )
    glob = per_src.groupBy("dim").agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("s").cast("decimal(28,12)").alias("gs"),
    )
    cent = per_src.join(glob, "dim").select(
        "source",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("c"),
        (F.col("gs").cast("double") / F.col("gn")).alias("gc"),
    )
    diff = F.col("c") - F.col("gc")
    terms = cent.select(
        "source",
        "n",
        (diff * diff).cast("decimal(28,12)").alias("d2"),
        (F.col("c") * F.col("gc")).cast("decimal(28,12)").alias("cg"),
        (F.col("c") * F.col("c")).cast("decimal(28,12)").alias("cc"),
        (F.col("gc") * F.col("gc")).cast("decimal(28,12)").alias("gg"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_vecs"),
            F.sqrt(F.sum("d2").cast("double")).alias("l2_drift"),
            (
                F.sum("cg").cast("double")
                / F.greatest(
                    F.sqrt(F.sum("cc").cast("double"))
                    * F.sqrt(F.sum("gg").cast("double")),
                    F.lit(1e-30),
                )
            ).alias("cos_global"),
        )
        .orderBy("source")
    )
