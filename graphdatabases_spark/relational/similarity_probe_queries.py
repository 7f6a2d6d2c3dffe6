"""Multi-probe LSH recall curve (SURVEY §2.2 similarity-search family).

Query-time bucket perturbation over the existing SRP index — the
recall/cost operating point BETWEEN one-bucket LSH (cheapest, lowest
recall) and brute force, without building a second index. Split into
its own module because similarity_queries.py sits at ~1.85k lines
(project 2k bar); shares that module's bucket-SQL mirror and recall
constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions import similarity as S
from graphdatabases_spark.functions.similarity import (
    EMBEDDING_DIM,
    _hyperplane_signs,
)
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.similarity_queries import (
    _RECALL_K,
    _RECALL_NQ,
    _lsh_bucket_sql,
)

_MP_PLANES = 8
_MP_PROBES = (1, 2, 4)


def _lsh_dots_sql(num_planes: int = _MP_PLANES, dim: int = EMBEDDING_DIM) -> str:
    """DuckDB mirror of the per-plane dot list: each entry is the same
    left-to-right signed element sum the bucket bits fold — identical
    IEEE result, so round(abs(dot), 6) margins agree across engines."""
    entries = []
    for p in range(num_planes):
        signs = _hyperplane_signs(dim, p)
        terms = "".join(
            f"{'+' if s > 0 else '-'}e[{j + 1}]" for j, s in enumerate(signs)
        )
        entries.append(f"({terms})")
    return "[" + ", ".join(entries) + "]"


def _mp_ann_sql(t: int) -> str:
    return f"""
      SELECT {t} AS probes, query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
          row_number() OVER (
            PARTITION BY p.vec_id
            ORDER BY round(list_inner_product(q.e, c.e)
                           / (sqrt(list_inner_product(q.e, q.e))
                              * sqrt(list_inner_product(c.e, c.e))), 6)
                     DESC, c.vec_id
          ) AS rank
        FROM pb p
        JOIN qd q ON q.vec_id = p.vec_id
        JOIN bidx c ON c.bucket = p.pbucket AND c.vec_id <> p.vec_id
        WHERE p.lvl <= {t}
      ) WHERE rank <= {_RECALL_K}"""


@register(
    "similarity_multiprobe_recall",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    bidx AS MATERIALIZED (
      SELECT vec_id, e, {_lsh_bucket_sql(_MP_PLANES)} AS bucket FROM v
    ),
    qd AS MATERIALIZED (
      SELECT vec_id, e, bucket, {_lsh_dots_sql()} AS dots
      FROM bidx WHERE vec_id < {_RECALL_NQ}
    ),
    flips AS (
      SELECT vec_id, i,
        row_number() OVER (
          PARTITION BY vec_id ORDER BY round(abs(dots[i]), 6), i
        ) AS fr
      FROM qd, generate_series(1, {_MP_PLANES}) t(i)
    ),
    pb AS (
      SELECT vec_id, bucket AS pbucket, CAST(1 AS BIGINT) AS lvl FROM qd
      UNION ALL
      SELECT f.vec_id, xor(q.bucket, CAST(1 << (f.i - 1) AS BIGINT)),
             f.fr + 1
      FROM flips f JOIN qd q USING (vec_id)
      WHERE f.fr <= {max(_MP_PROBES) - 1}
    ),
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
    ann AS ({" UNION ALL ".join(_mp_ann_sql(t) for t in _MP_PROBES)}
    )
    SELECT CAST(probes AS BIGINT) AS probes,
           CAST({_RECALL_NQ} AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_results,
           CAST(count(b.query_id) AS BIGINT) AS n_hits,
           round(CAST(count(b.query_id) AS DOUBLE)
                 / {_RECALL_NQ * _RECALL_K}, 6) AS recall_at_k
    FROM ann a LEFT JOIN brute b
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY probes ORDER BY probes
    """,
    doc=f"MULTI-PROBE LSH operating curve (Lv et al., VLDB'07) — "
    f"recall@{_RECALL_K} at probes ∈ "
    f"{{{', '.join(str(p) for p in _MP_PROBES)}}} over the "
    f"{_RECALL_NQ}-query batch vs the exact brute-force top-"
    f"{_RECALL_K}: the home SRP bucket plus probes-1 single-bit "
    "perturbations, flipping the planes with the SMALLEST query "
    "|dot| margin — the bits a true near neighbor just across a "
    "hyperplane is most likely to differ on. Completes the LSH "
    "tuning axes: similarity_lsh_recall varies the INDEX (plane "
    "count — re-bucketing the corpus), this varies the QUERY "
    "(probe count — the index builds once and every operating "
    "point reuses it, the production knob when re-indexing 100 TB "
    "of vectors is off the table). The probe sequence is a pure "
    "function of the query (margins rounded to 6 decimals before "
    "ranking, plane-index tiebreak), so both engines walk identical "
    "buckets and the whole curve value-hash-matches; probed buckets "
    "are distinct single-bit flips, so candidate sets nest as probes "
    "grows and recall is MONOTONE in probes (pinned in "
    "tests/test_round12_ops.py). Recall is an exact-integer hit "
    "count divided once. Scale: each probe level is one bucket "
    "equi-join against the prebuilt index (candidates grow linearly "
    "in probes, never all-pairs); brute force is the bounded-batch "
    "calibration anchor.",
)
def similarity_multiprobe_recall(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _RECALL_NQ)
    index = S.lsh_build(emb, num_planes=_MP_PLANES)
    brute = S.cosine_topk(q, emb, k=_RECALL_K).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    ann = None
    for t in _MP_PROBES:
        part = S.lsh_query_multiprobe(
            index, q, k=_RECALL_K, probes=t, num_planes=_MP_PLANES
        ).select(
            F.lit(t).cast("long").alias("probes"),
            "query_id",
            "neighbor_id",
        )
        ann = part if ann is None else ann.unionByName(part)
    return (
        ann.join(brute, ["query_id", "neighbor_id"], "left")
        .groupBy("probes")
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
        .orderBy("probes")
    )
