"""Deduplication catalog queries over the ``documents``/``embeddings``
fixtures: exact hash dedup, MinHash signatures + banded LSH, SimHash,
exact n-gram Jaccard, the banding recall curve, SRP-LSH embedding
near-dup, SemDeDup semantic dedup, and the exact prefix-filtered
(AllPairs/PPJoin) Jaccard join.  Split out of llm_queries.py (round 9,
pure move).

Every entry pairs the Spark operator (functions/dedup.py,
functions/similarity.py) with a DuckDB SQL mirror built on the same
portable 48-bit md5-prefix hash, so signatures and buckets match
bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions import dedup as D
from graphdatabases_spark.functions import similarity as S
from graphdatabases_spark.functions import text as T
from graphdatabases_spark.functions.similarity import EMBEDDING_DIM
from graphdatabases_spark.relational.catalog import register, stage_derived, table
from graphdatabases_spark.relational.llm_queries import TOKS, H
from graphdatabases_spark.relational.similarity_queries import (
    _COS_SQL,
    _ivf_build_cte,
)

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_summary",
    oracle="""
    WITH g AS (SELECT sha256(text) AS h, count(*) AS n FROM documents GROUP BY 1)
    SELECT CAST(sum(n) AS BIGINT) AS n_docs,
           count(*) AS n_distinct,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
    FROM g
    """,
    doc="Exact dedup summary by content hash (single combinable agg).",
)
def dedup_exact_summary(spark: SparkSession, sf: str) -> DataFrame:
    return D.exact_dedup_summary(table(spark, sf, "documents"))


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({TOKS})) AS tok
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(i AS INT) AS i,
           min((CAST(2*i+1 AS BIGINT) * {H.format(v='tok')} + (12345*i + 7)) % 2147483647) AS mh
    FROM toks, generate_series(0, 15) s(i)
    GROUP BY doc_id, i
    ORDER BY doc_id, i
    """,
    doc="MinHash signatures (k=16) over the distinct token set — the "
    "portable-hash family checked value-for-value across engines.",
)
def dedup_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return D.minhash_signatures(docs).orderBy("doc_id", "i")


@register(
    "dedup_lsh_candidates",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({TOKS})) AS tok
      FROM documents WHERE doc_id < 200
    ),
    hashed AS (
      SELECT doc_id, CAST(i AS INT) AS i,
             min((CAST(2*i+1 AS BIGINT) * {H.format(v='tok')} + (12345*i + 7)) % 2147483647) AS mh
      FROM toks, generate_series(0, 15) s(i)
      GROUP BY doc_id, i
    ),
    sigs AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
      FROM hashed GROUP BY doc_id, i // 4
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
    doc="MinHash-LSH near-dup candidates: 4 bands × 4 rows; pairs share "
    "a full band signature (bucket-local join, no O(n²)).",
)
def dedup_lsh_candidates(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return D.lsh_candidate_pairs(docs).orderBy("doc_a", "doc_b")


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({TOKS})) AS tok
      FROM documents WHERE doc_id < 100
    ),
    bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN CAST(floor({H.format(v='tok')} / power(2, b)) AS BIGINT) % 2 = 1
                      THEN 1 ELSE -1 END) AS tot
      FROM toks, generate_series(0, 31) s(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN tot > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="SimHash (32-bit) sign-aggregated token fingerprint.",
)
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.simhash(docs).orderBy("doc_id")


@register(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, unnest(list_distinct({TOKS})) AS tok
      FROM documents WHERE doc_id < 150
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM base GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM base a JOIN base b
        ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(common / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(common / (sa.sz + sb.sz - common), 6) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    doc="n-gram (token-set) Jaccard near-dup pairs ≥ 0.5 via inverted-"
    "index join, blocked by lang.",
)
def dedup_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 150)
    return D.jaccard_pairs(docs, threshold=0.5, block_col="lang").orderBy(
        "doc_a", "doc_b"
    )


_MH_RECALL_CONFIGS = [(2, 8), (4, 4), (8, 2)]  # (bands, rows_per_band)


def _mh_recall_config_sql(bands: int, rows: int) -> str:
    """One banding config's (candidates vs truth) count row: band id is
    i // rows over the shared 16-hash signature table."""
    return f"""
    SELECT {bands} AS bands, {rows} AS rows_per_band,
      CAST(coalesce(sum(in_t), 0) AS BIGINT) AS n_truth,
      CAST(coalesce(sum(in_c), 0) AS BIGINT) AS n_candidates,
      CAST(coalesce(sum(in_c * in_t), 0) AS BIGINT) AS n_hit,
      round(coalesce(sum(in_c * in_t), 0)
            / greatest(coalesce(sum(in_t), 0), 1), 6) AS recall,
      round(coalesce(sum(in_c * in_t), 0)
            / greatest(coalesce(sum(in_c), 0), 1), 6) AS precision
    FROM (
      SELECT coalesce(c.in_c, 0) AS in_c, coalesce(t.in_t, 0) AS in_t
      FROM (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, 1 AS in_c
        FROM (
          SELECT doc_id, i // {rows} AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
          FROM hashed GROUP BY doc_id, i // {rows}
        ) a JOIN (
          SELECT doc_id, i // {rows} AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
          FROM hashed GROUP BY doc_id, i // {rows}
        ) b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      ) c FULL OUTER JOIN truth t
        ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )"""


@register(
    "dedup_minhash_recall",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({TOKS})) AS tok
      FROM documents WHERE doc_id < 150
    ),
    hashed AS (
      SELECT doc_id, CAST(i AS INT) AS i,
             min((CAST(2*i+1 AS BIGINT) * {H.format(v='tok')} + (12345*i + 7)) % 2147483647) AS mh
      FROM toks, generate_series(0, 15) s(i)
      GROUP BY doc_id, i
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1 AS in_t
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING round(count(*) / (
          (SELECT sz FROM sizes WHERE doc_id = a.doc_id)
          + (SELECT sz FROM sizes WHERE doc_id = b.doc_id) - count(*)), 6)
        >= 0.5
    )
    SELECT * FROM (
      {" UNION ALL ".join(_mh_recall_config_sql(b, r) for b, r in _MH_RECALL_CONFIGS)}
    ) ORDER BY bands
    """,
    doc="MinHash-LSH banding RECALL CURVE — the dedup counterpart of "
    "similarity_ivf_recall / similarity_lsh_recall: against exact "
    "token-set Jaccard >= 0.5 ground truth (inverted-index join on "
    "the bounded doc_id < 150 fixture, the calibration-sample shape a "
    "100-TB pipeline uses to pick its banding), each 16-hash banding "
    "arrangement (2x8, 4x4, 8x2) is scored for realized recall and "
    "precision via ONE keyed full-outer join of its candidate pairs "
    "with the truth pairs and a single count-sum aggregate — no "
    "scalar crossJoins at all. More bands of fewer rows = a more "
    "permissive S-curve: recall must be nondecreasing in the band "
    "count (pinned in pytest alongside n_hit <= min(n_candidates, "
    "n_truth)). Complements srp_band_plan, which SOLVES the S-curve "
    "operating point analytically; this entry MEASURES the realized "
    "operating points of the actual signature family. Scale shape: "
    "signatures are the map-side-combinable wide min-agg (16 longs "
    "per doc through the shuffle); candidates join only within "
    "(band, signature) buckets; truth is fixture-bounded by "
    "construction.",
)
def dedup_minhash_recall(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").filter(F.col("doc_id") < 150)
    truth = (
        D.jaccard_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b", F.lit(1).alias("in_t"))
    )
    rows = []
    for bands, rpb in _MH_RECALL_CONFIGS:
        cand = D.lsh_candidate_pairs(docs, band_size=rpb).select(
            "doc_a", "doc_b", F.lit(1).alias("in_c")
        )
        tagged = cand.join(
            truth.withColumnsRenamed({"doc_a": "ta", "doc_b": "tb"}),
            (F.col("doc_a") == F.col("ta")) & (F.col("doc_b") == F.col("tb")),
            "full_outer",
        ).select(
            F.coalesce(F.col("in_c"), F.lit(0)).alias("in_c"),
            F.coalesce(F.col("in_t"), F.lit(0)).alias("in_t"),
        )
        n_hit = F.coalesce(F.sum(F.col("in_c") * F.col("in_t")), F.lit(0))
        n_c = F.coalesce(F.sum("in_c"), F.lit(0))
        n_t = F.coalesce(F.sum("in_t"), F.lit(0))
        rows.append(
            tagged.agg(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(rpb).cast("int").alias("rows_per_band"),
                n_t.cast("long").alias("n_truth"),
                n_c.cast("long").alias("n_candidates"),
                n_hit.cast("long").alias("n_hit"),
                F.round(
                    n_hit.cast("double") / F.greatest(n_t, F.lit(1)), 6
                ).alias("recall"),
                F.round(
                    n_hit.cast("double") / F.greatest(n_c, F.lit(1)), 6
                ).alias("precision"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("bands")


def _srp_band_bucket_sql(band: int, planes_per_band: int, dim: int) -> str:
    """DuckDB mirror of one band's bucket in ``srp_band_pairs``: the
    band's ``planes_per_band`` sign bits (portable md5 hyperplane
    constants, same left-to-right element fold) packed little-endian."""
    from graphdatabases_spark.functions.similarity import _hyperplane_signs

    bits = []
    for j in range(planes_per_band):
        signs = _hyperplane_signs(dim, band * planes_per_band + j)
        terms = "".join(
            f"{'+' if s > 0 else '-'}e[{k + 1}]" for k, s in enumerate(signs)
        )
        bits.append(f"CAST(({terms}) >= 0 AS BIGINT) * {2 ** j}")
    return " + ".join(bits)


def _srp_bands_cte(num_bands: int = 4, planes_per_band: int = 12) -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, e, {b} AS band, "
        f"{_srp_band_bucket_sql(b, planes_per_band, EMBEDDING_DIM)} AS bucket "
        "FROM v"
        for b in range(num_bands)
    )


# Componentwise perturbation factors for the planted near-duplicates:
# ±1% keyed on the 0-based element index — cosine(original, planted)
# ≈ 0.99996, far above the 0.99 gate, while every byte differs.  Pure
# double arithmetic on the same inputs → bit-identical across engines.
_PERTURB_PY = "1.0 + 0.01 * ((%d %% 7) - 3) / 3.0"  # doc only
_PLANT_OFFSET = 1_000_000


@register(
    "dedup_embedding_neardup",
    oracle=f"""
    WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    v AS (
      SELECT vec_id, e FROM v0
      UNION ALL
      SELECT vec_id + {_PLANT_OFFSET},
             list_transform(range(1, len(e) + 1),
               i -> e[i] * (1.0 + 0.01 * (((i - 1) % 7) - 3) / 3.0))
      FROM v0
    ),
    bands AS ({_srp_bands_cte()})
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cos
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_COS_SQL}, 6) >= 0.99
    ORDER BY id_a, id_b
    """,
    doc="Embedding-cosine near-duplicate pairs at unbounded n: banded "
    "multi-table SRP-LSH (4 tables x 12 sign bits — the 1-(1-p^r)^b "
    "S-curve, same construction as the banded MinHash text path) "
    "gates an exact fold-order-stable cosine at the realistic 0.99 "
    "near-dup threshold. The fixture corpus has no natural near-dups "
    "(max pairwise cosine ~0.51), so the query derives a dup-injected "
    "corpus — every vector gets a deterministic ±1% componentwise-"
    "perturbed twin (cos ~ 0.99996, id + 1e6) — and must recover "
    "exactly the planted pairs, independently recomputed by the "
    "oracle. Candidates are bucket collisions (~1e-3 random-pair "
    "rate at 12-bit bands), never all-pairs; one (band,bucket) hash "
    "exchange + one pair-level distinct.",
)
def dedup_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings").select("vec_id", "embedding")
    planted = emb.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + F.lit(0.01) * ((i % 7) - 3) / F.lit(3.0)),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(planted)
    return S.srp_band_pairs(corpus, threshold=0.99).orderBy("id_a", "id_b")



# SemDeDup's corpus: every vector plus its deterministic ±1%-perturbed
# twin (same injection as dedup_embedding_neardup — the fixture corpus
# has no natural near-dups, max pairwise cos ~0.51).
_SEMDEDUP_V_SQL = f"""SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm
      FROM (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        UNION ALL
        SELECT vec_id + {_PLANT_OFFSET},
               list_transform(range(1, len(embedding::DOUBLE[]) + 1),
                 i -> (embedding::DOUBLE[])[i]
                      * (1.0 + 0.01 * (((i - 1) % 7) - 3) / 3.0))
        FROM embeddings
      )"""


@register(
    "dedup_semantic_semdedup",
    oracle=f"""
    WITH {_ivf_build_cte(_SEMDEDUP_V_SQL)},
    t AS (
      SELECT doc_id,
             len({TOKS}) AS n_tok,
             len(list_distinct({TOKS})) AS n_uniq,
             (length(lower(text)) - length(regexp_replace(lower(text),
                '[^a-z0-9 ]', '', 'g')))
               / greatest(length(lower(text)), 1) AS punct
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             round((CASE WHEN n_tok BETWEEN 10 AND 1000
                    THEN 1.0 ELSE 0.5 END) * 0.4
                   + (1.0 - punct) * 0.3
                   + (n_uniq / greatest(n_tok, 1)) * 0.3, 6) AS quality
      FROM t
    ),
    qq AS (
      SELECT c.neighbor_id AS vec_id, c.cid, c.e, c.nrm, q.quality
      FROM c_idx c JOIN q ON q.doc_id = c.neighbor_id % {_PLANT_OFFSET}
    ),
    pairs AS (
      SELECT a.vec_id AS dropped_id, b.vec_id AS kept_id,
             a.cid AS cid, b.quality AS qb,
             round(list_inner_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
      FROM qq a JOIN qq b
        ON b.cid = a.cid AND b.vec_id <> a.vec_id
      WHERE round(list_inner_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.99
        AND (b.quality > a.quality
             OR (b.quality = a.quality AND b.vec_id < a.vec_id))
    ),
    best AS (
      SELECT dropped_id, kept_id, cid, cos,
             row_number() OVER (
               PARTITION BY dropped_id ORDER BY qb DESC, kept_id
             ) AS rk
      FROM pairs
    )
    SELECT dropped_id, kept_id, CAST(cid AS INT) AS cid, cos
    FROM best WHERE rk = 1
    ORDER BY dropped_id
    """,
    doc="SEMANTIC dedup (SemDeDup, Abbas et al. 2023): embeddings are "
    "assigned to the deterministic IVF k-means cells (the exact "
    "similarity_ann_ivf build — shared _ivf_build_cte body), then "
    "near-dup pairs are generated ONLY within each cell (cos >= 0.99) "
    "and each cluster of semantic duplicates keeps its best-quality "
    "member — docs_dedup_canonical's selection rule (quality desc, "
    "then lowest id) applied to embedding-space rather than "
    "fingerprint clusters. A row per DROPPED vector names its keeper "
    "(the best-ranked better neighbor). The fixture corpus has no "
    "natural near-dups, so the query derives the dup-injected corpus "
    "(deterministic ±1% twins, id + 1e6, cos ~0.99996 — same "
    "injection as dedup_embedding_neardup) and must recover exactly "
    "the planted twins: twins inherit their document's quality, so "
    "the id tiebreak always keeps the ORIGINAL (recovery invariant "
    "pinned in tests/test_llm_ops.py). Scale: pair generation is "
    "cell-bounded (within-cell O(sum k_i^2), never corpus-wide "
    "all-pairs) — which makes the CLUSTER COUNT the scaling knob: it "
    "must grow with the corpus (cells ~ N / target_cell_size, the "
    "SemDeDup paper's regime) to keep per-cell quadratic work flat; "
    "the fixture pins 8 cells for oracle replay, and the sf1 audit "
    "(SCALE.md) shows exactly the predicted fixed-k behavior — "
    "shuffle linear (10.0x on 10x rows) while within-cell pair CPU "
    "grows ~k_i^2. Quality is a broadcastable per-doc fold; "
    "selection is one window over the bounded dropped set.",
)
def dedup_semantic_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = table(spark, sf, "embeddings").select("vec_id", "embedding")
    planted = emb.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + F.lit(0.01) * ((i % 7) - 3) / F.lit(3.0)),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(planted)
    _, cidx = S.ivf_build(corpus, num_clusters=8, lloyd_iters=1)
    quality = table(spark, sf, "documents").select(
        "doc_id", T.quality_score(F.col("text")).alias("quality")
    )
    qq = cidx.join(
        F.broadcast(quality),
        quality.doc_id == cidx.neighbor_id % _PLANT_OFFSET,
    ).select(
        F.col("neighbor_id").alias("vid"),
        "cid",
        F.col("c_vec2").alias("vec"),
        F.col("c_norm2").alias("nrm"),
        "quality",
    )
    a = qq.select(
        F.col("vid").alias("dropped_id"),
        F.col("cid"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
        F.col("quality").alias("qa"),
    )
    b = qq.select(
        F.col("vid").alias("kept_id"),
        F.col("cid").alias("cid_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
        F.col("quality").alias("qb"),
    )
    cos = F.round(S._dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    pairs = (
        a.join(
            b,
            (F.col("cid") == F.col("cid_b"))
            & (F.col("kept_id") != F.col("dropped_id")),
        )
        .withColumn("cos", cos)
        .filter(
            (F.col("cos") >= 0.99)
            & (
                (F.col("qb") > F.col("qa"))
                | (
                    (F.col("qb") == F.col("qa"))
                    & (F.col("kept_id") < F.col("dropped_id"))
                )
            )
        )
    )
    w = Window.partitionBy("dropped_id").orderBy(
        F.col("qb").desc(), F.col("kept_id")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("dropped_id", "kept_id", "cid", "cos")
        .orderBy("dropped_id")
    )




@register(
    "dedup_prefix_jaccard",
    oracle=f"""
    WITH td AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct({TOKS})) AS tok FROM documents
      WHERE doc_id < 500
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
           FROM td GROUP BY doc_id),
    dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc
            FROM td GROUP BY tok),
    pos AS MATERIALIZED (
      SELECT td.doc_id, td.tok, s.sz,
             row_number() OVER (
               PARTITION BY td.doc_id ORDER BY d.dfc, td.tok
             ) AS pos
      FROM td JOIN dfc d ON d.tok = td.tok JOIN sz s ON s.doc_id = td.doc_id
    ),
    pref AS MATERIALIZED (
      SELECT doc_id, tok, sz FROM pos
      WHERE pos <= sz - (4 * sz + 4) // 5 + 1
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sz AS sza, b.sz AS szb
      FROM pref a JOIN pref b
        ON b.tok = a.tok AND b.doc_id > a.doc_id
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, c.sza, c.szb,
             CAST(count(*) AS BIGINT) AS o
      FROM cand c
      JOIN td x ON x.doc_id = c.doc_a
      JOIN td y ON y.doc_id = c.doc_b AND y.tok = x.tok
      GROUP BY c.doc_a, c.doc_b, c.sza, c.szb
    ),
    hits AS (
      SELECT doc_a, doc_b,
             CAST((1000000 * o) // (sza + szb - o) AS BIGINT) AS jacc_ppm
      FROM common
      WHERE 9 * o >= 4 * (sza + szb)
    ),
    sym AS (
      SELECT doc_a AS doc_id, doc_b AS partner, jacc_ppm FROM hits
      UNION ALL
      SELECT doc_b, doc_a, jacc_ppm FROM hits
    ),
    ranked AS (
      SELECT doc_id, partner, jacc_ppm,
             count(*) OVER (PARTITION BY doc_id) AS n_partners,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY jacc_ppm DESC, partner
             ) AS rk
      FROM sym
    )
    SELECT doc_id, CAST(n_partners AS BIGINT) AS n_partners,
           partner AS best_partner, jacc_ppm AS best_jacc_ppm
    FROM ranked WHERE rk = 1
    ORDER BY doc_id
    """,
    doc="EXACT set-similarity self-join with the PREFIX FILTER "
    "(AllPairs/PPJoin, Bayardo et al. / Xiao et al.): distinct "
    "per-doc tokens order by GLOBAL document frequency (rarest "
    "first, token tie-break); for Jaccard >= 0.8 any qualifying "
    "pair must share a token in each side's first "
    "|x| - ceil(0.8·|x|) + 1 tokens (overlap o >= t·|x| on both "
    "sides, pigeonhole under the shared order), so candidates are "
    "generated ONLY by prefix-token collisions — the rare tokens — "
    "and verified with an exact overlap count; the threshold test "
    "is the integer identity 9·o >= 4·(|x|+|y|) (J >= 4/5), no "
    "floats until the reported jacc_ppm; output is the bounded "
    "per-doc summary (partner count + best partner) — the syndicated "
    "clusters in the fixture would otherwise emit O(cluster²) pair "
    "rows. This is the DETERMINISTIC, "
    "recall-1.0 complement to the MinHash-banding candidates "
    "(dedup_lsh_candidates trades recall for cost; the prefix "
    "filter is exact with cost bounded by rare-token collision "
    "counts — the published AllPairs result). Scale shape: one "
    "(doc, token) distinct, one token-df agg, one per-doc window "
    "for prefix ranks (doc-partitioned), a prefix-token equi-join "
    "(never all-pairs), and a candidate-restricted verification "
    "join. BOUNDED INPUT, documented: prefix filtering's cost "
    "guarantee assumes a heavy-tailed vocabulary where prefix "
    "tokens are genuinely rare; the fixture's word-salad corpus has "
    "a small uniform vocabulary, so the filter degenerates toward "
    "all-pairs there (measured: 604 s unbounded at sf0.1) — the "
    "entry therefore pins the algorithm on a fixed 500-doc "
    "calibration slice (the dedup_jaccard_pairs convention), and "
    "the unbounded-n production path remains the banded MinHash "
    "candidates (dedup_lsh_candidates) whose cost does not depend "
    "on vocabulary shape.",
)
def dedup_prefix_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    td = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", F.explode(T.distinct_tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    sz = td.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    dfc = td.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("dfc"))
    w = Window.partitionBy("doc_id").orderBy("dfc", "tok")
    pos = (
        td.join(dfc, "tok")
        .join(sz, "doc_id")
        .withColumn("pos", F.row_number().over(w))
    )
    pref = pos.filter(
        F.col("pos") <= F.col("sz") - F.expr("(4 * sz + 4) div 5") + 1
    ).select("doc_id", "tok", "sz")
    a = pref.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("sz").alias("sza")
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tok").alias("tok_b"),
        F.col("sz").alias("szb"),
    )
    cand = (
        a.join(b, (F.col("tok_b") == F.col("tok")) & (F.col("doc_b") > F.col("doc_a")))
        .select("doc_a", "doc_b", "sza", "szb")
        .distinct()
    )
    x = td.select(F.col("doc_id").alias("doc_a"), "tok")
    y = td.select(
        F.col("doc_id").alias("doc_y"), F.col("tok").alias("tok_y")
    )
    common = (
        cand.join(x, "doc_a")
        .join(
            y,
            (F.col("doc_y") == F.col("doc_b"))
            & (F.col("tok_y") == F.col("tok")),
        )
        .groupBy("doc_a", "doc_b", "sza", "szb")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    hits = common.filter(
        9 * F.col("o") >= 4 * (F.col("sza") + F.col("szb"))
    ).select(
        "doc_a",
        "doc_b",
        F.expr("CAST((1000000 * o) div (sza + szb - o) AS BIGINT)").alias(
            "jacc_ppm"
        ),
    )
    sym = hits.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("partner"),
        "jacc_ppm",
    ).unionByName(
        hits.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("partner"),
            "jacc_ppm",
        )
    )
    wn = Window.partitionBy("doc_id")
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("jacc_ppm").desc(), "partner"
    )
    return (
        sym.withColumn("n_partners", F.count(F.lit(1)).over(wn).cast("long"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "n_partners",
            F.col("partner").alias("best_partner"),
            F.col("jacc_ppm").alias("best_jacc_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Prefix-filter bound demonstration on a staged Zipfian-vocabulary corpus
# ---------------------------------------------------------------------------
# dedup_prefix_jaccard pins the AllPairs algorithm on a bounded slice
# because the fixture's uniform word-salad vocabulary defeats the
# rare-token premise (604 s unbounded at sf0.1, measured round 8).  The
# entry below stages a DERIVED corpus whose token distribution is
# exactly Zipf(1) — octave uniform in [0, _ZIPF_OCTAVES), rank uniform
# within the octave, so P(rank r) ∝ 1/r over a 2^20-token vocabulary —
# and runs the UNBOUNDED prefix join on it.  The oracle-checked output
# row carries the bound itself: candidate pairs as ppm of all-pairs.
# Generation is pure integer arithmetic on the portable 48-bit hash, so
# the DuckDB oracle regenerates the identical corpus from `documents`.

_ZIPF_SLOTS = 24  # token draws per document
_ZIPF_OCTAVES = 20  # vocabulary = ranks [1, 2^20)
_ZIPF_TWIN_SHARED = 22  # twin shares the first 22 of 24 draw seeds
_ZIPF_TWIN_EVERY = 50  # docs with doc_id % 50 == 0 get a planted twin
_ZIPF_OFFSET = 10_000_000  # twin doc_id = original + offset

# Zipf(1) inverse draw from a 48-bit uniform u: octave l = u % 20
# (uniform), rank = 2^l + (u div 20) % 2^l (uniform within the octave).
_ZIPF_TOK_DUCK = (
    "'w' || ((1::BIGINT << CAST(u % 20 AS INT))"
    " + (u // 20) % (1::BIGINT << CAST(u % 20 AS INT)))"
)
_ZIPF_TOK_SPARK = (
    "concat('w', CAST(shiftleft(CAST(1 AS BIGINT), CAST(u % 20 AS INT))"
    " + (u div 20) % shiftleft(CAST(1 AS BIGINT), CAST(u % 20 AS INT))"
    " AS STRING))"
)


def _stage_zipf_corpus(spark: SparkSession, sf: str) -> str:
    """Stage the derived Zipfian (doc_id, tok) corpus parquet — one doc
    per fixture document plus a planted near-dup twin for every 50th
    doc (22/24 shared draw seeds → Jaccard ≈ 0.85 ≥ the 0.8 gate) —
    re-materialized only when the source `documents` content changes
    (catalog.stage_derived)."""

    def _write(out: str) -> None:
        base = table(spark, sf, "documents").select("doc_id")
        j = F.explode(F.sequence(F.lit(1), F.lit(_ZIPF_SLOTS))).alias("j")

        def seed(tag: str) -> F.Column:
            return F.concat(
                F.lit(tag),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("j").cast("string"),
            )

        orig = base.select("doc_id", j).select(
            "doc_id", T.portable_hash64(seed("zpf:")).alias("u")
        )
        twin = (
            base.filter(F.col("doc_id") % _ZIPF_TWIN_EVERY == 0)
            .select("doc_id", j)
            .select(
                (F.col("doc_id") + _ZIPF_OFFSET).alias("doc_id"),
                T.portable_hash64(
                    F.when(
                        F.col("j") <= _ZIPF_TWIN_SHARED, seed("zpf:")
                    ).otherwise(seed("zpfT:"))
                ).alias("u"),
            )
        )
        (
            orig.unionByName(twin)
            .select("doc_id", F.expr(_ZIPF_TOK_SPARK).alias("tok"))
            .distinct()
            .repartition(8, "doc_id")
            .write.mode("overwrite")
            .parquet(out)
        )

    staged, _ = stage_derived(
        sf, "documents", f"zipf{_ZIPF_SLOTS}o{_ZIPF_OCTAVES}", _write
    )
    return staged


@register(
    "dedup_prefix_zipf",
    oracle=f"""
    WITH draws AS MATERIALIZED (
      SELECT doc_id,
             {H.format(v="'zpf:' || doc_id || ':' || j")} AS u
      FROM documents, range(1, {_ZIPF_SLOTS + 1}) t(j)
      UNION ALL
      SELECT doc_id + {_ZIPF_OFFSET},
             {H.format(v=f"CASE WHEN j <= {_ZIPF_TWIN_SHARED} "
                         "THEN 'zpf:' || doc_id || ':' || j "
                         "ELSE 'zpfT:' || doc_id || ':' || j END")}
      FROM documents, range(1, {_ZIPF_SLOTS + 1}) t(j)
      WHERE doc_id % {_ZIPF_TWIN_EVERY} = 0
    ),
    toks AS MATERIALIZED (
      SELECT DISTINCT doc_id, {_ZIPF_TOK_DUCK} AS tok FROM draws
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
           FROM toks GROUP BY doc_id),
    dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc
            FROM toks GROUP BY tok),
    pos AS MATERIALIZED (
      SELECT td.doc_id, td.tok, s.sz,
             row_number() OVER (
               PARTITION BY td.doc_id ORDER BY d.dfc, td.tok
             ) AS pos
      FROM toks td JOIN dfc d ON d.tok = td.tok
      JOIN sz s ON s.doc_id = td.doc_id
    ),
    pref AS MATERIALIZED (
      SELECT doc_id, tok, sz FROM pos
      WHERE pos <= sz - (4 * sz + 4) // 5 + 1
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sz AS sza, b.sz AS szb
      FROM pref a JOIN pref b
        ON b.tok = a.tok AND b.doc_id > a.doc_id
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, c.sza, c.szb,
             CAST(count(*) AS BIGINT) AS o
      FROM cand c
      JOIN toks x ON x.doc_id = c.doc_a
      JOIN toks y ON y.doc_id = c.doc_b AND y.tok = x.tok
      GROUP BY c.doc_a, c.doc_b, c.sza, c.szb
    ),
    hits AS (
      SELECT doc_a, doc_b FROM common
      WHERE 9 * o >= 4 * (sza + szb)
    ),
    m AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT CASE WHEN doc_id >= {_ZIPF_OFFSET}
                                      THEN doc_id END) AS BIGINT)
               AS n_planted
      FROM toks
    ),
    c AS (SELECT CAST(count(*) AS BIGINT) AS cand_pairs FROM cand),
    h AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hits,
             CAST(count(CASE WHEN doc_b = doc_a + {_ZIPF_OFFSET}
                             THEN 1 END) AS BIGINT) AS planted_recovered
      FROM hits
    )
    SELECT m.n_docs,
           CAST(m.n_docs * (m.n_docs - 1) // 2 AS BIGINT) AS allpairs,
           c.cand_pairs,
           CAST((1000000 * c.cand_pairs)
                // (m.n_docs * (m.n_docs - 1) // 2) AS BIGINT) AS cand_ppm,
           h.n_hits, m.n_planted, h.planted_recovered
    FROM m, c, h
    """,
    doc="The UNBOUNDED AllPairs/PPJoin prefix-filter join on a staged "
    "Zipfian-vocabulary corpus — the demonstration dedup_prefix_jaccard "
    "could not give (the fixture's uniform word salad degenerates the "
    "filter toward all-pairs; 604 s at sf0.1, measured round 8). Each "
    "fixture doc draws 24 tokens from an exact Zipf(1) over a 2^20 "
    "vocabulary (octave = u % 20 uniform, rank uniform within octave "
    "⇒ P(rank r) ∝ 1/r), pure integer arithmetic on the portable "
    "48-bit hash so both engines regenerate the identical corpus; "
    "every 50th doc gets a planted twin sharing 22/24 draw seeds "
    "(Jaccard ≈ 0.85 ≥ the 0.8 gate). The corpus is staged ONCE per "
    "source signature as parquet (catalog.stage_derived) and the "
    "prefix join runs WITHOUT any doc_id bound. The output row IS the "
    "measured bound: candidate pairs as ppm of n·(n−1)/2 all-pairs "
    "(plus planted-twin recovery) — on a heavy-tailed vocabulary the "
    "rarest-token prefixes collide orders of magnitude less often "
    "than all-pairs, the published AllPairs result (Bayardo et al. "
    "2007). Scale shape: identical to dedup_prefix_jaccard (df agg, "
    "doc-partitioned prefix window, prefix-token equi-join, candidate-"
    "restricted verification); the ppm column is what keeps it honest "
    "at 100 TB — cost tracks prefix-token collisions, not n².",
)
def dedup_prefix_zipf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    td = spark.read.parquet(_stage_zipf_corpus(spark, sf))
    sz = td.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    dfc = td.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("dfc"))
    w = Window.partitionBy("doc_id").orderBy("dfc", "tok")
    pref = (
        td.join(dfc, "tok")
        .join(sz, "doc_id")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= F.col("sz") - F.expr("(4 * sz + 4) div 5") + 1)
        .select("doc_id", "tok", "sz")
    )
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), "tok", F.col("sz").alias("sza"))
        .join(
            pref.select(
                F.col("doc_id").alias("doc_b"),
                F.col("tok").alias("tok_b"),
                F.col("sz").alias("szb"),
            ),
            (F.col("tok_b") == F.col("tok")) & (F.col("doc_b") > F.col("doc_a")),
        )
        .select("doc_a", "doc_b", "sza", "szb")
        .distinct()
    )
    common = (
        cand.join(td.select(F.col("doc_id").alias("doc_a"), "tok"), "doc_a")
        .join(
            td.select(F.col("doc_id").alias("doc_y"), F.col("tok").alias("tok_y")),
            (F.col("doc_y") == F.col("doc_b")) & (F.col("tok_y") == F.col("tok")),
        )
        .groupBy("doc_a", "doc_b", "sza", "szb")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    hits = common.filter(9 * F.col("o") >= 4 * (F.col("sza") + F.col("szb")))
    m = td.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct(
            F.when(F.col("doc_id") >= _ZIPF_OFFSET, F.col("doc_id"))
        ).alias("n_planted"),
    )
    c = cand.agg(F.count(F.lit(1)).cast("long").alias("cand_pairs"))
    h = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.count(
            F.when(F.col("doc_b") == F.col("doc_a") + _ZIPF_OFFSET, 1)
        ).alias("planted_recovered"),
    )
    return m.crossJoin(c).crossJoin(h).select(
        "n_docs",
        F.expr("CAST(n_docs * (n_docs - 1) div 2 AS BIGINT)").alias("allpairs"),
        "cand_pairs",
        F.expr(
            "CAST((1000000 * cand_pairs)"
            " div (n_docs * (n_docs - 1) div 2) AS BIGINT)"
        ).alias("cand_ppm"),
        "n_hits",
        "n_planted",
        "planted_recovered",
    )
