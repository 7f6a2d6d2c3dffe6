"""LLM-data-pipeline catalog queries: dedup, similarity, text analysis,
multimodal metadata — over the ``documents``/``embeddings`` fixtures.

Every entry pairs the Spark operator (functions/{text,dedup,similarity,
multimodal}.py) with a DuckDB SQL mirror built on the same portable
48-bit md5-prefix hash, so signatures/fingerprints match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions import dedup as D
from graphdatabases_spark.functions import similarity as S
from graphdatabases_spark.functions.similarity import EMBEDDING_DIM
from graphdatabases_spark.functions import text as T
from graphdatabases_spark.functions.multimodal import attach_binary_payload
from graphdatabases_spark.relational.catalog import register, table

# Shared SQL fragments (DuckDB side).
TOKS = "list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'), x -> x <> '')"
H = "(('0x' || substr(md5({v}), 1, 12))::BIGINT)"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({TOKS}) AS INT) AS n_tokens,
           CAST(len(list_distinct({TOKS})) AS INT) AS n_unique,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')) AS INT) AS n_ws_tokens
    FROM documents
    WHERE doc_id <= 100
    ORDER BY doc_id
    """,
    doc="Token counting: BPE-ish regex split (n_tokens/n_unique) plus the "
    "cheap whitespace heuristic (n_ws_tokens) — both JVM-side.",
)
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") <= 100)
        .select(
            "doc_id",
            T.token_count(F.col("text")).alias("n_tokens"),
            F.size(T.distinct_tokens(F.col("text"))).alias("n_unique"),
            T.whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len({TOKS}) AS n_tok,
             len(list_distinct({TOKS})) AS n_uniq,
             (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
               / greatest(length(lower(text)), 1) AS punct
      FROM documents WHERE doc_id <= 100
    )
    SELECT doc_id,
           round((CASE WHEN n_tok BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END) * 0.4
                 + (1.0 - punct) * 0.3
                 + (n_uniq / greatest(n_tok, 1)) * 0.3, 6) AS quality
    FROM t
    ORDER BY doc_id
    """,
    doc="Quality scoring: length band + punctuation + vocabulary diversity.",
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") <= 100)
        .select("doc_id", T.quality_score(F.col("text")).alias("quality"))
        .orderBy("doc_id")
    )


def _lang_hits_sql() -> str:
    rows = []
    for lang, words in T.LANG_STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        rows.append(
            f"SELECT doc_id, '{lang}' AS cand, "
            f"len(list_filter(list_distinct({TOKS}), x -> list_contains({arr}, x))) AS hits "
            f"FROM documents WHERE doc_id <= 150"
        )
    return " UNION ALL ".join(rows)


@register(
    "text_language_guess",
    oracle=f"""
    WITH scores AS ({_lang_hits_sql()}),
    ranked AS (
      SELECT doc_id, cand, hits,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand DESC) AS rn
      FROM scores
    )
    SELECT r.doc_id,
           CASE WHEN r.hits > 0 THEN r.cand ELSE 'und' END AS guess,
           d.lang AS actual
    FROM ranked r JOIN documents d USING (doc_id)
    WHERE r.rn = 1 AND d.doc_id <= 150
    ORDER BY r.doc_id
    """,
    doc="Language ID by stopword vote (ties → lexicographically largest "
    "language; no hits → 'und'), shown against the labeled lang.",
)
def text_language_guess(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") <= 150)
        .select(
            "doc_id",
            T.language_guess(F.col("text")).alias("guess"),
            F.col("lang").alias("actual"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({TOKS})), ' ')) AS fp
    FROM documents
    WHERE doc_id <= 100
    ORDER BY doc_id
    """,
    doc="Canonical document fingerprint: md5 over the sorted distinct "
    "token set (order/repetition-insensitive near-dup key).",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") <= 100)
        .select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM (SELECT doc_id, unnest({TOKS}) AS tok FROM corpus)
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(20.0 / df.df), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln(20.0 / df.df) DESC, tf.tok) AS rn
      FROM tf JOIN df USING (tok)
    )
    SELECT doc_id, tok, tfidf FROM scored WHERE rn <= 3
    ORDER BY doc_id, tok
    """,
    doc="TF-IDF top-3 terms per document (explode → two hash aggs → "
    "broadcast df join → windowed top-k).",
)
def text_tfidf_topterms(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    corpus = table(spark, sf, "documents").filter(F.col("doc_id") < 20)
    toks = corpus.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    raw = F.col("tf") * F.log(F.lit(20.0) / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(raw.desc(), F.col("tok"))
    return (
        tf.join(F.broadcast(df), "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", F.round(raw, 6).alias("tfidf"))
        .orderBy("doc_id", "tok")
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


# ---------------------------------------------------------------------------
# Multimodal metadata
# ---------------------------------------------------------------------------

@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(sha256(text)) AS content_sha256
    FROM documents
    WHERE doc_id <= 100
    ORDER BY doc_id
    """,
    doc="Multimodal column convention: opaque binary payload + typed "
    "metadata struct (modality/byte_len/content hash), JVM-side.",
)
def multimodal_metadata(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").filter(F.col("doc_id") <= 100)
    with_meta = attach_binary_payload(docs, "text", "text-blob")
    return (
        with_meta.select(
            "doc_id",
            F.col("meta.byte_len").alias("byte_len"),
            F.col("meta.content_sha256").alias("content_sha256"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_resize_thumbs",
    oracle="""
    -- Mirrors the deterministic fake resizer (functions/multimodal.py
    -- resize_stub): thumb = sha256(payload) tiled to w*h bytes. The
    -- 8x8 thumb is exactly the 32-byte digest twice -> hex is the
    -- digest hex repeated, truncated to 128 chars.
    SELECT doc_id,
           8 AS thumb_w, 8 AS thumb_h,
           CAST(64 AS BIGINT) AS thumb_len,
           substr(repeat(lower(sha256(text)), 3), 1, 128) AS thumb_hex
    FROM documents
    WHERE doc_id <= 100
    ORDER BY doc_id
    """,
    doc="mapInPandas image-resize plumbing (Arrow-batched thumbnailer, "
    "functions/multimodal.py resize_images) hash-checked end to end: "
    "the deterministic fake's byte contract is reproduced in SQL, so "
    "the gate verifies batching, schema, and payload bytes — swap "
    "resize_stub for PIL and the plan shape is production-ready.",
)
def multimodal_resize_thumbs(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions.multimodal import resize_images

    docs = table(spark, sf, "documents").filter(F.col("doc_id") <= 100)
    payloads = attach_binary_payload(docs, "text", "image").select(
        "doc_id", "payload"
    )
    thumbs = resize_images(payloads, width=8, height=8)
    return (
        thumbs.select(
            "doc_id",
            "thumb_w",
            "thumb_h",
            F.octet_length("thumb").cast("bigint").alias("thumb_len"),
            F.lower(F.hex("thumb")).alias("thumb_hex"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    -- Mirrors frame_sample_stub: frame i = sha256(payload || ascii(i))
    -- truncated to 16 bytes (32 hex chars).
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           substr(lower(sha256(text || CAST(i AS VARCHAR))), 1, 32) AS frame_hex
    FROM documents, unnest(range(0, 4)) AS t(i)
    WHERE doc_id <= 50
    ORDER BY doc_id, frame_idx
    """,
    doc="mapInPandas video frame-sampling plumbing (1→N fan-out inside "
    "one Arrow batch, functions/multimodal.py sample_frames) hash-"
    "checked end to end via the deterministic fake's byte contract — "
    "the decode-once-emit-many shape an ffmpeg sampler drops into.",
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions.multimodal import sample_frames

    docs = table(spark, sf, "documents").filter(F.col("doc_id") <= 50)
    payloads = attach_binary_payload(docs, "text", "video").select(
        "doc_id", "payload"
    )
    frames = sample_frames(payloads, num_frames=4, id_cols=("doc_id",))
    return (
        frames.select(
            "doc_id",
            "frame_idx",
            F.lower(F.hex("frame")).alias("frame_hex"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@register(
    "docs_bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total
      FROM dl
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    q AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
        FROM vocab
      ) WHERE rn BETWEEN 21 AND 25
    ),
    tf AS (
      SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS tf
      FROM tok t JOIN q USING (tok) GROUP BY t.doc_id, t.tok
    ),
    dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    idf AS (
      SELECT tok,
        round(ln(((CAST(n_docs - df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5)) + 1.0), 9) AS idf
      FROM dfreq, stats
    ),
    sc AS (
      SELECT tf.doc_id,
        CAST(idf * ((CAST(tf.tf AS DOUBLE) * 2.2)
          / (CAST(tf.tf AS DOUBLE)
             + (1.2 * (0.25 + (0.75 * (CAST(dl.dl AS DOUBLE)
                 / (CAST(total AS DOUBLE) / n_docs)))))))
          AS DECIMAL(28,12)) AS term
      FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
             sum(term) AS s
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_matched, round(CAST(s AS DOUBLE), 6) AS bm25
    FROM per ORDER BY s DESC, doc_id LIMIT 20
    """,
    doc="BM25 top-k retrieval (k1=1.2, b=0.75) — the classic lexical "
    "ranking the RAG stack runs beside embedding search: the query is "
    "the corpus's frequency ranks 21-25 (mid-frequency terms, "
    "deterministically derived like every fixture injection), each "
    "matching document scores sum_t idf_t * tf*(k1+1)/(tf + "
    "k1*(1-b+b*dl/avgdl)), and the 20 best documents are returned. "
    "Engine-exactness discipline: idf (the ONLY transcendental — ln) "
    "is rounded to 9 dp BEFORE use so a 1-ulp libm divergence cannot "
    "propagate, every other float op is a correctly-rounded IEEE "
    "+-*/ chain with identical parenthesization in both engines, and "
    "per-term scores become DECIMAL(28,12) before the per-doc sum "
    "(order-free; the token_drift precedent). The top-k sorts the "
    "EXACT decimal with a doc_id tiebreak — deterministic cutoff. "
    "Shapes: explode -> two vocab-bounded aggs, broadcast 5-term "
    "query + 1-row stats, one (doc, term) agg, global top-20 via "
    "TakeOrdered (no unbounded window; the rank window runs over 25 "
    "rows).",
)
def docs_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    tok = table(spark, sf, "documents").select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total"),
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top25 = vocab.orderBy(F.col("cnt").desc(), "tok").limit(25)
    w = Window.orderBy(F.col("cnt").desc(), "tok")  # 25 bounded rows
    q = (
        top25.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") >= 21) & (F.col("rn") <= 25))
        .select("tok")
    )
    tf = (
        tok.join(F.broadcast(q), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.round(
            F.log(
                (
                    (F.col("n_docs") - F.col("df")).cast("double") + 0.5
                )
                / (F.col("df").cast("double") + 0.5)
                + 1.0
            ),
            9,
        ).alias("idf"),
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("total").cast("double") / F.col("n_docs")
    term = (
        F.col("idf")
        * (
            (tfd * 2.2)
            / (tfd + (1.2 * (0.25 + (0.75 * (dld / avgdl)))))
        )
    ).cast("decimal(28,12)")
    sc = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term.alias("term"))
    )
    per = sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("term").alias("s"),
    )
    return (
        per.orderBy(F.col("s").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "n_matched",
            F.round(F.col("s").cast("double"), 6).alias("bm25"),
        )
    )


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


_RAKE_TOPN = 20


def _rake_stop_sql() -> str:
    from graphdatabases_spark.functions.text import LANG_STOPWORDS

    words = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
        unnest(tk) AS tok
      FROM (SELECT doc_id, {TOKS} AS tk FROM documents)
    ),
    flagged AS (
      SELECT doc_id, pos, tok,
        list_contains({_rake_stop_sql()}, tok) AS is_stop
      FROM toks
    ),
    marked AS (
      SELECT doc_id, pos, tok, is_stop,
        sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
          PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS island
      FROM flagged
    ),
    isl AS (
      SELECT doc_id, pos, tok, island FROM marked WHERE NOT is_stop
    ),
    phr AS (
      SELECT doc_id, island,
        array_to_string(list(tok ORDER BY pos), ' ') AS phrase,
        CAST(count(*) AS BIGINT) AS n_words
      FROM isl GROUP BY doc_id, island
    ),
    pw AS (
      SELECT phrase, n_words, unnest(string_split(phrase, ' ')) AS w
      FROM phr
    ),
    ws AS (
      SELECT w,
        CAST(count(*) AS BIGINT) AS freq,
        CAST(sum(n_words) AS BIGINT) AS degree
      FROM pw GROUP BY w
    ),
    ps AS (
      SELECT phrase, max(n_words) AS n_words,
        count(*) // max(n_words) AS freq,
        CAST((sum((1000000 * ws.degree) // ws.freq) * max(n_words))
          // count(*) AS BIGINT) AS score_ppm
      FROM pw JOIN ws USING (w) GROUP BY phrase
    )
    SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
      CAST(freq AS BIGINT) AS freq, score_ppm
    FROM ps
    ORDER BY score_ppm DESC, phrase
    LIMIT {_RAKE_TOPN}
    """,
    doc="RAKE keyword extraction (Rose et al., 'Automatic keyword "
    "extraction from individual documents'): candidate phrases are "
    "maximal stopword-free token runs — carved by GAPS-AND-ISLANDS "
    "(the island id is the running stopword count over each "
    "document's token positions, one partitioned window), each "
    "word scores degree/freq over the corpus phrase multiset "
    "(degree = summed length of phrases containing it, freq = its "
    "phrase occurrences), and a phrase scores the sum of its words' "
    "scores. ARITHMETIC: word scores are EXACT integer ppm floors "
    "((1e6 x degree) // freq), phrase scores exact integer sums of "
    "those — no float accumulation, so the top-"
    f"{_RAKE_TOPN} cut (score desc, phrase asc) is deterministic in "
    "both engines. A phrase occurring k times contributes k "
    "identical word-rows; its per-occurrence score divides back out "
    "(sum / n_words per occurrence... the phrase group sums across "
    "occurrences and divides by one occurrence's length). Scale "
    "shape: tokenize-explode -> one windowed island pass -> three "
    "keyed aggs, all linear; the stopword list is a literal array. "
    "(Fixture note: the synthetic corpus is stopword-sparse, so its "
    "maximal runs are long — the mechanism, not the fixture prose, "
    "is what the oracle pins.)",
)
def text_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from graphdatabases_spark.functions.text import LANG_STOPWORDS

    stops = F.array(
        *[
            F.lit(w)
            for w in sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
        ]
    )
    toks = (
        table(spark, sf, "documents")
        .select("doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "tok"))
        .select(
            "doc_id",
            "pos",
            "tok",
            F.array_contains(stops, F.col("tok")).alias("is_stop"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = toks.withColumn(
        "island", F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(w)
    ).filter(~F.col("is_stop"))
    phr = isl.groupBy("doc_id", "island").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    pw = phr.select(
        "phrase", "n_words", F.explode(F.split("phrase", " ")).alias("w")
    )
    ws = pw.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("degree"),
    )
    ps = (
        pw.join(ws, "w")
        .groupBy("phrase")
        .agg(
            F.max("n_words").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.expr("(1000000 * degree) div freq"))
            .cast("long")
            .alias("raw_sum"),
        )
        .select(
            "phrase",
            "n_words",
            # one row per (occurrence, word): occurrences = rows/words,
            # and raw_sum = occurrences x phrase_score — both divisions
            # are exact by construction.
            F.expr("n_rows div n_words").alias("freq"),
            F.expr("(raw_sum * n_words) div n_rows").alias("score_ppm"),
        )
    )
    return (
        ps.select("phrase", "n_words", "freq", "score_ppm")
        .orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(_RAKE_TOPN)
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
