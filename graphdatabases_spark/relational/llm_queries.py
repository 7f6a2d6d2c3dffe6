"""LLM-data-pipeline catalog queries: text analysis, BM25 retrieval,
RAKE keywords, multimodal metadata — over the ``documents``/
``embeddings`` fixtures.  The dedup, embedding-similarity/ANN, and
sketch families split into dedup_queries.py / similarity_queries.py /
sketch_queries.py in round 9 (pure move; registry unchanged).

Every entry pairs the Spark operator (functions/{text,multimodal}.py)
with a DuckDB SQL mirror built on the same portable 48-bit md5-prefix
hash, so signatures/fingerprints match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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



# ---------------------------------------------------------------------------
# Image near-dup via perceptual hash (dHash/aHash) over a BMP corpus
# ---------------------------------------------------------------------------

_PH_W, _PH_H = 9, 8  # 9x8 luma -> 8x8 horizontal gradients = 64 dHash bits
_PH_TWIN_EVERY = 10
_PH_OFFSET = 10_000_000
_PH_HAM_MAX = 6  # near-dup gate on the dHash Hamming distance
# The 54-byte BMP file+info header for a 9x8 24-bpp bottom-up image,
# re-derived from the format spec (BITMAPFILEHEADER + BITMAPINFOHEADER;
# row stride (9*3+3)&~3 = 28, raster 224, total 278) — independent of
# functions/bmp_codec.py so the oracle's byte contract checks the REAL
# encoder's output rather than restating it.
import struct as _struct  # noqa: E402

_PH_HEADER_HEX = (
    b"BM"
    + _struct.pack("<IHHI", 54 + 28 * _PH_H, 0, 0, 54)
    + _struct.pack(
        "<IiiHHIIiiII",
        40, _PH_W, _PH_H, 1, 24, 0, 28 * _PH_H, 2835, 2835, 0, 0,
    )
).hex()

# Per-doc luma bytes: 72 md5 bytes from 5 chained seeds (same stream in
# both engines). v(i) for 0-based luma index i:
_PH_V = (
    "(('0x' || substr(md5('img:' || base_id || ':' || ({i} // 16)),"
    " 2 * ({i} % 16) + 1, 2))::INT)"
)
_PH_LUMA = (
    "list_transform(range(0, 72), i -> CASE WHEN twin AND i < 2"
    f" THEN least(255, {_PH_V.format(i='i')} + 3)"
    f" ELSE {_PH_V.format(i='i')} END)"
)


@register(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, doc_id AS base_id, false AS twin FROM documents
      UNION ALL
      SELECT doc_id + {_PH_OFFSET}, doc_id, true FROM documents
      WHERE doc_id % {_PH_TWIN_EVERY} = 0
    ),
    lum AS MATERIALIZED (
      SELECT doc_id, {_PH_LUMA} AS L FROM corpus
    ),
    hashed AS MATERIALIZED (
      SELECT doc_id,
        CAST(list_sum(list_transform(range(0, 32), b ->
          CASE WHEN L[(b // 8) * 9 + (b % 8) + 1]
                 < L[(b // 8) * 9 + (b % 8) + 2]
               THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS dh_lo,
        CAST(list_sum(list_transform(range(32, 64), b ->
          CASE WHEN L[(b // 8) * 9 + (b % 8) + 1]
                 < L[(b // 8) * 9 + (b % 8) + 2]
               THEN (1::BIGINT << (b - 32)) ELSE 0 END)) AS BIGINT) AS dh_hi,
        CAST(list_sum(list_transform(range(0, 32), b ->
          CASE WHEN L[(b // 8) * 9 + (b % 8) + 1] >= mean
               THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS ah_lo,
        CAST(list_sum(list_transform(range(32, 64), b ->
          CASE WHEN L[(b // 8) * 9 + (b % 8) + 1] >= mean
               THEN (1::BIGINT << (b - 32)) ELSE 0 END)) AS BIGINT) AS ah_hi,
        sha256('{_PH_HEADER_HEX}' ||
          array_to_string(list_transform(range(0, 8), r ->
            array_to_string(list_transform(range(0, 9), c ->
              repeat(lpad(lower(to_hex(L[(7 - r) * 9 + c + 1])), 2, '0'),
                     3)), '') || '00'), '')) AS sha_hex
      FROM (
        SELECT doc_id, L,
          list_sum(list_transform(range(0, 64),
            b -> L[(b // 8) * 9 + (b % 8) + 1])) // 64 AS mean
        FROM lum
      )
    ),
    bands AS (
      SELECT doc_id, b,
        CASE b WHEN 0 THEN dh_lo % 65536 WHEN 1 THEN dh_lo // 65536
               WHEN 2 THEN dh_hi % 65536 ELSE dh_hi // 65536 END AS val
      FROM hashed, range(0, 4) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON b.b = a.b AND b.val = a.val AND b.doc_id > a.doc_id
    )
    SELECT c.doc_a, c.doc_b,
      CAST(bit_count(xor(x.dh_lo, y.dh_lo))
           + bit_count(xor(x.dh_hi, y.dh_hi)) AS BIGINT) AS ham_d,
      CAST(bit_count(xor(x.ah_lo, y.ah_lo))
           + bit_count(xor(x.ah_hi, y.ah_hi)) AS BIGINT) AS ham_a,
      x.sha_hex AS sha_a, y.sha_hex AS sha_b
    FROM cand c
    JOIN hashed x ON x.doc_id = c.doc_a
    JOIN hashed y ON y.doc_id = c.doc_b
    WHERE bit_count(xor(x.dh_lo, y.dh_lo))
          + bit_count(xor(x.dh_hi, y.dh_hi)) <= {_PH_HAM_MAX}
    ORDER BY doc_a, doc_b
    """,
    doc="Image NEAR-DUP via perceptual hashing over a real BMP corpus "
    "— the dedup axis the multimodal family lacked (codecs + "
    "featurize existed; no similarity). Each doc synthesizes a 9×8 "
    "grayscale image from 5 chained md5 blocks (every 10th doc gets "
    "a planted twin with two +3-luma pixel bumps), and the SPARK "
    "side runs the REAL pipeline in one Arrow-batched mapInPandas: "
    "bmp_encode (24-bpp BGR, bottom-up, 4-byte row stride) → "
    "bmp_decode (functions/bmp_codec.py) → dHash (64 horizontal "
    "gradient bits) + aHash (mean-threshold bits), hashes carried as "
    "two BIGINT halves (no sign-bit hazard at bit 63). Candidates "
    "come from 4×16-bit dHash Hamming BANDS (the SRP banding "
    "construction applied to bit-space): ≤2 flipped bits can break "
    "at most 2 bands, so every planted twin (Hamming ≤ 2) is "
    "GUARANTEED a shared band — recall 1.0 by pigeonhole, never "
    "all-pairs. Verification is exact bit_count(xor) ≤ 6 on the "
    "candidate set only. BYTE CONTRACT: each pair row carries "
    "sha256 of the hex rendering of the ACTUAL encoder payload, and "
    "the oracle reassembles the BMP byte-for-byte from the format "
    "spec (header constant re-derived from BITMAPINFOHEADER struct "
    "layout, bottom-up BGR raster + row padding in SQL) — a wrong "
    "stride, row order, or padding byte in the codec fails the hash. "
    "Scale: hashing is per-row Arrow work; the band join is the "
    "bounded-collision bucket join (16-bit bands ⇒ E[pairs/band] = "
    "n²/2¹⁶ ≪ n²); verification touches candidates only.",
)
def multimodal_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    base = table(spark, sf, "documents").select("doc_id")
    corpus = base.select(
        "doc_id",
        F.col("doc_id").alias("base_id"),
        F.lit(False).alias("twin"),
    ).unionByName(
        base.filter(F.col("doc_id") % _PH_TWIN_EVERY == 0).select(
            (F.col("doc_id") + _PH_OFFSET).alias("doc_id"),
            F.col("doc_id").alias("base_id"),
            F.lit(True).alias("twin"),
        )
    )

    def hash_images(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from graphdatabases_spark.functions.bmp_codec import (
            bmp_decode,
            bmp_encode,
        )

        for pdf in batches:
            out = {
                "doc_id": [], "dh_lo": [], "dh_hi": [],
                "ah_lo": [], "ah_hi": [], "sha_hex": [],
            }
            for doc_id, base_id, twin in zip(
                pdf["doc_id"], pdf["base_id"], pdf["twin"]
            ):
                raw = b"".join(
                    hashlib.md5(f"img:{base_id}:{k}".encode()).digest()
                    for k in range(5)
                )[: _PH_W * _PH_H]
                luma = (
                    np.frombuffer(raw, np.uint8)
                    .reshape(_PH_H, _PH_W)
                    .copy()
                )
                if twin:
                    flat = luma.reshape(-1)
                    flat[0] = min(255, int(flat[0]) + 3)
                    flat[1] = min(255, int(flat[1]) + 3)
                payload = bmp_encode(luma)
                dec, _ = bmp_decode(payload)  # the REAL round-trip
                dbits = (dec[:, :-1] < dec[:, 1:]).reshape(-1)
                mean = int(dec[:, : _PH_W - 1].astype(int).sum()) // 64
                abits = (dec[:, : _PH_W - 1].astype(int) >= mean).reshape(-1)
                lo = sum(1 << b for b in range(32) if dbits[b])
                hi = sum(1 << (b - 32) for b in range(32, 64) if dbits[b])
                alo = sum(1 << b for b in range(32) if abits[b])
                ahi = sum(1 << (b - 32) for b in range(32, 64) if abits[b])
                out["doc_id"].append(int(doc_id))
                out["dh_lo"].append(lo)
                out["dh_hi"].append(hi)
                out["ah_lo"].append(alo)
                out["ah_hi"].append(ahi)
                out["sha_hex"].append(
                    hashlib.sha256(payload.hex().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    hashed = corpus.mapInPandas(
        hash_images,
        "doc_id long, dh_lo long, dh_hi long, ah_lo long, ah_hi long,"
        " sha_hex string",
    )
    hashed = hashed.localCheckpoint(eager=False)
    bands = hashed.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"), (F.col("dh_lo") % 65536).alias("val")),
                F.struct(F.lit(1).alias("b"), F.expr("dh_lo div 65536").alias("val")),
                F.struct(F.lit(2).alias("b"), (F.col("dh_hi") % 65536).alias("val")),
                F.struct(F.lit(3).alias("b"), F.expr("dh_hi div 65536").alias("val")),
            )
        ).alias("bv"),
    ).select("doc_id", "bv.b", "bv.val")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("b.b") == F.col("a.b"))
            & (F.col("b.val") == F.col("a.val"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    x = hashed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("dh_lo").alias("xlo"), F.col("dh_hi").alias("xhi"),
        F.col("ah_lo").alias("axlo"), F.col("ah_hi").alias("axhi"),
        F.col("sha_hex").alias("sha_a"),
    )
    y = hashed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("dh_lo").alias("ylo"), F.col("dh_hi").alias("yhi"),
        F.col("ah_lo").alias("aylo"), F.col("ah_hi").alias("ayhi"),
        F.col("sha_hex").alias("sha_b"),
    )
    ham_d = F.expr("bit_count(xlo ^ ylo) + bit_count(xhi ^ yhi)")
    ham_a = F.expr("bit_count(axlo ^ aylo) + bit_count(axhi ^ ayhi)")
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .filter(ham_d <= _PH_HAM_MAX)
        .select(
            "doc_a",
            "doc_b",
            ham_d.cast("long").alias("ham_d"),
            ham_a.cast("long").alias("ham_a"),
            "sha_a",
            "sha_b",
        )
        .orderBy("doc_a", "doc_b")
    )
