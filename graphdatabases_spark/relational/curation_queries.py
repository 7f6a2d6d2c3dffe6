"""Batch-7 training-data curation surface (SURVEY §7 round-6 queue).

Six corpus-curation operators a large-scale pretraining pipeline runs
between raw crawl and tokenizer: C4-style line filtering, PII
redaction accounting (defensive scrubbing), cross-document boilerplate
line removal, RAG chunking with overlap, URL/domain rollups, and
k-gram substring dedup (the rolling-hash approximation of
suffix-array dedup).

The fixture corpus is punctuation-free word salad, so — exactly like
``docs_decontaminate_ngrams``'s ``doc_id % 97`` eval split and
``dedup_embedding_neardup``'s dup-injected corpus — each entry derives
the structure it filters DETERMINISTICALLY from ``doc_id`` in both
engines (decorated lines, injected PII/URLs/footers, re-emitted
suffix copies), then runs the real mechanism on it.  The mechanisms,
not the injections, are the operators: every filter/redaction/dedup
path is a string-level rule evaluated on materialized text.

Scale notes (100 TB): entries 1/2/4/5 are pure per-row folds or one
keyed aggregation — no joins, partial-agg combinable. Entries 3/6 are
the posting-list shapes: explode → distinct → document-frequency
hash-agg → one equi-join back on a 48-bit BIGINT key (the portable
md5 hash both engines compute identically) instead of the raw line /
8-gram string, keeping shuffle rows fixed-width.  Nothing is
all-pairs; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.relational.analytics_queries import _ngram_array
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.llm_queries import TOKS as _TOKS

# DuckDB mirror of functions/text.py::portable_hash64 (48-bit md5 prefix).
_H = "('0x' || substr(md5({v}), 1, 12))::BIGINT"


def _docs_tokens(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "documents")
        .select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )


@register(
    "docs_c4_line_filters",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    x AS (
      SELECT doc_id, n, (n + 11) // 12 AS n_lines,
        list_transform(range(0, (n + 11) // 12), j ->
          CASE WHEN (doc_id * 7 + j) % 19 = 0 THEN chr(123) ELSE '' END
          || array_to_string(list_slice(toks, j*12 + 1, j*12 + 12), ' ')
          || CASE WHEN (doc_id + j) % 3 <> 2 THEN '.' ELSE '' END
        ) AS lines
      FROM b
    ),
    k AS (
      SELECT doc_id, n, n_lines,
        list_filter(lines, l -> l LIKE '%.'
          AND NOT contains(l, chr(123))
          AND len(string_split(l, ' ')) >= 5) AS kept
      FROM x
    ),
    w AS (
      SELECT doc_id, n, n_lines, len(kept) AS n_kept,
        coalesce(list_sum(list_transform(kept,
          l -> len(string_split(l, ' ')))), 0) AS kept_words
      FROM k
    )
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept AS BIGINT) AS n_kept,
           CAST(kept_words AS BIGINT) AS kept_words,
           round(CAST(kept_words AS DOUBLE) / n, 6) AS retained_frac
    FROM w ORDER BY doc_id
    """,
    doc="C4-style heuristic line filtering: the corpus is lined (12 "
    "tokens per line) and deterministically decorated from doc_id "
    "(2/3 of lines get terminal punctuation, ~1/19 a brace prefix — "
    "the code/boilerplate marker), then the classic C4 rules run ON "
    "THE LINE STRINGS: keep only lines that end in terminal "
    "punctuation, contain no curly brace, and have >= 5 words. "
    "Per-document retained-token fraction is the downstream sampling "
    "weight. Everything is a per-row higher-order fold over the line "
    "array — zero joins, zero shuffles beyond the final ORDER BY.",
)
def docs_c4_line_filters(spark: SparkSession, sf: str) -> DataFrame:
    b = _docs_tokens(spark, sf)
    n = F.col("n")
    n_lines = F.floor((n + F.lit(11)) / 12).cast("long")
    toks = F.col("toks")
    doc_id = F.col("doc_id")
    lines = F.transform(
        F.sequence(F.lit(0).cast("long"), F.col("n_lines") - 1),
        lambda j: F.concat(
            F.when((doc_id * 7 + j) % 19 == 0, F.lit("{")).otherwise(""),
            F.concat_ws(" ", F.slice(toks, (j * 12 + 1).cast("int"), 12)),
            F.when((doc_id + j) % 3 != 2, F.lit(".")).otherwise(""),
        ),
    )

    def words(line):
        return F.size(F.split(line, " "))

    kept = F.filter(
        F.col("lines"),
        lambda line: F.endswith(line, F.lit("."))
        & ~F.contains(line, F.lit("{"))
        & (words(line) >= 5),
    )
    kept_words = F.aggregate(
        F.col("kept"), F.lit(0).cast("long"), lambda acc, line: acc + words(line)
    )
    return (
        b.withColumn("n_lines", n_lines)
        .withColumn("lines", lines)
        .withColumn("kept", kept)
        .withColumn("kept_words", kept_words)
        .select(
            "doc_id",
            "n_lines",
            F.size("kept").cast("long").alias("n_kept"),
            "kept_words",
            F.round(F.col("kept_words").cast("double") / n, 6).alias(
                "retained_frac"
            ),
        )
        .orderBy("doc_id")
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"
_IP_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


@register(
    "docs_pii_redaction",
    oracle=r"""
    WITH aug AS (
      SELECT source, doc_id,
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
             ELSE '' END AS t
      FROM documents
    ),
    cnt AS (
      SELECT source,
        len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS e,
        len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS p,
        len(regexp_extract_all(t, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS i,
        length(t) - length(
          regexp_replace(regexp_replace(regexp_replace(t,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
            '\b555-[0-9]{4}\b', '[PHONE]', 'g'),
            '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g')) AS delta
      FROM aug
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(e) AS BIGINT) AS n_emails,
      CAST(sum(p) AS BIGINT) AS n_phones,
      CAST(sum(i) AS BIGINT) AS n_ips,
      CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_docs_with_pii,
      CAST(sum(delta) AS BIGINT) AS chars_redacted
    FROM cnt GROUP BY source ORDER BY source
    """,
    doc="Regex PII redaction accounting (defensive scrubbing): PII "
    "tokens (emails, 555-prefixed phone numbers, dotted-quad IPs) are "
    "deterministically injected from doc_id (%% 7 / %% 11 / %% 13 "
    "membership), then counted AND redacted with the three standard "
    "regex classes; the per-source rollup reports match counts, "
    "affected-document counts, and characters removed by the "
    "[EMAIL]/[PHONE]/[IP] replacement chain — the audit table a "
    "scrubbing pass must emit. One combinable keyed aggregation over "
    "a per-row regex scan; Spark regexp_replace is global by default, "
    "mirrored by DuckDB's 'g' flag.",
)
def docs_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
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
    t = F.col("t")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ),
        _IP_RE,
        "[IP]",
    )
    cnt = (
        table(spark, sf, "documents")
        .select("source", "doc_id", aug.alias("t"))
        .select(
            "source",
            F.regexp_count(t, F.lit(_EMAIL_RE)).alias("e"),
            F.regexp_count(t, F.lit(_PHONE_RE)).alias("p"),
            F.regexp_count(t, F.lit(_IP_RE)).alias("i"),
            (F.length(t) - F.length(redacted)).alias("delta"),
        )
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").cast("long").alias("n_emails"),
            F.sum("p").cast("long").alias("n_phones"),
            F.sum("i").cast("long").alias("n_ips"),
            F.sum(
                F.when(F.col("e") + F.col("p") + F.col("i") > 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_docs_with_pii"),
            F.sum("delta").cast("long").alias("chars_redacted"),
        )
        .orderBy("source")
    )


@register(
    "docs_boilerplate_lines",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    x AS (
      SELECT doc_id,
        CASE WHEN doc_id % 4 <> 3
          THEN list_concat(
            list_transform(range(0, (n + 5) // 6), j ->
              array_to_string(list_slice(toks, j*6 + 1, j*6 + 6), ' ')),
            ['copyright footer line ' || (doc_id % 3)])
          ELSE list_transform(range(0, (n + 5) // 6), j ->
            array_to_string(list_slice(toks, j*6 + 1, j*6 + 6), ' '))
        END AS lines
      FROM b
    ),
    h AS (
      SELECT doc_id, {_H.format(v="line")} AS lh
      FROM (SELECT doc_id, unnest(lines) AS line FROM x)
    ),
    df AS (
      SELECT lh, count(*) AS df
      FROM (SELECT DISTINCT lh, doc_id FROM h) GROUP BY lh
    ),
    per AS (
      SELECT doc_id, count(*) AS n_lines,
        CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
      FROM h JOIN df USING (lh) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, n_removed,
           CAST(n_lines - n_removed AS BIGINT) AS n_kept,
           round(CAST(n_removed AS DOUBLE) / n_lines, 6) AS removed_frac
    FROM per ORDER BY doc_id
    """,
    doc="Cross-document line-level boilerplate removal (the "
    "cookie-banner / footer scrub): the corpus is lined (6 tokens per "
    "line) and 3/4 of documents get one of three rotating injected "
    "footer lines (the deterministic stand-in for real boilerplate); "
    "a line whose 48-bit hash appears in >= 5 DISTINCT documents is "
    "boilerplate and removed everywhere. The posting list is "
    "explode -> distinct(doc,line-hash) -> document-frequency "
    "hash-agg -> one equi-join back on the fixed-width BIGINT line "
    "hash (never the line string), so shuffle width is constant at "
    "any corpus size and partial aggs combine map-side.",
)
def docs_boilerplate_lines(spark: SparkSession, sf: str) -> DataFrame:
    b = _docs_tokens(spark, sf)
    toks, doc_id = F.col("toks"), F.col("doc_id")
    base_lines = F.transform(
        F.sequence(
            F.lit(0).cast("long"),
            F.floor((F.col("n") + F.lit(5)) / 6).cast("long") - 1,
        ),
        lambda j: F.concat_ws(" ", F.slice(toks, (j * 6 + 1).cast("int"), 6)),
    )
    footer = F.concat(
        F.lit("copyright footer line "), (doc_id % 3).cast("string")
    )
    lines = F.when(
        doc_id % 4 != 3, F.concat(base_lines, F.array(footer))
    ).otherwise(base_lines)
    h = b.select(
        "doc_id", F.explode(lines).alias("line")
    ).select("doc_id", T.portable_hash64(F.col("line")).alias("lh"))
    df = (
        h.select("lh", "doc_id")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    per = (
        h.join(df, "lh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("df") >= 5, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
    )
    return per.select(
        "doc_id",
        "n_lines",
        "n_removed",
        (F.col("n_lines") - F.col("n_removed")).cast("long").alias("n_kept"),
        F.round(
            F.col("n_removed").cast("double") / F.col("n_lines"), 6
        ).alias("removed_frac"),
    ).orderBy("doc_id")


@register(
    "docs_rag_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    x AS (
      SELECT doc_id, toks, n,
        1 + (greatest(n - 64, 0) + 47) // 48 AS n_chunks
      FROM b
    ),
    s AS (
      SELECT doc_id, toks, n, n_chunks,
        list_sum(list_transform(range(0, n_chunks),
          i -> least(64, n - i*48))) AS chunk_tok_total
      FROM x
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_toks,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(chunk_tok_total AS BIGINT) AS chunk_tok_total,
           CAST(chunk_tok_total - n AS BIGINT) AS overlap_toks,
           md5(array_to_string(list_slice(toks, 1, 64), ' '))
             AS first_chunk_fp
    FROM s ORDER BY doc_id
    """,
    doc="RAG chunking with overlap (chunk = 64 tokens, stride = 48, "
    "i.e. 16-token overlap): each document yields "
    "1 + ceil(max(n-64,0)/48) windows; the entry emits the per-doc "
    "chunk count, total chunk tokens, and the CONSERVATION check "
    "column overlap_toks = chunk_tok_total - n_toks (every token "
    "appears in >= 1 chunk; the excess is exactly the double-counted "
    "overlap — pinned as an invariant in tests). first_chunk_fp "
    "fingerprints the actual materialized window text so the entry "
    "proves real slicing, not just arithmetic. Pure per-row list "
    "folds — no explode, no join, no shuffle.",
)
def docs_rag_chunks(spark: SparkSession, sf: str) -> DataFrame:
    b = _docs_tokens(spark, sf)
    n, toks = F.col("n"), F.col("toks")
    n_chunks = (
        F.lit(1)
        + F.floor((F.greatest(n - 64, F.lit(0)) + F.lit(47)) / 48)
    ).cast("long")
    chunk_tok_total = F.aggregate(
        F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.least(F.lit(64).cast("long"), n - i * 48),
    )
    return (
        b.withColumn("n_chunks", n_chunks)
        .withColumn("chunk_tok_total", chunk_tok_total)
        .select(
            "doc_id",
            n.cast("long").alias("n_toks"),
            "n_chunks",
            "chunk_tok_total",
            (F.col("chunk_tok_total") - n).cast("long").alias("overlap_toks"),
            F.md5(F.concat_ws(" ", F.slice(toks, 1, 64))).alias(
                "first_chunk_fp"
            ),
        )
        .orderBy("doc_id")
    )


_URL_RE = r"https?://[a-z0-9.-]+(?:/[a-z0-9/._-]*)?"


@register(
    "docs_url_domain_rollup",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id, n_chars,
        text
        || CASE WHEN doc_id % 3 = 0
             THEN ' see https://site' || (doc_id % 23)
                  || '.example.com/p/' || doc_id
             ELSE '' END
        || CASE WHEN doc_id % 5 = 0
             THEN ' and http://cdn' || (doc_id % 7) || '.example.org/x'
             ELSE '' END AS t
      FROM documents
    ),
    u AS (
      SELECT doc_id, n_chars,
        unnest(regexp_extract_all(t,
          'https?://[a-z0-9.-]+(?:/[a-z0-9/._-]*)?')) AS url
      FROM aug
    ),
    d AS (
      SELECT doc_id, n_chars,
        regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
        CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END AS https
      FROM u
    )
    SELECT domain,
      CAST(count(*) AS BIGINT) AS n_urls,
      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      round(CAST(sum(https) AS DOUBLE) / count(*), 6) AS https_frac,
      round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_doc_chars
    FROM d GROUP BY domain ORDER BY domain
    """,
    doc="URL extraction with per-domain quality rollups (the crawl "
    "provenance table): URLs are deterministically injected from "
    "doc_id (%% 3 -> one of 23 https site domains, %% 5 -> one of 7 "
    "http cdn domains), extracted with the standard scheme://host "
    "regex, and rolled up per domain: URL count, distinct containing "
    "documents, https share, and average containing-document size. "
    "The average divides an EXACT BIGINT sum (order-free) rather than "
    "avg() over doubles, so the rounded value is engine- and "
    "partitioning-invariant. Regex scan -> explode -> one keyed "
    "aggregation; output cardinality is the (bounded) domain count.",
)
def docs_url_domain_rollup(spark: SparkSession, sf: str) -> DataFrame:
    doc_id = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            doc_id % 3 == 0,
            F.concat(
                F.lit(" see https://site"),
                (doc_id % 23).cast("string"),
                F.lit(".example.com/p/"),
                doc_id.cast("string"),
            ),
        ).otherwise(""),
        F.when(
            doc_id % 5 == 0,
            F.concat(
                F.lit(" and http://cdn"),
                (doc_id % 7).cast("string"),
                F.lit(".example.org/x"),
            ),
        ).otherwise(""),
    )
    u = (
        table(spark, sf, "documents")
        .select("doc_id", "n_chars", aug.alias("t"))
        .select(
            "doc_id",
            "n_chars",
            F.explode(F.regexp_extract_all("t", F.lit(_URL_RE), 0)).alias(
                "url"
            ),
        )
    )
    d = u.select(
        "doc_id",
        "n_chars",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("domain"),
        F.when(F.col("url").startswith("https://"), 1).otherwise(0).alias(
            "https"
        ),
    )
    return (
        d.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.round(
                F.sum("https").cast("double") / F.count(F.lit(1)), 6
            ).alias("https_frac"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_doc_chars"),
        )
        .orderBy("domain")
    )


@register(
    "docs_substring_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    copies AS (
      SELECT doc_id,
        list_concat(list_slice(toks, 5, len(toks)),
                    ['zz' || doc_id]) AS toks
      FROM (SELECT doc_id + 1000000 AS doc_id, toks FROM t
            WHERE doc_id % 41 = 0 AND len(toks) >= 12)
    ),
    corp AS (
      SELECT doc_id, toks FROM t WHERE len(toks) >= 8
      UNION ALL SELECT doc_id, toks FROM copies
    ),
    g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(toks) - 6),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
          || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' '
          || toks[i+6] || ' ' || toks[i+7]))) AS gram
      FROM corp
    ),
    h AS (SELECT doc_id, {_H.format(v="gram")} AS gh FROM g),
    df AS (SELECT gh, count(*) AS df FROM h GROUP BY gh),
    per AS (
      SELECT doc_id, count(*) AS n_grams,
        CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM h JOIN df USING (gh) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_dup,
           round(CAST(n_dup AS DOUBLE) / n_grams, 6) AS dup_frac,
           round(CAST(n_dup AS DOUBLE) / n_grams, 6) >= 0.5 AS flagged
    FROM per ORDER BY doc_id
    """,
    doc="Suffix-hash substring dedup (the k-gram rolling-hash posting "
    "approximation of suffix-array substring dedup): the corpus is "
    "augmented with deterministic long-shared-substring copies "
    "(doc_id %% 41 == 0 documents re-emitted under id+1,000,000 as "
    "their token suffix from position 5 plus a unique tail token, so "
    "the pair shares a long substring but is NOT an exact dup), then "
    "every token 8-gram is hashed to a 48-bit BIGINT, a "
    "document-frequency posting list marks grams seen in >= 2 "
    "documents, and each document is scored by its duplicated-gram "
    "fraction (flagged at 50%% — both injected partners flag; "
    "random cross-document 8-gram collisions are ~0). Like the LSH "
    "kernels: explode -> hash-agg -> one BIGINT equi-join, shuffle "
    "rows are fixed-width, nothing is all-pairs.",
)
def docs_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    t = (
        table(spark, sf, "documents")
        .select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    copies = (
        t.filter((F.col("doc_id") % 41 == 0) & (F.col("n") >= 12))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.slice(F.col("toks"), 5, F.col("n") - 4),
                F.array(
                    F.concat(
                        F.lit("zz"), (F.col("doc_id") + 1000000).cast("string")
                    )
                ),
            ).alias("toks"),
        )
    )
    corp = t.filter(F.col("n") >= 8).select("doc_id", "toks").unionByName(
        copies
    )
    h = corp.select(
        "doc_id",
        F.explode(
            F.array_distinct(_ngram_array(F.col("toks"), 8))
        ).alias("gram"),
    ).select("doc_id", T.portable_hash64(F.col("gram")).alias("gh"))
    df = h.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    dup_frac = F.round(F.col("n_dup").cast("double") / F.col("n_grams"), 6)
    return (
        h.join(df, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            dup_frac.alias("dup_frac"),
            (dup_frac >= 0.5).alias("flagged"),
        )
        .orderBy("doc_id")
    )


@register(
    "docs_hash_sample",
    oracle="""
    WITH t AS (
      SELECT source, doc_id,
        len(list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
            x -> x <> '')) AS n_toks,
        10 + (CAST(substr(source, 4) AS BIGINT) % 4) * 10 AS rate_pct,
        ('0x' || substr(md5('smpl' || doc_id), 1, 12))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
        AS n_sampled,
      CAST(max(rate_pct) AS BIGINT) AS rate_pct,
      round(100.0 * sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END)
            / count(*), 6) AS realized_pct,
      CAST(sum(CASE WHEN bucket < rate_pct THEN n_toks ELSE 0 END) AS BIGINT)
        AS tok_sampled
    FROM t GROUP BY source ORDER BY source
    """,
    doc="Deterministic hash-bucket sampling accounting (the train-subset "
    "/ eval-split draw): each source gets a configured rate (10-40%%, "
    "derived from the source number) and each document a stable 0-99 "
    "bucket from the portable 48-bit md5 hash of its id — the ONLY way "
    "to sample 100 TB reproducibly (no RNG state, no ordering "
    "dependence; re-running or re-partitioning draws the SAME sample). "
    "Unlike docs_stratified_sample's key-mod draw, the md5 bucket is "
    "uncorrelated with id-derived structure (every other entry keys "
    "injections off doc_id moduli — a %% 100 draw would collide with "
    "them). The rollup reports configured vs realized rates and "
    "sampled token mass per stratum. One scan, one combinable keyed "
    "aggregation, zero joins.",
)
def docs_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    src_num = F.substring(F.col("source"), 4, 10).cast("long")
    rate = (F.lit(10) + (src_num % 4) * 10).alias("rate_pct")
    bucket = (
        T.portable_hash64(
            F.concat(F.lit("smpl"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    t = table(spark, sf, "documents").select(
        "source",
        F.size(T.tokens(F.col("text"))).alias("n_toks"),
        rate,
        bucket.alias("bucket"),
    )
    hit = F.col("bucket") < F.col("rate_pct")
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_sampled"),
            F.max("rate_pct").cast("long").alias("rate_pct"),
            F.round(
                F.lit(100.0)
                * F.sum(F.when(hit, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("realized_pct"),
            F.sum(F.when(hit, F.col("n_toks")).otherwise(0))
            .cast("long")
            .alias("tok_sampled"),
        )
        .orderBy("source")
    )


@register(
    "docs_unigram_surprise",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab),
    scored AS (
      SELECT tok, CAST(length(bin(n_total // cnt)) - 1 AS BIGINT) AS surprise
      FROM vocab, tot
    ),
    per AS (
      SELECT doc_id, count(*) AS n_toks,
        CAST(sum(surprise) AS BIGINT) AS sum_surprise
      FROM tok JOIN scored USING (tok) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, sum_surprise,
           round(CAST(sum_surprise AS DOUBLE) / n_toks, 6) AS avg_surprise,
           round(CAST(sum_surprise AS DOUBLE) / n_toks, 6) < 4.0 AS flagged_low
    FROM per ORDER BY doc_id
    """,
    doc="Unigram-surprise scoring (the perplexity-proxy quality "
    "filter): a corpus-wide unigram table assigns each token the "
    "INTEGER surprise floor(log2(total/count)) — computed as binary "
    "digit length, so both engines agree bit-for-bit with no libm log "
    "involved — and each document is scored by its mean token "
    "surprise; implausibly predictable documents (avg < 4 bits) are "
    "flagged, exactly how a cheap LM-free fluency filter runs before "
    "the expensive model-based pass. The vocabulary is a hash-agg "
    "(bounded by vocab size, not corpus size), re-joined per token "
    "occurrence; the total is a broadcast 1-row scalar.",
)
def docs_unigram_surprise(spark: SparkSession, sf: str) -> DataFrame:
    tok = (
        table(spark, sf, "documents")
        .select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("n_total"))
    # `div` is true integer division (the DuckDB `//` mirror): a double
    # `/`+floor would be exact at these magnitudes but not by contract.
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        (F.length(F.bin(F.expr("n_total div cnt"))) - 1)
        .cast("long")
        .alias("surprise"),
    )
    avg = F.round(
        F.col("sum_surprise").cast("double") / F.col("n_toks"), 6
    )
    return (
        tok.join(F.broadcast(scored), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("surprise").cast("long").alias("sum_surprise"),
        )
        .select(
            "doc_id",
            "n_toks",
            "sum_surprise",
            avg.alias("avg_surprise"),
            (avg < 4.0).alias("flagged_low"),
        )
        .orderBy("doc_id")
    )


@register(
    "docs_source_overlap",
    oracle=f"""
    WITH fp AS (
      SELECT DISTINCT source,
        md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
      FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY src_a, src_b
    """,
    doc="Cross-source contamination matrix: the canonical token-set "
    "fingerprint collapses near-dup documents to one key; sources "
    "sharing a fingerprint share content, and the pairwise rollup "
    "(src_a < src_b) is the dedup-audit table that tells you WHICH "
    "feeds are mirroring each other before you weight them. The "
    "self-join runs per fingerprint group (dup clusters — tiny, "
    "bounded by cluster size squared, never corpus all-pairs) after a "
    "distinct (source, fp) projection; output cardinality is at most "
    "sources², here 20x19/2.",
)
def docs_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    fp = (
        table(spark, sf, "documents")
        .select("source", T.fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("src_a", "src_b")
    )


@register(
    "docs_select_budget",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len({_TOKS}) AS n_toks,
             len(list_distinct({_TOKS})) AS n_uniq,
             (length(lower(text)) - length(regexp_replace(lower(text),
                '[^a-z0-9 ]', '', 'g')))
               / greatest(length(lower(text)), 1) AS punct
      FROM documents
    ),
    q AS (
      SELECT source, doc_id, n_toks,
        round((CASE WHEN n_toks BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END) * 0.4
              + (1.0 - punct) * 0.3
              + (n_uniq / greatest(n_toks, 1)) * 0.3, 6) AS quality
      FROM t
    ),
    c AS (
      SELECT source, doc_id, n_toks, quality,
        sum(n_toks) OVER (PARTITION BY source
          ORDER BY quality DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_selected,
      CAST(sum(n_toks) AS BIGINT) AS tok_selected,
      min(quality) AS cutoff_quality
    FROM c WHERE cum <= 4096
    GROUP BY source ORDER BY source
    """,
    doc="Token-budget-constrained corpus selection (the data-mixing "
    "step that fills each source's training quota with its BEST "
    "documents): within every source, documents are ranked by the "
    "deterministic quality score (ties by doc_id) and greedily "
    "selected while the running token sum stays within the 4096-token "
    "per-source budget; the rollup reports how many documents and "
    "tokens made the cut and the marginal quality cutoff. Greedy "
    "selection is sequential per stratum, so it shards by source "
    "exactly like sequence packing shards by doc group — the window "
    "is PARTITIONed (parallel across sources), never a global sort.",
)
def docs_select_budget(spark: SparkSession, sf: str) -> DataFrame:
    toks = T.tokens(F.col("text"))
    q = table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.size(toks).alias("n_toks"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum", F.sum("n_toks").over(w))
        .filter(F.col("cum") <= 4096)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_toks").cast("long").alias("tok_selected"),
            F.min("quality").alias("cutoff_quality"),
        )
        .orderBy("source")
    )


@register(
    "docs_incremental_dedup",
    oracle=f"""
    WITH fp AS (
      SELECT source, doc_id,
        md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
      FROM documents
    ),
    snap AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 3 = 0),
    newc AS (SELECT source, fp FROM fp WHERE doc_id % 3 <> 0)
    SELECT n.source,
      CAST(count(*) AS BIGINT) AS n_new,
      CAST(sum(CASE WHEN s.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_novel,
      CAST(sum(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dup_vs_snapshot
    FROM newc n LEFT JOIN snap s ON n.fp = s.fp
    GROUP BY n.source ORDER BY n.source
    """,
    doc="Incremental snapshot dedup (the continuously-crawled-corpus "
    "shape): the prior snapshot's DISTINCT fingerprint set (doc_id %% "
    "3 == 0 stands in for yesterday's corpus — chosen coprime to the "
    "20-way source rotation so every source sees both sides) is "
    "probed by today's crawl (%% 3 != 0); per source, the rollup "
    "reports how much of "
    "the new batch is novel vs already-ingested content — the "
    "admission-control table an incremental pipeline writes instead "
    "of re-deduplicating 100 TB from scratch. One distinct-projection "
    "of the snapshot + one fingerprint equi-join; at scale the "
    "snapshot side is a bucketed fingerprint index, and only the NEW "
    "batch ever re-shuffles.",
)
def docs_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    fp = table(spark, sf, "documents").select(
        "source", "doc_id", T.fingerprint(F.col("text")).alias("fp")
    )
    snap = (
        fp.filter(F.col("doc_id") % 3 == 0)
        .select(F.col("fp").alias("sfp"))
        .distinct()
    )
    newc = fp.filter(F.col("doc_id") % 3 != 0)
    seen = F.col("sfp").isNotNull()
    return (
        newc.join(snap, newc["fp"] == snap["sfp"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.when(~seen, 1).otherwise(0)).cast("long").alias("n_novel"),
            F.sum(F.when(seen, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_vs_snapshot"),
        )
        .orderBy("source")
    )


@register(
    "docs_dedup_canonical",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp,
        len({_TOKS}) AS n_toks,
        len(list_distinct({_TOKS})) AS n_uniq,
        (length(lower(text)) - length(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g')))
          / greatest(length(lower(text)), 1) AS punct
      FROM documents
    ),
    q AS (
      SELECT doc_id, fp,
        round((CASE WHEN n_toks BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END) * 0.4
              + (1.0 - punct) * 0.3
              + (n_uniq / greatest(n_toks, 1)) * 0.3, 6) AS quality
      FROM t
    ),
    sized AS (
      SELECT fp, count(*) AS n_members FROM q GROUP BY fp
      HAVING count(*) >= 2
    ),
    ranked AS (
      SELECT q.fp, q.doc_id, q.quality,
        row_number() OVER (PARTITION BY q.fp
          ORDER BY q.quality DESC, q.doc_id) AS rk
      FROM q JOIN sized ON q.fp = sized.fp
    )
    SELECT s.fp, CAST(s.n_members AS BIGINT) AS n_members,
           r.doc_id AS canonical_doc_id, r.quality AS canonical_quality
    FROM sized s JOIN ranked r ON r.fp = s.fp AND r.rk = 1
    ORDER BY s.fp
    """,
    doc="Near-dup cluster canonicalization — detection to SELECTION: "
    "every fingerprint cluster of size >= 2 keeps its best-quality "
    "member (deterministic ties by doc_id), completing the dedup "
    "story: dedup_keep_first_normalized picks the OLDEST member, this "
    "entry picks the BEST by the catalog's quality score — the policy "
    "that retains the cleanest copy of syndicated content. Shapes: "
    "one hash-agg for cluster sizes, one fp-partitioned window for "
    "the rank (both key on the fingerprint, so the exchange is "
    "shared), one equi-join back.",
)
def docs_dedup_canonical(spark: SparkSession, sf: str) -> DataFrame:
    q = table(spark, sf, "documents").select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    sized = (
        q.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    w = Window.partitionBy("fp").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    ranked = (
        q.join(sized.select("fp"), "fp")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return (
        sized.join(ranked, "fp")
        .select(
            "fp",
            "n_members",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("quality").alias("canonical_quality"),
        )
        .orderBy("fp")
    )


@register(
    "docs_boilerplate_strip",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
    x AS (
      SELECT doc_id, n,
        CASE WHEN doc_id % 4 <> 3
          THEN list_concat(
            list_transform(range(0, (n + 5) // 6), j ->
              array_to_string(list_slice(toks, j*6 + 1, j*6 + 6), ' ')),
            ['copyright footer line ' || (doc_id % 3)])
          ELSE list_transform(range(0, (n + 5) // 6), j ->
            array_to_string(list_slice(toks, j*6 + 1, j*6 + 6), ' '))
        END AS lines
      FROM b
    ),
    e AS (
      SELECT doc_id, n, unnest(lines) AS line,
             generate_subscripts(lines, 1) AS pos
      FROM x
    ),
    h AS (SELECT doc_id, n, pos, line, {_H.format(v="line")} AS lh FROM e),
    df AS (
      SELECT lh, count(*) AS df
      FROM (SELECT DISTINCT lh, doc_id FROM h) GROUP BY lh
    ),
    kept AS (
      SELECT h.doc_id, h.n, h.pos, h.line
      FROM h JOIN df ON h.lh = df.lh WHERE df.df < 5
    ),
    rec AS (
      SELECT doc_id, max(n) AS n_before,
        array_to_string(list(line ORDER BY pos), ' ') AS text2
      FROM kept GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_before AS BIGINT) AS n_toks_before,
      CAST(len(list_filter(regexp_split_to_array(lower(trim(text2)),
        '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_toks_after,
      md5(text2) AS text_fp
    FROM rec ORDER BY doc_id
    """,
    doc="Span-level boilerplate REMOVAL with text reconstruction — the "
    "destructive counterpart of docs_boilerplate_lines: boilerplate "
    "lines (hash document-frequency >= 5 over the same lined corpus + "
    "injected footers) are dropped and the document is REBUILT from "
    "its kept lines in original position order (order carried "
    "explicitly: collect -> sort by position -> join; a bare "
    "collect_list would be partitioning-dependent). n_toks_after "
    "re-tokenizes the reconstructed text, pinning the conservation "
    "law n_toks_after == n_toks_before - 6*(removed full lines) - "
    "(removed footer/short-line tokens); text_fp hashes the actual "
    "rebuilt string so the oracle certifies bytes, not counts. Same "
    "posting-list shape as the detector plus one position-sorted "
    "reassembly aggregation.",
)
def docs_boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    b = _docs_tokens(spark, sf)
    toks, doc_id = F.col("toks"), F.col("doc_id")
    base_lines = F.transform(
        F.sequence(
            F.lit(0).cast("long"),
            F.floor((F.col("n") + F.lit(5)) / 6).cast("long") - 1,
        ),
        lambda j: F.concat_ws(" ", F.slice(toks, (j * 6 + 1).cast("int"), 6)),
    )
    footer = F.concat(
        F.lit("copyright footer line "), (doc_id % 3).cast("string")
    )
    lines = F.when(
        doc_id % 4 != 3, F.concat(base_lines, F.array(footer))
    ).otherwise(base_lines)
    e = b.select(
        "doc_id", "n", F.posexplode(lines).alias("pos0", "line")
    ).select(
        "doc_id",
        "n",
        (F.col("pos0") + 1).alias("pos"),
        "line",
        T.portable_hash64(F.col("line")).alias("lh"),
    )
    df = (
        e.select("lh", "doc_id")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    kept = e.join(df, "lh").filter(F.col("df") < 5)
    rec = kept.groupBy("doc_id").agg(
        F.max("n").alias("n_before"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda x: x["line"],
            ),
        ).alias("text2"),
    )
    return rec.select(
        "doc_id",
        F.col("n_before").cast("long").alias("n_toks_before"),
        F.size(T.tokens(F.col("text2"))).cast("long").alias("n_toks_after"),
        F.md5("text2").alias("text_fp"),
    ).orderBy("doc_id")


@register(
    "docs_token_drift",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 2 AS half, unnest({_TOKS}) AS tok FROM documents
    ),
    c AS (
      SELECT tok,
        CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      FROM tok GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS ta,
             CAST(sum(cnt_b) AS BIGINT) AS tb
      FROM c
    )
    SELECT tok, cnt_a, cnt_b,
      round(
        CAST(CAST(
          (cnt_a * CAST(ta + tb AS DOUBLE) - (cnt_a + cnt_b) * CAST(ta AS DOUBLE))
          * (cnt_a * CAST(ta + tb AS DOUBLE) - (cnt_a + cnt_b) * CAST(ta AS DOUBLE))
             / ((cnt_a + cnt_b) * CAST(ta AS DOUBLE) * (ta + tb))
             AS DECIMAL(28,12))
        + CAST(
          (cnt_b * CAST(ta + tb AS DOUBLE) - (cnt_a + cnt_b) * CAST(tb AS DOUBLE))
          * (cnt_b * CAST(ta + tb AS DOUBLE) - (cnt_a + cnt_b) * CAST(tb AS DOUBLE))
             / ((cnt_a + cnt_b) * CAST(tb AS DOUBLE) * (ta + tb))
             AS DECIMAL(28,12)) AS DOUBLE), 6) AS chi2_part
    FROM c, tot ORDER BY tok
    """,
    doc="Token-distribution drift between corpus halves (the "
    "corpus-version regression check a pipeline runs before swapping "
    "in a new crawl): per-token chi-squared contribution between the "
    "doc_id-parity halves, algebraically rearranged so the observed-"
    "minus-expected numerator is computed from INTEGER products "
    "(o*N - n*T — exact in double far past any vocab size) and each "
    "of the two per-half terms is cast DECIMAL(28,12) before the sum, "
    "keeping the rounded 6-dp output engine- and order-invariant. "
    "One explode -> hash-agg (bounded by vocabulary), one 1-row "
    "broadcast total.",
)
def docs_token_drift(spark: SparkSession, sf: str) -> DataFrame:
    tok = table(spark, sf, "documents").select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(T.tokens(F.col("text"))).alias("tok"),
    )
    c = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("cnt_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cnt_b"),
    )
    tot = c.agg(
        F.sum("cnt_a").cast("long").alias("ta"),
        F.sum("cnt_b").cast("long").alias("tb"),
    )
    a, bq = F.col("cnt_a"), F.col("cnt_b")
    ta, tb = F.col("ta"), F.col("tb")
    n_tok = a + bq
    total = (ta + tb).cast("double")

    def term(o, t):
        d = o * total - n_tok * t.cast("double")
        return ((d * d) / (n_tok * t.cast("double") * (ta + tb))).cast(
            "decimal(28,12)"
        )

    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "cnt_a",
            "cnt_b",
            F.round((term(a, ta) + term(bq, tb)).cast("double"), 6).alias(
                "chi2_part"
            ),
        )
        .orderBy("tok")
    )


@register(
    "docs_shard_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
        len({_TOKS}) AS n_toks,
        ('0x' || substr(md5('shard' || doc_id), 1, 12))::BIGINT % 16
          AS shard
      FROM documents
    )
    SELECT shard,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS n_bytes,
      CAST(sum(n_toks) AS BIGINT) AS n_toks,
      min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
      CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM t GROUP BY shard ORDER BY shard
    """,
    doc="Hash-shard write manifest (the planner table a 100 TB "
    "re-partition consults before committing a layout): documents "
    "assign to 16 shards by the portable 48-bit hash — the same "
    "stable draw as docs_hash_sample, so shard membership never "
    "moves between runs or engines — and the manifest reports "
    "per-shard document/byte/token mass, id bounds, and source "
    "spread, exactly what a writer needs to size files and detect "
    "hot shards BEFORE shuffling the corpus. One combinable keyed "
    "aggregation.",
)
def docs_shard_manifest(spark: SparkSession, sf: str) -> DataFrame:
    shard = (
        T.portable_hash64(
            F.concat(F.lit("shard"), F.col("doc_id").cast("string"))
        )
        % 16
    )
    return (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.size(T.tokens(F.col("text"))).alias("n_toks"),
            shard.alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.sum("n_toks").cast("long").alias("n_toks"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("shard")
    )


def _let(col, body):
    """Let-bind ``col`` as a lambda variable so the body's many
    references evaluate it ONCE per row.  Same binding trick as
    ``analytics_queries._ngram_array``: Catalyst inlines column aliases
    at every reference with no common-subexpression cache inside lambda
    iterations, so an unbound reference to a derived array re-runs its
    defining expression per iteration; a ``transform(array(x), t -> …)``
    binding evaluates ``x`` once and the body sees the VALUE."""
    return F.element_at(F.transform(F.array(col), body), 1)


@register(
    "docs_substring_strip",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    copies AS (
      SELECT doc_id,
        list_concat(list_slice(toks, 5, len(toks)),
                    ['zz' || doc_id]) AS toks
      FROM (SELECT doc_id + 1000000 AS doc_id, toks FROM t
            WHERE doc_id % 41 = 0 AND len(toks) >= 12)
    ),
    corp AS (
      SELECT doc_id, toks FROM t WHERE len(toks) >= 8
      UNION ALL SELECT doc_id, toks FROM copies
    ),
    e AS (
      SELECT doc_id, toks,
             unnest(range(1, len(toks) - 6)) AS pos
      FROM corp
    ),
    g AS (
      SELECT doc_id, pos, {_H.format(v="gram")} AS gh
      FROM (SELECT doc_id, pos,
              toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] || ' '
              || toks[pos+3] || ' ' || toks[pos+4] || ' ' || toks[pos+5]
              || ' ' || toks[pos+6] || ' ' || toks[pos+7] AS gram
            FROM e)
    ),
    df AS (
      SELECT gh, count(*) AS df
      FROM (SELECT DISTINCT gh, doc_id FROM g) GROUP BY gh
    ),
    dups AS (
      SELECT doc_id, list_sort(list_distinct(list(pos))) AS dups
      FROM g JOIN df USING (gh) WHERE df >= 2 GROUP BY doc_id
    ),
    j AS (
      SELECT c.doc_id, c.toks, len(c.toks) AS n,
             coalesce(d.dups, CAST([] AS BIGINT[])) AS dups
      FROM corp c LEFT JOIN dups d ON c.doc_id = d.doc_id
    ),
    m AS (
      SELECT doc_id, toks, n,
        list_transform(range(1, n - 6), i -> list_contains(dups, i)) AS dm
      FROM j
    ),
    r AS (
      SELECT doc_id, toks, n,
        list_filter(range(1, n + 1), p ->
          len(list_filter(range(greatest(1, p - 7), least(p, len(dm)) + 1),
              i -> dm[i])) = 0) AS kp
      FROM m
    )
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_toks_before,
      CAST(n - len(kp) AS BIGINT) AS n_removed,
      CAST(len(kp) AS BIGINT) AS n_toks_after,
      round(CAST(n - len(kp) AS DOUBLE) / n, 6) AS removed_frac,
      md5(coalesce(array_to_string(list_transform(kp, p -> toks[p]), ' '),
          '')) AS text_fp
    FROM r ORDER BY doc_id
    """,
    doc="Cross-document duplicated-SPAN removal with reconstruction — "
    "the production semantics docs_substring_dedup's flagging "
    "approximates: over the same suffix-copy-augmented corpus, every "
    "token-8-gram occurrence whose gram appears in >= 2 DISTINCT "
    "documents marks its 8 token positions, covered positions are "
    "dropped, and each document is rebuilt from the survivors in "
    "order. Removal is SYMMETRIC (the span leaves every document that "
    "carries it): an except-one policy would need a canonical-survivor "
    "election per gram — a second global join plus an inter-document "
    "ordering dependence — while symmetric removal is decided purely "
    "by document frequency, keeping the operator partition- and "
    "arrival-order-invariant at 100 TB. Shapes: posexplode -> "
    "distinct(gh, doc) -> df hash-agg -> one BIGINT equi-join back -> "
    "per-doc dup-position collection -> one doc_id join -> per-row "
    "coverage fold and rebuild; shuffle rows stay fixed-width (48-bit "
    "gram hashes + integer positions), nothing is all-pairs. text_fp "
    "certifies the rebuilt bytes; n_toks_after = n_toks_before - "
    "n_removed is the pinned conservation law.",
)
def docs_substring_strip(spark: SparkSession, sf: str) -> DataFrame:
    t = (
        table(spark, sf, "documents")
        .select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    copies = (
        t.filter((F.col("doc_id") % 41 == 0) & (F.col("n") >= 12))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.slice(F.col("toks"), 5, F.col("n") - 4),
                F.array(
                    F.concat(
                        F.lit("zz"), (F.col("doc_id") + 1000000).cast("string")
                    )
                ),
            ).alias("toks"),
        )
    )
    corp = t.filter(F.col("n") >= 8).select("doc_id", "toks").unionByName(
        copies
    )
    h = (
        corp.select(
            "doc_id",
            F.posexplode(_ngram_array(F.col("toks"), 8)).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            T.portable_hash64(F.col("gram")).alias("gh"),
        )
    )
    df = (
        h.select("gh", "doc_id")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    dup_pos = (
        h.join(df.filter(F.col("df") >= 2).select("gh"), "gh")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("dups"))
    )
    j = corp.join(dup_pos, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce(F.col("dups"), F.array().cast("array<long>")).alias(
            "dups"
        ),
    )

    def rebuild(toks):
        n = F.size(toks)

        def with_dups(dp):
            dm_expr = F.transform(
                F.sequence(F.lit(1), n - 7),
                lambda i: F.array_contains(dp, i),
            )

            def with_mask(dm):
                kept_expr = F.filter(
                    F.sequence(F.lit(1), n),
                    lambda p: ~F.exists(
                        F.sequence(
                            F.greatest(F.lit(1), p - 7),
                            F.least(p, F.size(dm)),
                        ),
                        lambda i: F.element_at(dm, i),
                    ),
                )

                def with_kept(kp):
                    return F.struct(
                        n.alias("n"),
                        (n - F.size(kp)).alias("n_removed"),
                        F.concat_ws(
                            " ",
                            F.transform(kp, lambda p: F.element_at(toks, p)),
                        ).alias("text2"),
                    )

                return _let(kept_expr, with_kept)

            return _let(dm_expr, with_mask)

        return _let(F.col("dups"), with_dups)

    s = j.select("doc_id", _let(F.col("toks"), rebuild).alias("s"))
    return s.select(
        "doc_id",
        F.col("s.n").cast("long").alias("n_toks_before"),
        F.col("s.n_removed").cast("long").alias("n_removed"),
        (F.col("s.n") - F.col("s.n_removed"))
        .cast("long")
        .alias("n_toks_after"),
        F.round(
            F.col("s.n_removed").cast("double") / F.col("s.n"), 6
        ).alias("removed_frac"),
        F.md5("s.text2").alias("text_fp"),
    ).orderBy("doc_id")


