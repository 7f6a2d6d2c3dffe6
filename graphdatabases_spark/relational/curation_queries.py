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


def _bpe_round_sql(r: int, carry: str = "f") -> str:
    """One unrolled BPE merge round (the k-means-unroll precedent):
    count weighted adjacent symbol pairs, pick the (count DESC, pair
    ASC) argmax, rewrite every sequence by literal replace on the
    boundary-marked pair string.  ``carry`` is the column list carried
    through the rewrite (must include ``f`` — the pair count uses it)."""
    prev = f"s{r - 1}"
    return f"""
    p{r} AS (
      SELECT pr, CAST(sum(f) AS BIGINT) AS n FROM (
        SELECT f, unnest(list_transform(range(1, len(sy)), i ->
          '|' || sy[i] || ' |' || sy[i + 1] || ' ')) AS pr
        FROM (SELECT f, regexp_extract_all(seq, '\\|([^ ]+) ', 1) AS sy
              FROM {prev})
      ) GROUP BY pr
    ),
    m{r} AS (SELECT pr, n FROM p{r} ORDER BY n DESC, pr LIMIT 1),
    s{r} AS (
      SELECT {carry}, replace(seq, (SELECT pr FROM m{r}),
        '|' || translate((SELECT pr FROM m{r}), '| ', '') || ' ') AS seq
      FROM {prev}
    )"""


_BPE_ROUNDS = 5


def _bpe_vocab(
    spark: SparkSession,
    sf: str,
    *,
    with_tok: bool = False,
    marker: bool = False,
):
    """Corpus token vocabulary with frequencies — the single corpus-sized
    aggregation everything BPE does is bounded by.  ``marker=True``
    prepends the SentencePiece-style word-boundary symbol '_' as the
    sequence's first base symbol, so merges can learn word-INITIAL
    subwords distinct from word-internal ones."""
    v = (
        table(spark, sf, "documents")
        .select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    seq0 = F.concat_ws(
        "",
        F.transform(
            F.regexp_extract_all("tok", F.lit("."), 0),
            lambda c: F.concat(F.lit("|"), c, F.lit(" ")),
        ),
    )
    if marker:
        seq0 = F.concat(F.lit("|_ "), seq0)
    cols = (["tok", "f"] if with_tok else ["f"]) + [seq0.alias("seq")]
    return v.select(*cols)


def _bpe_fit(s: DataFrame, rounds: int):
    """Run ``rounds`` unrolled BPE merge rounds over boundary-marked
    sequences ('|h |e |l |l |o ').  ``s`` needs columns ``f`` (corpus
    frequency) and ``seq``; any other columns (e.g. ``tok``) ride
    through the rewrite untouched.  Returns ``(merge_tables, final_s)``
    — one 1-row (round, merged, n) DataFrame per round, plus the fully
    rewritten sequence table (the ENCODED vocabulary)."""
    keep = [c for c in s.columns if c != "seq"]
    outs = []
    for r in range(1, rounds + 1):
        sy = F.regexp_extract_all("seq", F.lit(r"\|([^ ]+) "), 1)
        pair_arr = F.when(
            F.size(sy) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sy) - 1),
                lambda i: F.concat(
                    F.lit("|"),
                    F.element_at(sy, i),
                    F.lit(" |"),
                    F.element_at(sy, i + 1),
                    F.lit(" "),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        p = (
            s.select("f", F.explode(pair_arr).alias("pr"))
            .groupBy("pr")
            .agg(F.sum("f").cast("long").alias("n"))
        )
        m = p.orderBy(F.col("n").desc(), "pr").limit(1)
        outs.append(
            m.select(
                F.lit(r).alias("round"),
                F.translate("pr", "| ", "").alias("merged"),
                "n",
            )
        )
        s = s.crossJoin(
            F.broadcast(m.select(F.col("pr").alias("_pr")))
        ).select(
            *keep,
            F.replace(
                "seq",
                F.col("_pr"),
                F.concat(
                    F.lit("|"), F.translate("_pr", "| ", ""), F.lit(" ")
                ),
            ).alias("seq"),
        )
    return outs, s


@register(
    "docs_bpe_merges",
    oracle=f"""
    WITH v AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    s0 AS (
      SELECT f, array_to_string(list_transform(regexp_extract_all(tok, '.'),
        c -> '|' || c || ' '), '') AS seq
      FROM v
    ),{",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))}
    SELECT * FROM (
      {" UNION ALL ".join(
        f"SELECT {r} AS round, translate(pr, '| ', '') AS merged, n FROM m{r}"
        for r in range(1, _BPE_ROUNDS + 1)
      )}
    ) ORDER BY round
    """,
    doc="BPE-style vocabulary induction ON the engine (the tokenizer-"
    "training step of a data pipeline): token sequences start as "
    "boundary-marked characters ('|h |e |l |l |o '), and each of 5 "
    "merge rounds counts corpus-frequency-weighted adjacent symbol "
    "pairs, picks the (count DESC, pair ASC) argmax, and rewrites "
    "every sequence via literal string replacement — the '|sym ' "
    "framing makes adjacent matches disjoint, so left-to-right "
    "replace() implements greedy BPE identically in both engines "
    "('abab' merges to '(ab)(ab)'). The merge table (round, merged "
    "symbol, pair count) is the output — exactly what a tokenizer "
    "trainer persists. Work is VOCABULARY-bounded after one corpus "
    "token aggregation: each round is a hash-agg over distinct "
    "sequences plus a 1-row argmax broadcast into the rewrite.",
)
def docs_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    outs, _ = _bpe_fit(_bpe_vocab(spark, sf), _BPE_ROUNDS)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("round")


@register(
    "docs_bpe_apply",
    oracle=f"""
    WITH v AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    s0 AS (
      SELECT tok, f, array_to_string(list_transform(regexp_extract_all(tok, '.'),
        c -> '|' || c || ' '), '') AS seq
      FROM v
    ),{",".join(_bpe_round_sql(r, carry="tok, f") for r in range(1, _BPE_ROUNDS + 1))},
    enc AS (
      SELECT tok, CAST(len(regexp_extract_all(seq, '\\|([^ ]+) ', 1)) AS BIGINT)
        AS n_sym
      FROM s{_BPE_ROUNDS}
    ),
    occ AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY source, tok
    )
    SELECT source,
      CAST(sum(cnt) AS BIGINT) AS n_toks,
      CAST(sum(cnt * length(tok)) AS BIGINT) AS n_chars,
      CAST(sum(cnt * n_sym) AS BIGINT) AS n_bpe_symbols,
      round(CAST(sum(cnt * length(tok)) AS DOUBLE) / sum(cnt * n_sym), 6)
        AS compression_ratio,
      round(CAST(sum(cnt * n_sym) AS DOUBLE) / sum(cnt), 6)
        AS avg_symbols_per_token
    FROM occ JOIN enc USING (tok)
    GROUP BY source ORDER BY source
    """,
    doc="BPE APPLICATION — encode the corpus with the merge table "
    "docs_bpe_merges induces, proving the induction output is USABLE: "
    "the same 5 unrolled merge rounds rewrite the boundary-marked "
    "vocabulary sequences (tok carried through the rewrite), the "
    "encoded vocabulary maps each token to its post-merge symbol "
    "count, and one join against per-(source, token) occurrence "
    "counts rolls up per-source whitespace-token / character / "
    "BPE-symbol totals, chars-per-symbol compression, and mean "
    "symbols per token — the tokenizer-budget table a data pipeline "
    "publishes per source. All ratios divide EXACT BIGINT sums, so "
    "6-dp rounding is engine- and partitioning-invariant. Work stays "
    "vocabulary-bounded after one corpus token aggregation; the "
    "encoded vocab joins occurrence counts on the token key (AQE "
    "broadcasts the vocab side at any realistic vocabulary size).",
)
def docs_bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    _, s_final = _bpe_fit(
        _bpe_vocab(spark, sf, with_tok=True), _BPE_ROUNDS
    )
    enc = s_final.select(
        "tok",
        F.size(F.regexp_extract_all("seq", F.lit(r"\|([^ ]+) "), 1))
        .cast("long")
        .alias("n_sym"),
    )
    occ = (
        table(spark, sf, "documents")
        .select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        occ.join(enc, "tok")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_toks"),
            F.sum(F.col("cnt") * F.length("tok"))
            .cast("long")
            .alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_sym"))
            .cast("long")
            .alias("n_bpe_symbols"),
        )
        .select(
            "source",
            "n_toks",
            "n_chars",
            "n_bpe_symbols",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_bpe_symbols"), 6
            ).alias("compression_ratio"),
            F.round(
                F.col("n_bpe_symbols").cast("double") / F.col("n_toks"), 6
            ).alias("avg_symbols_per_token"),
        )
        .orderBy("source")
    )


@register(
    "docs_bpe_fertility",
    oracle=f"""
    WITH v AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    s0 AS (
      SELECT tok, f, array_to_string(list_transform(regexp_extract_all(tok, '.'),
        c -> '|' || c || ' '), '') AS seq
      FROM v
    ),{",".join(_bpe_round_sql(r, carry="tok, f") for r in range(1, _BPE_ROUNDS + 1))},
    enc AS (
      SELECT tok, CAST(len(regexp_extract_all(seq, '\\|([^ ]+) ', 1)) AS BIGINT)
        AS n_sym
      FROM s{_BPE_ROUNDS}
    ),
    occ AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT lang, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY lang, tok
    ),
    per AS (
      SELECT lang,
        CAST(sum(cnt) AS BIGINT) AS n_toks,
        CAST(sum(cnt * n_sym) AS BIGINT) AS n_bpe_symbols
      FROM occ JOIN enc USING (tok) GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_toks) AS BIGINT) AS tt,
             CAST(sum(n_bpe_symbols) AS BIGINT) AS ts
      FROM per
    )
    SELECT lang, n_toks, n_bpe_symbols,
      round(CAST(n_bpe_symbols AS DOUBLE) / n_toks, 6) AS fertility,
      round((CAST(n_bpe_symbols AS DOUBLE) / n_toks)
            / (CAST(ts AS DOUBLE) / tt), 6) AS fertility_ratio
    FROM per, tot ORDER BY lang
    """,
    doc="Per-LANGUAGE BPE fertility — the tokenizer-fairness table "
    "multilingual pipelines publish (how many subword symbols each "
    "language pays per whitespace token under a tokenizer trained on "
    "the MIXED corpus, cf. the 'tokenizer premium' analyses of "
    "multilingual BPE): the same 5 corpus-wide unrolled merge rounds "
    "as docs_bpe_merges encode the vocabulary, one join against "
    "per-(lang, token) occurrence counts rolls up each language "
    "stratum, and a 1-row corpus-totals broadcast normalizes into "
    "fertility_ratio = lang fertility / corpus mean fertility (> 1 = "
    "the language is tokenized less efficiently than the corpus "
    "average — the fairness signal that drives per-language vocab "
    "budgets). Generalizes docs_bpe_apply's per-source rollup along "
    "the fairness axis. Every rendered number divides EXACT BIGINT "
    "sums (fertility and ratio are each one or two IEEE divisions of "
    "exact operands), so 6-dp rounding is engine- and partitioning-"
    "invariant. Work stays vocabulary-bounded after one corpus token "
    "aggregation; the per-lang rollup output is |langs| rows and its "
    "totals normalizer is a 1-row broadcast (allowlisted).",
)
def docs_bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    _, s_final = _bpe_fit(
        _bpe_vocab(spark, sf, with_tok=True), _BPE_ROUNDS
    )
    enc = s_final.select(
        "tok",
        F.size(F.regexp_extract_all("seq", F.lit(r"\|([^ ]+) "), 1))
        .cast("long")
        .alias("n_sym"),
    )
    occ = (
        table(spark, sf, "documents")
        .select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    per = (
        occ.join(enc, "tok")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_toks"),
            F.sum(F.col("cnt") * F.col("n_sym"))
            .cast("long")
            .alias("n_bpe_symbols"),
        )
    )
    tot = per.agg(
        F.sum("n_toks").cast("long").alias("tt"),
        F.sum("n_bpe_symbols").cast("long").alias("ts"),
    )
    fert = F.col("n_bpe_symbols").cast("double") / F.col("n_toks")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_toks",
            "n_bpe_symbols",
            F.round(fert, 6).alias("fertility"),
            F.round(
                fert / (F.col("ts").cast("double") / F.col("tt")), 6
            ).alias("fertility_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "docs_bpe_subword",
    oracle=f"""
    WITH v AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok
    ),
    s0 AS (
      SELECT f, '|_ ' || array_to_string(list_transform(regexp_extract_all(tok, '.'),
        c -> '|' || c || ' '), '') AS seq
      FROM v
    ),{",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))}
    SELECT * FROM (
      {" UNION ALL ".join(
        f"SELECT {r} AS round, translate(pr, '| ', '') AS merged, n,"
        f" CAST(CASE WHEN substr(translate(pr, '| ', ''), 1, 1) = '_'"
        f" THEN 1 ELSE 0 END AS BIGINT) AS is_word_initial FROM m{r}"
        for r in range(1, _BPE_ROUNDS + 1)
      )}
    ) ORDER BY round
    """,
    doc="BPE at the SUBWORD (word-boundary-aware) level — the "
    "SentencePiece/GPT-2 framing where the word boundary is itself a "
    "base symbol: every token's sequence starts with the marker '_' "
    "('|_ |h |e |l |l |o '), so the pair counter sees (marker, "
    "first-char) pairs weighted by whole word-onset frequency and the "
    "learned merges distinguish word-INITIAL subwords ('_t' = 't at "
    "the start of a word') from word-internal ones — exactly why "
    "production tokenizers encode the boundary in the alphabet "
    "instead of pre-splitting on whitespace. Same 5 unrolled "
    "(count DESC, pair ASC)-argmax merge rounds and disjoint-match "
    "literal rewrite as docs_bpe_merges; the merge table adds "
    "is_word_initial. The marker is only ever a sequence's FIRST "
    "symbol, so it can never appear mid-merge (pinned in pytest). "
    "Work stays vocabulary-bounded after one corpus token "
    "aggregation; each round is a hash-agg over distinct sequences "
    "plus a 1-row argmax broadcast into the rewrite.",
)
def docs_bpe_subword(spark: SparkSession, sf: str) -> DataFrame:
    outs, _ = _bpe_fit(
        _bpe_vocab(spark, sf, marker=True), _BPE_ROUNDS
    )
    tagged = [
        o.select(
            "round",
            "merged",
            "n",
            F.when(F.substring("merged", 1, 1) == "_", F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_word_initial"),
        )
        for o in outs
    ]
    out = tagged[0]
    for o in tagged[1:]:
        out = out.unionByName(o)
    return out.orderBy("round")


def _let(col, body):
    """Let-bind ``col`` as a lambda variable so the body's many
    references evaluate it ONCE per row.  Same binding trick as
    ``analytics_queries._ngram_array``: Catalyst inlines column aliases
    at every reference with no common-subexpression cache inside lambda
    iterations, so an unbound reference to a derived array re-runs its
    defining expression per iteration; a ``transform(array(x), t -> …)``
    binding evaluates ``x`` once and the body sees the VALUE."""
    return F.element_at(F.transform(F.array(col), body), 1)


_IK = 4  # intra-document dedup gram length


@register(
    "docs_intradoc_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    a AS (
      SELECT doc_id,
        CASE WHEN doc_id % 6 = 0 AND len(toks) >= 10
             THEN list_concat(toks, list_slice(toks, 3, 10))
             ELSE toks END AS toks
      FROM t
    ),
    b AS (SELECT doc_id, toks, len(toks) AS n FROM a WHERE len(toks) >= 4),
    g AS (
      SELECT doc_id, toks, n,
        list_transform(range(1, n - 2), i ->
          toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
          || toks[i+3]) AS grams
      FROM b
    ),
    d AS (
      SELECT doc_id, toks, n,
        list_transform(range(1, len(grams) + 1), i ->
          list_position(grams, grams[i]) < i) AS dup
      FROM g
    ),
    r AS (
      SELECT doc_id, toks, n,
        list_filter(range(1, n + 1), p ->
          len(list_filter(range(greatest(1, p - 3), least(p, len(dup)) + 1),
              i -> dup[i])) = 0) AS kp
      FROM d
    )
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_toks_before,
      CAST(n - len(kp) AS BIGINT) AS n_removed,
      CAST(len(kp) AS BIGINT) AS n_toks_after,
      round(CAST(n - len(kp) AS DOUBLE) / n, 6) AS removed_frac,
      md5(array_to_string(list_transform(kp, p -> toks[p]), ' ')) AS text_fp
    FROM r ORDER BY doc_id
    """,
    doc="Within-document repeated-n-gram REMOVAL with text "
    "reconstruction (the Lee-et-al self-repetition scrub, intra-doc "
    "counterpart of docs_substring_dedup): 1/6 of documents get their "
    "tokens 3..10 re-appended (the deterministic stand-in for real "
    "self-repetition), then every token 4-gram occurrence whose gram "
    "already occurred EARLIER in the same document marks its 4 token "
    "positions for removal, and the document is rebuilt from the "
    "surviving positions in order — first occurrences always survive, "
    "so the injected tail (and any natural repeat) is scrubbed while "
    "the original text is untouched. text_fp hashes the rebuilt "
    "string; n_toks_after = n_toks_before - n_removed is the pinned "
    "conservation law. Everything is a per-row higher-order fold "
    "(first-occurrence via array_position, coverage via a windowed "
    "exists) — ZERO shuffles, embarrassingly parallel at 100 TB; "
    "per-row cost is O(L²) gram compares with L bounded by upstream "
    "chunking. Derived arrays are let-bound (_let) so Catalyst's "
    "alias inlining cannot re-run the tokenizer per lambda iteration.",
)
def docs_intradoc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    doc_id = F.col("doc_id")
    t = table(spark, sf, "documents").select(
        "doc_id", T.tokens(F.col("text")).alias("toks0")
    )
    aug = t.select(
        "doc_id",
        _let(
            F.col("toks0"),
            lambda tk: F.when(
                (doc_id % 6 == 0) & (F.size(tk) >= 10),
                F.concat(tk, F.slice(tk, 3, 8)),
            ).otherwise(tk),
        ).alias("toks"),
    )
    b = aug.filter(F.size("toks") >= _IK)

    def scrub(toks):
        n = F.size(toks)
        grams_expr = F.transform(
            F.sequence(F.lit(1), n - (_IK - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(_IK)]
            ),
        )

        def with_grams(grams):
            dup_expr = F.transform(
                F.sequence(F.lit(1), F.size(grams)),
                lambda i: F.array_position(grams, F.element_at(grams, i)) < i,
            )

            def with_dup(dup):
                kept_expr = F.filter(
                    F.sequence(F.lit(1), n),
                    lambda p: ~F.exists(
                        F.sequence(
                            F.greatest(F.lit(1), p - (_IK - 1)),
                            F.least(p, F.size(dup)),
                        ),
                        lambda i: F.element_at(dup, i),
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

            return _let(dup_expr, with_dup)

        return _let(grams_expr, with_grams)

    s = b.select("doc_id", _let(F.col("toks"), scrub).alias("s"))
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


@register(
    "docs_mixture_grid",
    oracle=f"""
    WITH per AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    ),
    src AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_src
      FROM per GROUP BY source
    ),
    zs AS (
      SELECT CAST(sum(CAST(sqrt(t_src::DOUBLE) AS DECIMAL(28,15)))
                  AS DOUBLE) AS z FROM src
    ),
    zl AS (
      SELECT source, CAST(sum(CAST(sqrt(n_tokens::DOUBLE)
                  AS DECIMAL(28,15))) AS DOUBLE) AS zl
      FROM per GROUP BY source
    )
    SELECT p.source, p.lang, p.n_docs, p.n_tokens,
      round(sqrt(t_src::DOUBLE) / z, 6) AS w_source,
      round(sqrt(n_tokens::DOUBLE) / zl, 6) AS w_lang_within,
      round((sqrt(t_src::DOUBLE) / z) * (sqrt(n_tokens::DOUBLE) / zl), 6)
        AS w_joint
    FROM per p
    JOIN src USING (source) JOIN zl USING (source) CROSS JOIN zs
    ORDER BY p.source, p.lang
    """,
    doc="Hierarchical (two-level) temperature mixture — the sampling "
    "grid a multi-source multilingual run actually trains from: "
    "source weights w_s = sqrt(t_s)/Σ sqrt(t_s') across sources, lang "
    "weights within each source w_l|s = sqrt(t_sl)/Σ_l' sqrt(t_sl'), "
    "and the joint cell weight w_s * w_l|s. Generalizes "
    "docs_mixture_weights: both normalizers sum the per-cell sqrts as "
    "DECIMAL(28,15) (order-free), sqrt is IEEE-correctly-rounded, and "
    "the two broadcasts are a 1-row global scalar and a 20-row "
    "per-source frame — three tiny aggregations over one combinable "
    "corpus scan, any scale.",
)
def docs_mixture_grid(spark: SparkSession, sf: str) -> DataFrame:
    toks = T.tokens(F.col("text"))
    per = (
        table(spark, sf, "documents")
        .select("source", "lang", F.size(toks).alias("n_toks"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    src = per.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("t_src")
    )
    sq_src = F.sqrt(F.col("t_src").cast("double"))
    zs = src.agg(
        F.sum(sq_src.cast("decimal(28,15)")).cast("double").alias("z")
    )
    sq_cell = F.sqrt(F.col("n_tokens").cast("double"))
    zl = per.groupBy("source").agg(
        F.sum(sq_cell.cast("decimal(28,15)")).cast("double").alias("zl")
    )
    w_source = sq_src / F.col("z")
    w_within = sq_cell / F.col("zl")
    return (
        per.join(src, "source")
        .join(zl, "source")
        .crossJoin(F.broadcast(zs))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(w_source, 6).alias("w_source"),
            F.round(w_within, 6).alias("w_lang_within"),
            F.round(w_source * w_within, 6).alias("w_joint"),
        )
        .orderBy("source", "lang")
    )


@register(
    "docs_substring_spans",
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
      SELECT c.doc_id, c.toks, len(c.toks) AS n, d.dups
      FROM corp c JOIN dups d ON c.doc_id = d.doc_id
    ),
    m AS (
      SELECT doc_id, toks, n,
        list_transform(range(1, n - 6), i -> list_contains(dups, i)) AS dm
      FROM j
    ),
    r AS (
      SELECT doc_id, toks, n,
        list_transform(range(1, n + 1), p ->
          len(list_filter(range(greatest(1, p - 7), least(p, len(dm)) + 1),
              i -> dm[i])) > 0) AS rm
      FROM m
    ),
    sp AS (
      SELECT doc_id, toks,
        list_filter(range(1, n + 1),
          p -> rm[p] AND (p = 1 OR NOT rm[p - 1])) AS starts,
        list_filter(range(1, n + 1),
          p -> rm[p] AND (p = n OR NOT rm[p + 1])) AS ends
      FROM r
    ),
    x AS (
      SELECT doc_id, toks,
        unnest(list_transform(range(1, len(starts) + 1), ix ->
          {{'s': starts[ix], 'l': ends[ix] - starts[ix] + 1}})) AS u
      FROM sp
    )
    SELECT doc_id,
      CAST(u.s AS BIGINT) AS span_start,
      CAST(u.l AS BIGINT) AS span_len,
      md5(array_to_string(list_slice(toks, u.s, u.s + u.l - 1), ' '))
        AS span_fp
    FROM x ORDER BY doc_id, span_start
    """,
    doc="Duplicated-span LOCATIONS — the provenance table behind "
    "docs_substring_strip (a production dedup audit must record WHAT "
    "was removed and WHERE, not just counts): the same df>=2 posting "
    "list marks covered token positions, maximal removed runs become "
    "(span_start, span_len) rows, and span_fp hashes the actual "
    "removed token slice so downstream tooling can group identical "
    "boilerplate spans across documents. Conservation law (pinned in "
    "tests): per doc, sum(span_len) == docs_substring_strip.n_removed "
    "and spans are disjoint, ordered, in-bounds. Same bounded "
    "posting-list shapes as the strip entry; the run extraction is a "
    "per-row fold (edge-detection filters over the coverage mask).",
)
def docs_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
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
    j = corp.join(dup_pos, "doc_id")

    def spans(toks):
        n = F.size(toks)

        def with_dups(dp):
            dm_expr = F.transform(
                F.sequence(F.lit(1), n - 7),
                lambda i: F.array_contains(dp, i),
            )

            def with_mask(dm):
                rm_expr = F.transform(
                    F.sequence(F.lit(1), n),
                    lambda p: F.exists(
                        F.sequence(
                            F.greatest(F.lit(1), p - 7),
                            F.least(p, F.size(dm)),
                        ),
                        lambda i: F.element_at(dm, i),
                    ),
                )

                def with_rm(rm):
                    at = lambda p: F.element_at(rm, p)  # noqa: E731
                    starts = F.filter(
                        F.sequence(F.lit(1), n),
                        lambda p: at(p)
                        & ((p == 1) | ~at(F.greatest(p - 1, F.lit(1)))),
                    )
                    ends = F.filter(
                        F.sequence(F.lit(1), n),
                        lambda p: at(p)
                        & ((p == n) | ~at(F.least(p + 1, n))),
                    )

                    def with_bounds(se):
                        return F.transform(
                            F.sequence(F.lit(1), F.size(se["s"])),
                            lambda ix: F.struct(
                                F.element_at(se["s"], ix).alias("s"),
                                (
                                    F.element_at(se["e"], ix)
                                    - F.element_at(se["s"], ix)
                                    + 1
                                ).alias("l"),
                            ),
                        )

                    return _let(
                        F.struct(starts.alias("s"), ends.alias("e")),
                        with_bounds,
                    )

                return _let(rm_expr, with_rm)

            return _let(dm_expr, with_mask)

        return _let(F.col("dups"), with_dups)

    x = j.select(
        "doc_id", "toks", F.explode(_let(F.col("toks"), spans)).alias("u")
    )
    return x.select(
        "doc_id",
        F.col("u.s").cast("long").alias("span_start"),
        F.col("u.l").cast("long").alias("span_len"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("u.s"), F.col("u.l"))
            )
        ).alias("span_fp"),
    ).orderBy("doc_id", "span_start")


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
