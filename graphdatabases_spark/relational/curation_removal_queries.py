"""Training-data curation: tokenizer induction and duplicate REMOVAL.

Split out of ``curation_queries`` (round-8 pure-move refactor — same
entries, same oracles, registry unchanged): the BPE family
(merge induction, apply, fertility, subword framing), intra-document
repeated-4-gram removal, the mixture grid, and cross-document
duplicated-span extraction.  Determinism/scale discipline is
curation_queries.py's — see that module's docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.operators.quantile import quantile_cont_vden
from graphdatabases_spark.relational.analytics_queries import _ngram_array
from graphdatabases_spark.relational.catalog import register, table
from graphdatabases_spark.relational.curation_queries import _H, _let
from graphdatabases_spark.relational.llm_queries import TOKS as _TOKS


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



# ---------------------------------------------------------------------------
# Adaptive length-outlier trimming by exact per-language quantiles
# ---------------------------------------------------------------------------

@register(
    "docs_length_quantile_trim",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, lang,
             CAST(len({_TOKS.replace("trim(text)", "trim(coalesce(text, ''))")})
                  AS BIGINT) AS n_tok
      FROM documents
    ),
    n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
    r AS MATERIALIZED (
      SELECT lang, n_tok AS v,
             row_number() OVER (PARTITION BY lang ORDER BY n_tok) AS rn
      FROM t
    ),
    q(q_label, num) AS (VALUES ('p05', 1), ('p95', 19)),
    tq AS (
      SELECT n.lang, q.q_label,
             ((n.n - 1) * q.num) // 20 + 1 AS lo,
             ((n.n - 1) * q.num) % 20 AS rem
      FROM n CROSS JOIN q
    ),
    bq AS (
      SELECT tq.lang, tq.q_label,
             20 * rlo.v + tq.rem * (coalesce(rhi.v, rlo.v) - rlo.v)
               AS vden
      FROM tq
      JOIN r rlo ON rlo.lang = tq.lang AND rlo.rn = tq.lo
      LEFT JOIN r rhi ON rhi.lang = tq.lang AND rhi.rn = tq.lo + 1
                     AND tq.rem > 0
    ),
    b AS (
      SELECT lang,
             max(CASE WHEN q_label = 'p05' THEN vden END) AS v05,
             max(CASE WHEN q_label = 'p95' THEN vden END) AS v95
      FROM bq GROUP BY lang
    )
    SELECT t.lang,
      CAST(count(*) AS BIGINT) AS n_docs,
      round(CAST(min(b.v05) AS DOUBLE) / 20, 2) AS p05_tok,
      round(CAST(min(b.v95) AS DOUBLE) / 20, 2) AS p95_tok,
      CAST(sum(CASE WHEN 20 * t.n_tok < b.v05 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_below,
      CAST(sum(CASE WHEN 20 * t.n_tok > b.v95 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_above,
      CAST(sum(CASE WHEN 20 * t.n_tok >= b.v05
                     AND 20 * t.n_tok <= b.v95 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_kept
    FROM t JOIN b USING (lang)
    GROUP BY t.lang
    ORDER BY t.lang
    """,
    doc="ADAPTIVE length-outlier trimming — per-language exact "
    "p05/p95 token-count fences with kept/trimmed tallies, the "
    "quantile-based cousin of the fixed-threshold C4/Gopher filters "
    "(fixed thresholds go stale as a corpus mix shifts; per-language "
    "fences track each language's own length distribution, the "
    "standard pretraining-data trim). Boundaries come from the shared "
    "two-pass histogram-refinement kernel (operators/quantile.py, the "
    "round-10 exact-percentile-hazard replacement) and are carried as "
    "the exact rational vden/20 (type-7 quantile_cont at 1/20 and "
    "19/20, all-integer rank arithmetic); membership compares "
    "20·n_tok against vden — zero floats until the two display "
    "roundings. The oracle computes the same rationals by brute "
    "row_number sort. Scale shape: one tokenizer projection + the "
    "kernel's combinable bucket histogram (bounded by "
    "max_tokens/width, independent of corpus size) + a broadcast "
    "|langs|×2 fence join back onto the token counts — no global "
    "sort, no per-group value->count percentile buffer.",
)
def docs_length_quantile_trim(spark: SparkSession, sf: str) -> DataFrame:
    # coalesce NULL text to '' BEFORE tokenizing: size(NULL) yields
    # -1/NULL (violating the kernel's nonnegative-v precondition, where
    # `div` truncates toward zero vs DuckDB's floor) and DuckDB's
    # len(NULL) drops the row from the rank arithmetic differently —
    # with '' both engines count the row as n_tok = 0.
    t = table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.size(T.tokens(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("n_tok"),
    )
    vals = t.select("lang", F.col("n_tok").alias("v"))
    bq = quantile_cont_vden(
        spark,
        vals,
        ["lang"],
        [("p05", 1, 20), ("p95", 19, 20)],
        bucket_width=16,
    )
    b = bq.groupBy("lang").agg(
        F.max(
            F.when(F.col("q_label") == "p05", F.col("vden"))
        ).alias("v05"),
        F.max(
            F.when(F.col("q_label") == "p95", F.col("vden"))
        ).alias("v95"),
    )
    return (
        t.join(F.broadcast(b), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.min("v05").cast("double") / 20, 2).alias("p05_tok"),
            F.round(F.min("v95").cast("double") / 20, 2).alias("p95_tok"),
            F.sum(
                F.when(20 * F.col("n_tok") < F.col("v05"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_below"),
            F.sum(
                F.when(20 * F.col("n_tok") > F.col("v95"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_above"),
            F.sum(
                F.when(
                    (20 * F.col("n_tok") >= F.col("v05"))
                    & (20 * F.col("n_tok") <= F.col("v95")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("lang")
    )
