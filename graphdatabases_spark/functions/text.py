"""Text-analysis primitives for the LLM-data-pipeline surface.

All expressions are built-in ``pyspark.sql.functions`` compositions —
JVM-side, whole-stage-codegen'd, no Python UDFs in the hot path — and
each has an exactly-equivalent DuckDB SQL form (llm_queries.py), keyed on
a portable 48-bit hash both engines compute identically:

    H(s) = int(md5(s)[:12], 16)
    Spark:  conv(substring(md5(s), 1, 12), 16, 10) :: bigint
    DuckDB: ('0x' || substr(md5(s), 1, 12)) :: BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (deterministic, no external models).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "para"],
}


def portable_hash64(col: Column) -> Column:
    """48-bit deterministic hash identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def tokens(text: Column) -> Column:
    """Lowercased word tokens, empty strings dropped (BPE-ish regex split)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), TOKEN_SPLIT_RE), lambda x: x != ""
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def whitespace_token_count(text: Column) -> Column:
    """Plain whitespace token count — the cheap LLM-pipeline heuristic
    (≈ words; multiply by ~1.3 for a BPE token estimate). Unlike
    ``tokens``, punctuation stays attached to words."""
    return F.size(
        F.filter(F.split(F.trim(text), "\\s+"), lambda x: x != "")
    )


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct token
    set — the classic key-collapse fingerprint for near-dup grouping
    (token-order- and repetition-insensitive)."""
    return F.md5(F.array_join(F.sort_array(F.array_distinct(tokens(text))), " "))


def punct_ratio(text: Column) -> Column:
    """Share of characters that are not [a-z0-9 ] after lowering."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    return (F.length(lowered) - F.length(stripped)) / F.greatest(
        F.length(lowered), F.lit(1)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic 0..1 quality heuristic: length band + low punctuation
    + vocabulary diversity (unique/total tokens)."""
    n_tok = token_count(text)
    diversity = F.size(distinct_tokens(text)) / F.greatest(n_tok, F.lit(1))
    length_ok = F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0)).otherwise(0.5)
    return F.round(
        length_ok * 0.4 + (1.0 - punct_ratio(text)) * 0.3 + diversity * 0.3, 6
    )


def language_guess(text: Column) -> Column:
    """Stopword-vote language ID; ties/no-hits → 'und' (undetermined)."""
    toks = distinct_tokens(text)
    scores = []
    for lang, words in LANG_STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias(
                    "hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    # Deterministic argmax: max hits, ties broken by lang asc via
    # struct ordering on (hits, reversed-lang) — simpler: pick max by
    # (hits, lang desc) then require hits > 0.
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    # greatest on structs orders by hits then lang (lexicographic) — ties
    # resolve to the lexicographically LARGEST lang; document + mirror in
    # the oracle. No hits at all → 'und'.
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
