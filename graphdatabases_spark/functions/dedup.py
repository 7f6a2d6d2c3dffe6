"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Designed as set-oriented dataflows that scale: every step is an
explode → hash-aggregate → equi-join pipeline (no pairwise O(n²) work
except *within LSH buckets*, which is the entire point of LSH). All
hashing uses the portable 48-bit md5-prefix hash so the DuckDB oracle
reproduces signatures bit-for-bit.

At 100 TB: the token explode is the dominant shuffle; it is keyed by
(doc, token) and combinable map-side. Band-bucket grouping shuffles
signatures (16 longs/doc). Candidate verification stays bucket-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdatabases_spark.functions.text import distinct_tokens, portable_hash64

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def exact_dedup_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: total docs, distinct contents, and
    duplicate-group count (sha2 group-by; one combinable aggregation)."""
    hashed = docs.select(F.sha2(F.col(text_col), 256).alias("h"))
    groups = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_groups"),
    )


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, tok) distinct token set per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, i, mh): MinHash family mh_i = min over tokens of
    ((2i+1)·H(tok) + 12345i + 7) mod (2^31−1).

    One wide aggregation — num_hashes conditional mins per doc — instead
    of exploding every token row ×num_hashes through the shuffle: the
    mins combine map-side, so the shuffle carries num_hashes longs per
    doc regardless of token count (the 100-TB-safe shape). The wide row
    is then unpivoted to the (doc_id, i, mh) long form.
    """
    wide = _minhash_wide(docs, num_hashes, id_col, text_col)
    stack = "stack({}, {}) as (i, mh)".format(
        num_hashes, ", ".join(f"{i}, mh{i}" for i in range(num_hashes))
    )
    return wide.selectExpr("doc_id", stack)


def _minhash_wide(
    docs: DataFrame, num_hashes: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, mh0..mh{k-1}): one row per doc, one min-agg per hash."""
    toks = doc_tokens(docs, id_col, text_col)
    hashed = toks.select("doc_id", portable_hash64(F.col("tok")).alias("h"))
    aggs = [
        F.min(
            (F.lit(2 * i + 1) * F.col("h") + F.lit(12345 * i + 7)) % MINHASH_PRIME
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH.

    Bands of ``band_size`` rows; two docs are candidates iff any band's
    signature matches exactly. Returns distinct (doc_a < doc_b) pairs.
    The pairwise join happens only within (band, signature) buckets.
    """
    # Band signatures come straight off the wide signature frame — the
    # hash index order within a band is static, so each band's string is
    # a concat of known columns (no second shuffle to regroup rows).
    wide = _minhash_wide(docs, num_hashes, id_col, text_col)
    nbands = num_hashes // band_size
    band_cols = [
        F.concat_ws(
            ",",
            *[
                F.col(f"mh{b * band_size + j}").cast("string")
                for j in range(band_size)
            ],
        ).alias(f"band{b}")
        for b in range(nbands)
    ]
    stack = "stack({}, {}) as (band, sig)".format(
        nbands, ", ".join(f"{b}, band{b}" for b in range(nbands))
    )
    bands = wide.select("doc_id", *band_cols).selectExpr("doc_id", stack)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("band"), F.col("sig")
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("sig").alias("sig_b")
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig") == F.col("sig_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): sign-aggregated token-hash fingerprint.

    bit b of the fingerprint is 1 iff Σ_{tok} (±1 by bit b of H(tok)) > 0.
    Hamming-close simhashes ⇒ similar token sets.

    Same wide-aggregation shape as ``minhash_signatures``: ``bits``
    conditional sums per doc (map-side combinable) replace a ×bits row
    explode; the fingerprint is then folded in a single projection.
    """
    toks = doc_tokens(docs, id_col, text_col)
    hashed = toks.select("doc_id", portable_hash64(F.col("tok")).alias("h"))

    def bit_sign(b: int):
        is_set = (F.shiftright(F.col("h"), b).cast("bigint") % 2) == 1
        return F.when(is_set, 1).otherwise(-1)

    wide = hashed.groupBy("doc_id").agg(
        *[F.sum(bit_sign(b)).alias(f"t{b}") for b in range(bits)]
    )
    fingerprint = sum(
        F.when(F.col(f"t{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        for b in range(bits)
    )
    return wide.select("doc_id", fingerprint.alias("simhash"))


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
) -> DataFrame:
    """Token-set Jaccard similarity pairs ≥ threshold.

    Inverted-index join: explode distinct tokens, self-join on token
    (optionally also on a cheap blocking column), count common tokens,
    then |A∪B| = |A|+|B|−common. The token join is the scalable form of
    pairwise Jaccard — no crossJoin.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    sizes = base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = base.select(F.col("doc_id").alias("doc_a"), "tok", *(["blk"] if block_col else []))
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tok").alias("tok_b"),
        *([F.col("blk").alias("blk_b")] if block_col else []),
    )
    cond = (F.col("tok") == F.col("tok_b")) & (F.col("doc_a") < F.col("doc_b"))
    if block_col:
        cond = cond & (F.col("blk") == F.col("blk_b"))
    common = (
        a.join(b, cond)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)
