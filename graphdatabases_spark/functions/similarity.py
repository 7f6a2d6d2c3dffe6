"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Brute force is the oracle-checkable baseline (exact, deterministic,
fold-order-stable dot products via ``zip_with``+``aggregate`` — all
JVM-side, no UDFs). The random-hyperplane LSH variant is the 100-TB
path: candidates only within matching sign-signature buckets, so the
crossJoin never materializes; recall is tested against brute force in
pytest (no SQL oracle — the bucketing is engine-internal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdatabases_spark.functions.text import portable_hash64


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_vec", v).withColumn("_norm", F.sqrt(_dot(v, v)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Broadcast the (small) query side against the corpus — at scale this
    is one pass over the corpus per batch of queries, the right shape
    for a 100-TB corpus with a bounded query batch. Ties broken by
    neighbor id (deterministic).

    Returns (query_id, neighbor_id, cos, rank), rank 1..k, self excluded.
    """
    from pyspark.sql.window import Window

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec").alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec"))
        / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def threshold_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a < b) pairs with cosine ≥ threshold (exact, for bounded n;
    the LSH variant below is the unbounded-n path)."""
    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("id"), "_vec", "_norm"
    )
    a = v.select(
        F.col("id").alias("id_a"), F.col("_vec").alias("va"), F.col("_norm").alias("na")
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("_vec").alias("vb"), F.col("_norm").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int):
    """Deterministic pseudo-random ±1 hyperplane as an array column:
    component j = sign of bit 0 of H(f'{plane_idx}:{j}')."""
    comps = []
    for j in range(dim):
        h = portable_hash64(F.lit(f"hp:{plane_idx}:{j}"))
        comps.append(F.when(h % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0)))
    return F.array(*comps)


def lsh_bucket_signature(
    vectors: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SRP) LSH signature: one sign bit per plane.

    Cosine-similar vectors agree on most sign bits, so sharing the full
    signature (or a band of it) makes a candidate bucket.
    """
    v = _as_double(F.col(vec_col))
    bits = []
    for p in range(num_planes):
        plane = _hyperplane(dim, p)
        bits.append(
            F.when(_dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            * F.lit(2**p).cast("long")
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return vectors.withColumn("bucket", sig)


def ann_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's SRP
    bucket — the scale path (bucket join instead of crossJoin)."""
    from pyspark.sql.window import Window

    qb = lsh_bucket_signature(queries, num_planes, dim, vec_col)
    cb = lsh_bucket_signature(corpus, num_planes, dim, vec_col)
    q = with_norm(qb, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("bucket"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(cb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("bucket").alias("bucket_c"),
        F.col("_vec").alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
    )
    scored = (
        c.join(F.broadcast(q), F.col("bucket") == F.col("bucket_c"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
