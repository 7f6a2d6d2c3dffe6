"""Embedding similarity search: brute-force cosine top-k, LSH-bucketed
ANN, and IVF (inverted-file) ANN.

Brute force is the oracle-checkable baseline (exact, deterministic,
fold-order-stable dot products via ``zip_with``+``aggregate`` — all
JVM-side, no UDFs). The random-hyperplane LSH variant and the IVF
variant are the 100-TB paths: LSH joins on sign-signature buckets; IVF
partitions the corpus by nearest coarse centroid and probes only
``nprobe`` clusters per query, so neither materializes the crossJoin.
Recall is tested against brute force in pytest (no SQL oracle — the
bucketing/clustering is engine-internal).
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def _nearest_centroids(
    vectors: DataFrame, centroids: DataFrame, nprobe: int, id_name: str
) -> DataFrame:
    """Top-``nprobe`` centroids by cosine for each vector.

    The k-row centroid table broadcasts; the crossJoin is the standard
    k-means assignment shape (k× row inflation in one map stage, no
    shuffle of the vector side). Ties break by cid (deterministic).
    """
    from pyspark.sql.window import Window

    cos = _dot(F.col("_vec"), F.col("c_vec")) / (F.col("_norm") * F.col("c_norm"))
    w = Window.partitionBy(id_name).orderBy(F.col("_cc").desc(), F.col("cid"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("_cc", cos)
        .withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= nprobe)
        .drop("_cr")
    )


def ivf_train(
    corpus: DataFrame,
    num_clusters: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantizer for IVF: deterministic seeds (the ``num_clusters``
    lowest-id vectors) refined by ``lloyd_iters`` rounds of k-means.

    Each Lloyd round is one assignment stage plus a (cid, dim) hash
    aggregation — ``posexplode`` fans a d-dim vector to d rows, the avg
    is map-side combinable, and the rebuilt centroid table is k rows.
    Returns DataFrame(cid INT, c_vec ARRAY<DOUBLE>, c_norm DOUBLE).
    """
    from pyspark.sql.window import Window

    v = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("_id"), "_vec", "_norm"
    )
    seeds = (
        v.orderBy("_id")
        .limit(num_clusters)
        .withColumn(
            "cid",
            F.row_number().over(Window.orderBy("_id")).cast("int") - F.lit(1),
        )
    )
    cents = seeds.select(
        "cid", F.col("_vec").alias("c_vec"), F.col("_norm").alias("c_norm")
    )
    for _ in range(lloyd_iters):
        assigned = _nearest_centroids(v, cents, nprobe=1, id_name="_id")
        mean = (
            assigned.select("cid", F.posexplode("_vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("c_vec")
            )
        )
        cents = mean.withColumn("c_norm", F.sqrt(_dot(F.col("c_vec"), F.col("c_vec"))))
    return cents


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    num_clusters: int = 16,
    nprobe: int = 2,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted file: the corpus is clustered by
    nearest coarse centroid (the IVF index — at scale, a one-time build
    shuffled/partitioned by cid), each query probes its ``nprobe``
    nearest clusters, and exact cosine runs only within probed clusters.

    Returns (query_id, neighbor_id, cos, rank), rank 1..k, self excluded.
    """
    from pyspark.sql.window import Window

    cents = ivf_train(corpus, num_clusters, lloyd_iters, id_col, vec_col)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "_vec", "_norm"
    )
    c_idx = _nearest_centroids(c, cents, nprobe=1, id_name="neighbor_id").select(
        "cid",
        "neighbor_id",
        F.col("_vec").alias("c_vec2"),
        F.col("_norm").alias("c_norm2"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), "_vec", "_norm"
    )
    q_probe = _nearest_centroids(q, cents, nprobe=nprobe, id_name="query_id").select(
        "cid",
        "query_id",
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec2")) / (F.col("q_norm") * F.col("c_norm2")),
        6,
    )
    scored = (
        c_idx.join(F.broadcast(q_probe), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        # A neighbor can appear under several probed clusters' joins only
        # if it sits in multiple... it does not (nprobe=1 on the corpus
        # side), so no distinct is needed before ranking.
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
