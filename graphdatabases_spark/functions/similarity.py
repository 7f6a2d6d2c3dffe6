"""Embedding similarity search: brute-force cosine top-k, LSH-bucketed
ANN, and IVF (inverted-file) ANN.

Brute force is the exact baseline (deterministic, fold-order-stable dot
products via ``zip_with``+``aggregate`` — all JVM-side, no UDFs). The
random-hyperplane LSH variant and the IVF variant are the 100-TB paths:
LSH joins on sign-signature buckets; IVF partitions the corpus by
nearest coarse centroid and probes only ``nprobe`` clusters per query,
so neither materializes the crossJoin. All three are value-hash-checked
against DuckDB SQL mirrors (the LSH hyperplane signs are portable
md5-derived constants inlined into the oracle; the IVF quantizer is
deterministic and replayed in SQL); recall vs brute force is
additionally gated in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixture/corpus embedding dimensionality. The Spark kernels derive the
# dim from the data at runtime; the SQL oracles cannot (the LSH
# hyperplane-sign constants and the k-means/IVF per-dimension unrolls
# are generated at import time), so every oracle builder imports THIS
# constant and tests/test_llm_ops.py pins it against the fixture — a
# fixture dim change fails loudly instead of silently desyncing the
# oracles (ADVICE r4).
EMBEDDING_DIM = 64

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


def _hyperplane_signs(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane, computed driver-side:
    component j = sign of bit 0 of the portable 48-bit md5 hash of
    f'hp:{plane_idx}:{j}' — hashlib.md5 here is bit-identical to the
    Spark/DuckDB ``portable_hash64`` expression (functions/text.py:30),
    so bucket assignments are unchanged vs the original expression
    form (pinned by the recall tests)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"hp:{plane_idx}:{j}".encode()).hexdigest()[:12], 16)
        % 2
        == 1
        else -1.0
        for j in range(dim)
    ]


def lsh_bucket_signature(
    vectors: DataFrame,
    num_planes: int = 8,
    dim: int = EMBEDDING_DIM,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SRP) LSH signature: one sign bit per plane.

    Cosine-similar vectors agree on most sign bits, so sharing the full
    signature (or a band of it) makes a candidate bucket.

    The signature is ONE expression: the plane matrix is a single
    array<array<double>> LITERAL, all ``num_planes`` dots come from one
    ``transform`` pass, and the bit-weights fold in the same
    expression — so the per-plane dot subtree exists exactly once (no
    projection-collapse duplication), query construction is a handful
    of Column calls (the per-plane form cost ~1 s of driver time per
    call just building HOF trees), and each dot folds in index order,
    keeping buckets bit-identical to the original per-plane form
    (pinned by the recall tests).
    """
    v = _as_double(F.col(vec_col))
    dots = F.transform(_plane_matrix_lit(num_planes, dim), lambda plane: _dot(v, plane))
    return vectors.withColumn("bucket", _fold_sign_bits(dots, num_planes))


def _plane_matrix_lit(num_planes: int, dim: int):
    """The SRP plane matrix as ONE parsed SQL literal expression:
    F.lit on a nested 8x64 list issues a py4j call per element
    (~170 ms of driver time per plan), the expr string parses
    JVM-side in <1 ms — same literal, pinned identical by the recall
    and oracle tests."""
    planes = [_hyperplane_signs(dim, p) for p in range(num_planes)]
    body = ",".join(
        "array(" + ",".join(f"{x:.1f}" for x in plane) + ")"
        for plane in planes
    )
    return F.expr(f"array({body})")


def _fold_sign_bits(dots, num_planes: int):
    """Fold per-plane dot signs into the bucket long, in index order —
    bit-identical to the DuckDB signed-sum mirror."""
    weights = [float(2**p) for p in range(num_planes)]
    return F.aggregate(
        F.zip_with(
            dots,
            F.lit(weights),
            lambda d, w: F.when(d >= 0, w).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("long")


def srp_band_plan(
    threshold: float,
    *,
    target_recall: float = 0.99,
    background_cos: float = 0.2,
    max_planes: int = 64,
) -> dict:
    """Compute a banded-SRP operating point (``num_bands`` ×
    ``planes_per_band``) for ``srp_band_pairs`` from the cosine
    ``threshold``, instead of hand-tuning into the measured LSH cliff
    (3-bit bands: 12.6 s where 12-bit cost 0.4 s — VERDICT r5 #8).

    The S-curve math: a random hyperplane agrees on a pair with cosine
    ``c`` with probability ``p = 1 - arccos(c)/π``; an ``r``-plane band
    collides at ``p^r`` and any of ``b`` bands at ``1-(1-p^r)^b``.  The
    plan search maximizes selectivity subject to recall: among all
    ``(r, b)`` with ``b·r ≤ max_planes`` where ``b`` is the smallest
    band count reaching ``target_recall`` at the threshold, pick the
    ``r`` minimizing the expected background collision rate
    ``b·p₀^r`` (``p₀`` from ``background_cos``, the typical unrelated-
    pair cosine — candidate volume, and therefore the size of the
    bucket self-join, is proportional to it).

    Returns ``{"num_bands", "planes_per_band", "recall",
    "background_rate"}``; feed the first two straight into
    ``srp_band_pairs``.  Raises ``ValueError`` when no plan inside
    ``max_planes`` reaches the recall target (threshold too low for
    the plane budget — raise ``max_planes`` or lower
    ``target_recall``).
    """
    import math

    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    if not -1.0 <= background_cos < threshold:
        raise ValueError(
            f"background_cos ({background_cos}) must sit below threshold "
            f"({threshold}) — it models the UNRELATED-pair cosine"
        )
    p1 = 1.0 - math.acos(threshold) / math.pi
    p0 = 1.0 - math.acos(background_cos) / math.pi
    best = None
    for r in range(1, max_planes + 1):
        pr = p1**r
        if pr <= 0.0:
            break
        b = (
            1
            if pr >= target_recall
            else math.ceil(math.log1p(-target_recall) / math.log1p(-pr))
        )
        if b * r > max_planes:
            continue
        background = b * p0**r
        # Prefer selectivity; tie-break toward wider bands (fewer
        # tables → fewer exploded rows).
        if best is None or (background, -r) < (best[0], -best[1]):
            best = (background, r, b)
    if best is None:
        raise ValueError(
            f"no (bands × planes) plan within {max_planes} planes reaches "
            f"recall {target_recall} at threshold {threshold}"
        )
    background, r, b = best
    return {
        "num_bands": b,
        "planes_per_band": r,
        "recall": 1.0 - (1.0 - p1**r) ** b,
        "background_rate": background,
    }


def srp_band_pairs(
    vectors: DataFrame,
    threshold: float = 0.99,
    num_bands: int = 4,
    planes_per_band: int = 12,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs via banded multi-table SRP-LSH.

    The dedup counterpart of ``lsh_query``: instead of one monolithic
    signature (whose all-bits-must-match collision probability
    ``(1-θ/π)^planes`` collapses recall), the plane set is split into
    ``num_bands`` independent hash tables of ``planes_per_band`` sign
    bits — two vectors are CANDIDATES iff any band's sub-signature
    matches (collision ``1-(1-p^r)^b``, the same S-curve construction
    as the banded MinHash text path, dedup.lsh_candidate_pairs).
    Candidates get an exact fold-order-stable cosine; pairs ≥ threshold
    survive.

    Band width tunes the candidate volume: at the near-dup operating
    point (cos ≥ 0.99 → per-plane agreement ≥ 0.97) a 12-bit band
    retains ~0.7 per-band collision (4-band recall ≈ 1-10⁻⁷) while a
    random pair (cos ≈ 0.2, p ≈ 0.56) collides at 0.56¹² ≈ 1e-3 —
    candidates stay ~linear in n. Narrow bands (3-4 bits) would pull
    in O(n²/2^r) of the corpus: the classic LSH mis-tuning cliff
    (measured here: 3-bit bands cost 12.6 s where 12-bit cost 0.4 s at
    the same sf).

    Scale shape: rows explode ×num_bands (bounded constant), one hash
    exchange on (band, bucket) for the self-equi-join — candidates are
    proportional to bucket collisions, never all-pairs — and one
    exchange for the pair-level distinct. No crossJoin, no windows.

    Returns distinct (id_a < id_b, cos) rows.
    """
    n_planes = num_bands * planes_per_band
    # The full n_planes-bit signature (bit p has weight 2^p, same fold
    # order as lsh_bucket_signature so buckets are bit-identical to the
    # expression form) is computed ONCE per row; band b's bucket is
    # then pure integer shift/mask arithmetic on that long.
    #
    # At 48 planes the literal-matrix-expression trick that
    # lsh_bucket_signature uses stops scaling: a CreateArray with
    # 48x64 = 3072 Literal children is re-traversed by every
    # analyzer/optimizer rule ON EVERY ACTION (measured: ~2 s plan +
    # ~2 s per execution for a 2k-row input — the tree, not the data,
    # is the cost). Shipping the matrix as DATA instead — a broadcast
    # 1-row LocalRelation joined in — leaves a tiny `transform` over a
    # column in the plan; the matrix rides in serialized ArrayData the
    # optimizer never looks inside.  (The 1-row broadcast nested-loop
    # join is the allowlisted bounded-scalar pattern.)
    planes = [_hyperplane_signs(dim, p) for p in range(n_planes)]
    weights = [float(2**p) for p in range(n_planes)]
    spark = vectors.sparkSession
    plane_rel = spark.createDataFrame(
        [(planes,)], "_planes: array<array<double>>"
    )
    v = _as_double(F.col(vec_col))
    dots = F.transform(F.col("_planes"), lambda plane: _dot(v, plane))
    sig_col = F.aggregate(
        F.zip_with(
            dots,
            F.lit(weights),
            lambda d, w: F.when(d >= 0, w).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("long")
    sig = (
        vectors.crossJoin(F.broadcast(plane_rel))
        .withColumn("bucket", sig_col)
        .drop("_planes")
    )
    mask = (1 << planes_per_band) - 1
    band_buckets = F.array(
        *[
            F.shiftright(F.col("bucket"), b * planes_per_band)
            .bitwiseAND(F.lit(mask))
            .cast("long")
            for b in range(num_bands)
        ]
    )
    base = with_norm(sig, vec_col).select(
        F.col(id_col).alias("id"),
        F.col("_vec").alias("vec"),
        F.col("_norm").alias("norm"),
        F.posexplode(band_buckets).alias("band", "bucket"),
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("band"),
        F.col("bucket"),
        F.col("vec").alias("va"),
        F.col("norm").alias("na"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
    )
    cos = F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bucket") == F.col("bucket_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("dot", _dot(F.col("va"), F.col("vb")))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def lsh_build(
    corpus: DataFrame,
    num_planes: int = 8,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-time LSH index over a static corpus: bucket signature + norm
    precomputed per vector. Same build/query amortization contract as
    ``ivf_build`` — persist the returned frame and reuse it across
    query batches; at steady state each batch pays only the bucket
    join, not a corpus-wide signature recompute."""
    cb = lsh_bucket_signature(corpus, num_planes, dim, vec_col)
    return with_norm(cb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("bucket").alias("bucket_c"),
        F.col("_vec").alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )


def lsh_query(
    index: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a prebuilt ``lsh_build`` index: exact
    cosine but only within the query's SRP bucket — the scale path
    (broadcast bucket join instead of crossJoin; the corpus never
    shuffles)."""
    from pyspark.sql.window import Window

    qb = lsh_bucket_signature(queries, num_planes, dim, vec_col)
    q = with_norm(qb, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("bucket"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
    )
    scored = (
        index.join(F.broadcast(q), F.col("bucket") == F.col("bucket_c"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_query_multiprobe(
    index: DataFrame,
    queries: DataFrame,
    k: int = 3,
    probes: int = 2,
    num_planes: int = 8,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe SRP query (Lv et al., VLDB'07): probe the home
    bucket plus ``probes - 1`` single-bit perturbations, flipping the
    planes where the query's |dot| margin is SMALLEST — the bits most
    likely to differ for a true near neighbor just across a hyperplane.
    A recall/cost operating point between one-bucket ``lsh_query``
    (cheapest, lowest recall) and brute force: candidate cost grows
    linearly in ``probes`` while no second index is built (vs adding
    plane tables or lowering num_planes, which reshapes the index).

    Deterministic and engine-exact: the flip order ranks planes by
    (round(|dot|, 6), plane index) — the rounding absorbs any cross-
    engine last-ulp drift, the index tiebreak makes the probe sequence
    a pure function of the query. Probed buckets are all distinct
    (distinct bit flips), so no candidate dedup pass is needed.
    """
    from pyspark.sql.window import Window

    if probes < 1:
        raise ValueError(f"lsh_query_multiprobe needs probes >= 1, got {probes}")
    if num_planes > 31:
        # the flip mask is built with shiftleft on a 32-bit literal; wider
        # codes would silently overflow the mask
        raise ValueError(
            f"lsh_query_multiprobe supports num_planes <= 31, got {num_planes}"
        )
    v = _as_double(F.col(vec_col))
    dots = F.transform(_plane_matrix_lit(num_planes, dim), lambda plane: _dot(v, plane))
    qd = queries.withColumn("_dots", dots).withColumn(
        "bucket", _fold_sign_bits(F.col("_dots"), num_planes)
    )
    margins = F.transform(
        F.col("_dots"),
        lambda d, i: F.struct(
            F.round(F.abs(d), 6).alias("m"), i.alias("i")
        ),
    )
    flips = F.slice(F.array_sort(margins), 1, probes - 1)
    pbuckets = F.concat(
        F.array(F.col("bucket")),
        F.transform(
            flips,
            lambda s: F.col("bucket").bitwiseXOR(
                F.call_function("shiftleft", F.lit(1), s["i"])
            ).cast("long"),
        ),
    )
    q = with_norm(qd, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.explode(pbuckets).alias("bucket"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
    )
    scored = (
        index.join(F.broadcast(q), F.col("bucket") == F.col("bucket_c"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot wrapper: ``lsh_build`` + ``lsh_query`` in a single plan
    (for amortized batches, build once and call ``lsh_query``)."""
    return lsh_query(
        lsh_build(corpus, num_planes, dim, id_col, vec_col),
        queries, k, num_planes, dim, id_col, vec_col,
    )


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

    # Ranking cosine is rounded to 6 dp (cid tie-break): raw-double
    # ranking is deterministic within one engine but an external SQL
    # mirror could differ by an ulp near centroid-boundary ties — the
    # rounding makes assignment cross-engine reproducible.
    cos = F.round(
        _dot(F.col("_vec"), F.col("c_vec")) / (F.col("_norm") * F.col("c_norm")), 6
    )
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
    # Null-id filter: Spark sorts nulls FIRST, the oracle's engine LAST.
    seeds = (
        v.filter(F.col("_id").isNotNull())
        .orderBy("_id")
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
        # Centroid mean = exact DECIMAL sum / count, cast to double:
        # a plain double avg depends on partition fold order, which
        # would make the trained centroids run- and engine-dependent;
        # the decimal sum is exact on any partitioning (same discipline
        # as the catalog's money aggregations).
        mean = (
            assigned.select("cid", F.posexplode("_vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,15)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
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


def ivf_build(
    corpus: DataFrame,
    num_clusters: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: (centroid table, cluster-assigned corpus).

    This is the ONE-TIME cost at scale — the corpus shuffles once by
    cluster id and is typically persisted/written partitioned by
    ``cid``; every subsequent query batch reuses it (the FAISS
    train+add phase, separated from search). ``ivf_ann_topk`` composes
    build+query for the self-contained catalog entry; batch-serving
    callers build once and call ``ivf_query`` per batch.
    """
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
    return cents, c_idx


def ivf_query(
    index: tuple[DataFrame, DataFrame],
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a prebuilt IVF index (from ``ivf_build``) with a query
    batch: each query ranks the ``nprobe`` nearest centroids, joins
    only those clusters' corpus rows, and exact cosine runs within
    them. Returns (query_id, neighbor_id, cos, rank), rank 1..k,
    self excluded."""
    from pyspark.sql.window import Window

    cents, c_idx = index
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
    """Approximate top-k via an inverted file — self-contained
    build+query composition (the catalog-entry surface). At scale the
    index half is a one-time build: use ``ivf_build`` + ``ivf_query``
    directly to amortize it across query batches.

    Returns (query_id, neighbor_id, cos, rank), rank 1..k, self excluded.
    """
    index = ivf_build(corpus, num_clusters, lloyd_iters, id_col, vec_col)
    return ivf_query(index, queries, k, nprobe, id_col, vec_col)


def ivf_write(index: tuple[DataFrame, DataFrame], path: str) -> None:
    """Persist an IVF index (from ``ivf_build``): the cluster-assigned
    corpus lands PARTITIONED BY ``cid`` — one directory per inverted
    list — plus the k-row centroid table. This is the serving layout
    the build/query split exists for at 100 TB: the one-time cluster
    shuffle is paid at write; every later query batch reads only its
    probed cells' directories (``ivf_query_disk``), a partition-pruned
    scan of nprobe/k of the corpus."""
    cents, c_idx = index
    c_idx.write.partitionBy("cid").mode("overwrite").parquet(
        f"{path}/corpus"
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_load(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Reopen a persisted IVF index in ``ivf_query``'s expected shape."""
    cents = spark.read.parquet(f"{path}/centroids")
    c_idx = spark.read.parquet(f"{path}/corpus")
    return cents, c_idx


def ivf_query_disk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a PERSISTED IVF index reading only the probed cells.

    The query batch's probe set is resolved first (nprobe centroid ids
    per query — a tiny collect over the broadcast centroid table), and
    the corpus scan is then filtered with a STATIC ``cid IN (...)``
    predicate, which partition-prunes the ``cid=`` directories at plan
    time — the scan's input files are exactly the probed inverted
    lists, never the whole corpus (pinned via ``inputFiles()`` in
    tests/test_llm_ops.py). Results are identical to the in-memory
    ``ivf_query`` over the same index.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), "_vec", "_norm"
    )
    q_probe = _nearest_centroids(q, cents, nprobe=nprobe, id_name="query_id").select(
        "cid",
        "query_id",
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    cells = sorted(
        r["cid"] for r in q_probe.select("cid").distinct().collect()
    )
    c_idx = spark.read.parquet(f"{path}/corpus").filter(
        F.col("cid").isin(cells)
    )
    from pyspark.sql.window import Window

    cos = F.round(
        _dot(F.col("q_vec"), F.col("c_vec2")) / (F.col("q_norm") * F.col("c_norm2")),
        6,
    )
    scored = (
        c_idx.join(F.broadcast(q_probe), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def quantize_symmetric(vec, bits: int):
    """Per-vector symmetric scalar quantization of a double array to
    signed ``bits``-bit integer levels (returned as doubles so the
    downstream dot-product fold stays on the shared exact-in-double
    integer path).

    ``q_i = floor(x_i * (2^(bits-1) - 1) / max|x|)`` — floor, not
    round, because floor is bit-identical across engines while
    round-half ties are not. The per-vector max-abs scale needs no
    corpus pass, so quantization is a pure per-row fold: at 100 TB the
    int8 corpus is built in the same single scan that wrote it, at
    bits/32 of the fp32 footprint (the memory-bandwidth lever that
    makes brute-force re-ranking affordable).
    """
    levels = float((1 << (bits - 1)) - 1)
    vmax = F.greatest(
        F.array_max(F.transform(vec, F.abs)), F.lit(1e-30)
    )
    return F.transform(
        vec, lambda x: F.floor(x * F.lit(levels) / vmax).cast("double")
    )


def ivf_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Incrementally ADD a vector batch to a persisted IVF index —
    the serving-side counterpart of ``compact_zordered_incremental``:
    the new batch is assigned to the EXISTING centroids (no
    re-clustering, no touch of resident rows) and appended as new
    files into only the receiving cells' ``cid=`` directories;
    every pre-existing file stays byte-identical (pinned in
    tests/test_llm_ops.py), so concurrent probes of untouched cells
    are never disturbed. This is the FAISS ``add``-after-``train``
    contract at 100 TB: ingest cost is one assignment pass over the
    NEW batch only, and the coarse quantizer drifts only when an
    explicit re-train rewrites the index (the full-rewrite path,
    exactly like Z-order layout evolution vs incremental compaction).

    Returns the sorted cell ids that received rows.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    c = with_norm(new_vectors, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "_vec", "_norm"
    )
    add = _nearest_centroids(c, cents, nprobe=1, id_name="neighbor_id").select(
        "cid",
        "neighbor_id",
        F.col("_vec").alias("c_vec2"),
        F.col("_norm").alias("c_norm2"),
    )
    touched = sorted(
        r["cid"] for r in add.select("cid").distinct().collect()
    )
    add.write.partitionBy("cid").mode("append").parquet(f"{path}/corpus")
    return touched


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) scoring
# ---------------------------------------------------------------------------

def _pq_subvectors(
    df: DataFrame, m: int, dim: int, id_alias: str, extra: list[str] | None = None
) -> DataFrame:
    """Fan each vector to ``m`` (j, subvector) rows via literal slices —
    the subspace decomposition every PQ stage shares.  ``df`` must carry
    ``_vec`` (from ``with_norm``/``_as_double``)."""
    d = dim // m
    sub = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("j"),
                    F.slice(F.col("_vec"), j * d + 1, d).alias("sv"),
                )
                for j in range(m)
            ]
        )
    ).alias("s")
    cols = [F.col(c) for c in (extra or [])]
    return df.select(F.col("_id").alias(id_alias), *cols, sub).select(
        id_alias, *(extra or []), F.col("s.j").alias("j"), F.col("s.sv").alias("sv")
    )


def _pq_assign(sub: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-codeword assignment per (vector, subspace): argmin
    ||sv - ce||² expressed as argmax 2·⟨sv,ce⟩ − ⟨ce,ce⟩ (the ||sv||²
    term is constant per row), rounded at 6 so the ranking is
    engine-portable, ties to the smallest cid."""
    from pyspark.sql.window import Window

    score = F.round(
        F.lit(2) * _dot(F.col("sv"), F.col("ce"))
        - _dot(F.col("ce"), F.col("ce")),
        6,
    )
    w = Window.partitionBy("j", id_col).orderBy(score.desc(), F.col("cid"))
    return (
        sub.join(F.broadcast(cents.select("j", "cid", "ce")), "j")
        .withColumn("rr", F.row_number().over(w))
        .filter(F.col("rr") == 1)
        .drop("rr", "ce")
    )


def pq_train_encode(
    corpus: DataFrame,
    m: int = 4,
    num_codes: int = 8,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Train ``m`` per-subspace codebooks and encode the corpus —
    product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search"), the memory-per-vector axis FAISS calls
    IndexPQ: each vector becomes ``m`` small codes (log2(num_codes)
    bits each) instead of ``dim`` floats.

    Training is the repo's deterministic k-means recipe per subspace
    (same as ``ivf_train``): seeds = the ``num_codes`` lowest-id
    vectors' subvectors, ONE Lloyd round with exact DECIMAL(28,15)
    centroid means (order-invariant on any partitioning, so the
    codebooks are engine-replayable in SQL).

    Scale shape: the corpus fans ×m (a bounded constant) through two
    broadcast codebook joins (seeds, then refined cents — k·m rows
    each) and one (j, cid, pos) hash agg for the means; nothing is
    ever all-pairs and the encoded corpus is m BIGINT-keyed rows per
    vector, the layout a 100-TB ADC scan wants.

    Returns (cents, codes): cents(j, cid, ce ARRAY<DOUBLE>, cn2 =
    round(⟨ce,ce⟩, 6)); codes(<id_col>, j, cid).
    """
    if dim % m != 0:
        raise ValueError(
            f"dim={dim} is not divisible by m={m}: _pq_subvectors would"
            " silently drop the trailing dim % m dimensions from"
            " training, encoding, and ADC scoring"
        )
    v = (
        with_norm(corpus, vec_col)
        .filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("_id"), "_vec")
    )
    sub = _pq_subvectors(v, m, dim, "_id")
    from pyspark.sql.window import Window

    seed_ids = (
        v.orderBy("_id")
        .limit(num_codes)
        .select(
            "_id",
            F.row_number().over(Window.orderBy("_id")).cast("int").alias("rn"),
        )
    )
    seeds = (
        sub.join(F.broadcast(seed_ids), "_id")
        .select("j", (F.col("rn") - 1).cast("int").alias("cid"), F.col("sv").alias("ce"))
    )
    a0 = _pq_assign(sub, seeds, "_id")
    mean = (
        a0.select("j", "cid", F.posexplode("sv").alias("pos", "x"))
        .groupBy("j", "cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,15)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mval")
        )
        .groupBy("j", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                lambda s: s.getField("mval"),
            ).alias("ce")
        )
    )
    cents = mean.withColumn(
        "cn2", F.round(_dot(F.col("ce"), F.col("ce")), 6)
    )
    codes = _pq_assign(sub, cents, "_id").select(
        F.col("_id").alias(id_col), "j", "cid"
    )
    return cents, codes


def pq_adc_topk(
    queries: DataFrame,
    cents: DataFrame,
    codes: DataFrame,
    m: int,
    k: int = 5,
    dim: int = EMBEDDING_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k against a PQ-encoded corpus: the query
    stays full-precision, each candidate is scored from its codes via a
    per-query lookup table — ADC.  The approximate cosine is
    ⟨q, recon(x)⟩ / (‖q‖·‖recon(x)‖) with ⟨q, recon(x)⟩ = Σⱼ ⟨qⱼ,
    ce[j, code(x,j)]⟩ and ‖recon(x)‖² = Σⱼ ⟨ce,ce⟩ — both read off the
    codebooks, never the original vectors.

    The LUT (queries × m × num_codes rows — bounded) broadcasts; the
    only corpus-side work is a broadcast join on (j, cid) over the
    m-rows-per-vector code table plus one (query, neighbor) hash agg —
    the classic reason PQ serves 100-TB corpora: the scan touches
    m-byte codes, not dim-float vectors.  Per-subspace terms are
    rounded to 6 and summed as DECIMAL(18,6) (order-invariant), so the
    score hash-matches any execution order and the SQL replay.

    ``candidates`` (optional, columns (query_id, neighbor_id))
    restricts scoring to the given pairs BEFORE the per-pair
    aggregation — the IVF-PQ composition: the coarse quantizer's
    probed cells supply the candidate set, and ADC touches only those
    codes, never the whole corpus.

    Returns (query_id, neighbor_id, adc, rank), rank 1..k, self
    excluded.
    """
    if dim % m != 0:
        raise ValueError(
            f"dim={dim} is not divisible by m={m}: the ADC lookup table"
            " would silently ignore the trailing dim % m dimensions"
        )
    from pyspark.sql.window import Window

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("_id"), "_vec", F.col("_norm").alias("qn")
    )
    qsub = _pq_subvectors(q, m, dim, "query_id", extra=["qn"])
    lut = qsub.join(F.broadcast(cents), "j").select(
        "query_id",
        "j",
        "cid",
        "qn",
        F.round(_dot(F.col("sv"), F.col("ce")), 6)
        .cast("decimal(18,6)")
        .alias("term"),
        F.col("cn2").cast("decimal(18,6)").alias("cn2d"),
    )
    pre = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), ["j", "cid"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    if candidates is not None:
        pre = pre.join(
            candidates.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "semi",
        )
    pair = (
        pre.groupBy("query_id", "neighbor_id")
        .agg(
            F.sum("term").alias("st"),
            F.sum("cn2d").alias("sc"),
            F.max("qn").alias("qn"),
        )
        .withColumn(
            "adc",
            F.round(
                F.col("st").cast("double")
                / (
                    F.col("qn")
                    * F.sqrt(
                        F.greatest(F.col("sc").cast("double"), F.lit(1e-30))
                    )
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    return (
        pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )
