"""Distributed k-means over an embedding column — document clustering
for training-data curation (topic balancing, dedup-by-cluster sampling).

Deterministic end to end (lowest-id seed init, 6-dp-rounded argmin with
lowest-cluster tie-break, DECIMAL-exact centroid means), so the catalog
entry's DuckDB oracle replays the full 5-round fit as chained CTEs and
value-hash-checks it; tests/test_pipeline_queries.py additionally pins
the invariants (partition of the input, monotone non-increasing
inertia — up to the ≤1e-6-per-point slack a 6-dp rounding tie can
introduce — and label purity).

Scale design (the 100-TB path):

- Centroids are tiny (k × dim doubles) and live as LITERAL arrays inside
  the projection — every executor evaluates all k distances JVM-side in
  one codegen stage, so the ASSIGNMENT step is shuffle-free.
- The UPDATE step is ``posexplode → groupBy (cluster, dim) avg`` — a
  map-side-combinable hash aggregation whose output is k × dim rows
  regardless of input size.  One bounded shuffle per iteration.
- The only driver traffic is the k × dim centroid matrix per iteration —
  the same O(k·d) a parameter-server design would ship.

Distances fold in double after an explicit float→double cast; the
index-ordered ``aggregate`` fold is deterministic per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col, centroid: list[float]):
    """Squared L2 distance between an array<double> column and a Python
    centroid, folded JVM-side in index order (deterministic).

    The centroid literal parses as ONE SQL expression: per-element
    F.lit costs a py4j round-trip each (~26 ms per 64-dim centroid,
    paid k times per assignment per Lloyd round); the %.17E rendering
    round-trips every double exactly and parses as array<double>."""
    lit = F.expr(
        "array({})".format(",".join(f"{float(x):.17E}" for x in centroid))
    )
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add ``cluster`` (argmin distance, lowest id wins ties) and
    ``dist2`` (the RAW distance to the chosen centroid) columns.
    Pure projection — no shuffle, no UDF.

    The argmin compares distances ROUNDED to 6 dp (raw comparison is
    deterministic within one engine, but the SQL oracle's
    inner-product-identity d2 differs from the fold-order d2 here by
    ~1e-13, so ANY raw near-tie could rank differently across engines;
    rounding shrinks the cross-engine divergence window to the measure-
    tiny case of a d2 landing within ~1e-13 of a 6-dp rounding
    boundary — the same discipline as the IVF centroid ranking).

    Precondition: every row's embedding is non-null (a NULL embedding
    would get a NULL cluster here while row_number-style SQL oracles
    would rank it into cluster 0 — a cross-engine hazard).
    ``kmeans_fit``/``kmeans_summary`` enforce it by filtering up front,
    mirroring the null-id filter."""
    d = df.withColumn("_e", F.transform("embedding", lambda x: x.cast("double")))
    dist_cols = [
        _dist2(F.col("_e"), centroids[i]).alias(f"_d{i}")
        for i in range(len(centroids))
    ]
    d = d.select("*", *dist_cols)
    rounded = [F.round(F.col(f"_d{i}"), 6) for i in range(len(centroids))]
    # F.least needs >= 2 columns; k=1 degenerates to the single distance.
    best_r = F.least(*rounded) if len(rounded) > 1 else rounded[0]
    cluster = F.lit(None).cast("int")
    dist2 = F.lit(None).cast("double")
    for i in reversed(range(len(centroids))):
        hit = rounded[i] == best_r
        cluster = F.when(hit, F.lit(i)).otherwise(cluster)
        dist2 = F.when(hit, F.col(f"_d{i}")).otherwise(dist2)
    return d.withColumn("cluster", cluster).withColumn("dist2", dist2).drop(
        *[f"_d{i}" for i in range(len(centroids))]
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's iterations with deterministic init (the vectors of the k
    smallest non-null ids, numbered by position — no density assumption
    on the id space; the null filter matters because Spark sorts nulls
    FIRST while the SQL oracle's engine sorts them LAST).  If the input
    has fewer than k rows, k clamps to the row count.  Returns the
    final centroid matrix."""
    # Null-embedding rows can neither seed nor train a centroid (and
    # _assign would give them a NULL cluster while the SQL oracle's
    # row_number ranking would not) — drop them up front, like null ids.
    df = df.filter(F.col(vec_col).isNotNull())
    init_rows = (
        df.filter(F.col(id_col).isNotNull())
        .orderBy(id_col)
        .limit(k)
        .select(F.transform(vec_col, lambda x: x.cast("double")).alias("e"))
        .collect()
    )
    centroids = [list(r["e"]) for r in init_rows]
    if not centroids:
        raise ValueError("kmeans_fit: input has no rows with a non-null id")
    k = len(centroids)  # clamp: fewer rows than requested clusters
    for _ in range(iters):
        assigned = _assign(df, centroids)
        # Mean = exact DECIMAL sum / count (not a double avg): double
        # summation order varies with partitioning, which would make
        # the trained centroids run-dependent; the decimal sum is exact
        # on any partitioning AND engine-identical, which is what lets
        # the full 5-round fit be replayed in the DuckDB oracle.
        new_rows = (
            assigned.select("cluster", F.posexplode("_e").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,15)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["mean"]
        centroids = [
            [by_cluster[c][d] for d in range(len(centroids[0]))]
            if c in by_cluster
            else centroids[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
    return centroids


def kmeans_summary(
    df: DataFrame, k: int = 8, iters: int = 5
) -> DataFrame:
    """(cluster, n, inertia) after ``iters`` Lloyd rounds — the catalog
    surface.  Inertia sums as DECIMAL (partition-order-exact) and is
    rounded to 3 dp, absorbing the ~1e-10 difference between the
    fold-order dist2 here and the inner-product-identity dist2 the SQL
    oracle computes — so the whole fit is value-hash-checkable."""
    df = df.filter(F.col("embedding").isNotNull())
    centroids = kmeans_fit(df, k=k, iters=iters)
    assigned = _assign(df, centroids)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("dist2").cast("decimal(28,15)")).cast("double"), 3
            ).alias("inertia"),
        )
        .orderBy("cluster")
    )
