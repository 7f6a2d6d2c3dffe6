"""Graph analytics: the north-star "GraphX/Pregel for analytics" surface.

PageRank, connected components, triangle counting, and label propagation
as driver-looped DataFrame programs (SURVEY §2.2 "Graph analytics",
§4.3.1). GraphX/Pregel proper is JVM-only; the DataFrame formulation is
the same message-passing dataflow — ``aggregateMessages`` ≡
``edges ⋈ ranks on src → groupBy(dst).agg(...)`` — and inherits AQE,
broadcast selection, and whole-stage codegen.

Scale discipline shared by all loops:
- edge set repartitioned by the join key ONCE, persisted, reused every
  round (one shuffle amortized over all iterations)
- ``localCheckpoint`` every few rounds to truncate lineage (iterative
  plan blowup is the classic failure mode)
- early exit on convergence via a cheap aggregate
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdatabases_spark.graph.model import PropertyGraph

CHECKPOINT_EVERY = 4


def _edges(graph: PropertyGraph | DataFrame) -> DataFrame:
    df = graph.edges if isinstance(graph, PropertyGraph) else graph
    return df.select("src", "dst")


def _vertices_from(graph: PropertyGraph | DataFrame, edges: DataFrame) -> DataFrame:
    if isinstance(graph, PropertyGraph):
        return graph.vertices.select("id")
    return edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()


def pagerank(
    graph: PropertyGraph | DataFrame,
    num_iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank with fixed iteration count.

    Semantics (documented so the DuckDB recursive-CTE oracle can mirror
    them exactly): r0 = 1/N; r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) /
    outdeg(u). Dangling-node mass is NOT redistributed (it decays), the
    same simplification GraphX's default makes.

    Returns DataFrame(id BIGINT, rank DOUBLE). One shuffle per iteration
    (the groupBy(dst)); the edges⋈ranks join reuses the edge partitioning.
    """
    edges = _edges(graph)
    vertices = _vertices_from(graph, edges)
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # (src, dst, outdeg) — static over iterations: partition by src, persist.
    links = (
        edges.join(out_deg, edges.src == out_deg.id)
        .select("src", "dst", "outdeg")
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        ranks = vertices.withColumn("rank", F.lit(1.0 / n))
        base = (1.0 - damping) / n
        for i in range(num_iters):
            contribs = (
                links.join(ranks, links.src == ranks.id)
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("outdeg")).alias("contrib"),
                )
                .groupBy("id")
                .agg(F.sum("contrib").alias("msg"))
            )
            ranks = (
                vertices.join(contribs, "id", "left")
                .select(
                    "id",
                    (F.lit(base) + F.lit(damping) * F.coalesce("msg", F.lit(0.0))).alias(
                        "rank"
                    ),
                )
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        links.unpersist()


def connected_components(graph: PropertyGraph | DataFrame, max_iters: int = 50) -> DataFrame:
    """Undirected connected components by iterative min-id propagation.

    comp(v) starts at v; each round takes the min of comp over v and its
    neighbors; converges in O(component diameter) rounds (the large-star/
    small-star optimization halves that but needs the same kernel).
    Returns DataFrame(id BIGINT, comp BIGINT).
    """
    e = _edges(graph)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = _vertices_from(graph, e)
    try:
        comp = vertices.select("id", F.col("id").alias("comp"))
        for i in range(max_iters):
            nbr_min = (
                sym.join(comp, sym.src == comp.id)
                .select(F.col("dst").alias("id"), F.col("comp"))
                .groupBy("id")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_comp = (
                comp.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                    ).alias("comp"),
                )
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                new_comp = new_comp.localCheckpoint(eager=True)
            else:
                new_comp = new_comp.persist(StorageLevel.MEMORY_AND_DISK)
            changed = (
                new_comp.alias("n")
                .join(comp.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            comp = new_comp
            if changed == 0:
                break
        return comp
    finally:
        sym.unpersist()


def triangle_count(graph: PropertyGraph | DataFrame) -> int:
    """Global triangle count on the undirected simple graph.

    Canonicalize edges to a<b, then count paths a<b<c closed by (a,c):
    two self-joins — the standard distributed formulation. At scale the
    first join shuffles on b; degree-skew is mitigated by AQE skew
    splitting (and classically by degree-ordering, which a<b<c gives).
    """
    e = _edges(graph)
    canon = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        e1 = canon.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = canon.select(F.col("a").alias("y2"), F.col("b").alias("z"))
        wedges = e1.join(e2, e1.y == e2.y2).select("x", "y", "z")
        closed = wedges.join(
            canon,
            (wedges.x == canon.a) & (wedges.z == canon.b),
            "left_semi",
        )
        return closed.count()
    finally:
        canon.unpersist()


def label_propagation(
    graph: PropertyGraph | DataFrame, num_iters: int = 5
) -> DataFrame:
    """Synchronous label propagation for community detection.

    label(v) starts at v; each round v adopts the most frequent label
    among in+out neighbors (ties → smallest label — deterministic).
    Returns DataFrame(id BIGINT, label BIGINT).
    """
    e = _edges(graph)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = _vertices_from(graph, e)
    try:
        labels = vertices.select("id", F.col("id").alias("label"))
        for i in range(num_iters):
            counts = (
                sym.join(labels, sym.src == labels.id)
                .select(F.col("dst").alias("id"), "label")
                .groupBy("id", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # Deterministic mode: max count, then min label.
            best = counts.groupBy("id").agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"), F.col("label").alias("label")
                    )
                ).alias("top")
            ).select("id", F.col("top.label").alias("new_label"))
            labels = (
                vertices.join(best, "id", "left")
                .join(labels.withColumnRenamed("label", "old_label"), "id", "left")
                .select(
                    "id",
                    F.coalesce("new_label", "old_label").alias("label"),
                )
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                labels = labels.localCheckpoint(eager=True)
        return labels
    finally:
        sym.unpersist()
