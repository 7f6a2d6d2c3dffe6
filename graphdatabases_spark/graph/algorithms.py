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

import warnings
from collections import Counter

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from graphdatabases_spark.graph.model import PropertyGraph
from graphdatabases_spark.graph.traversal import (
    LOCAL_EDGE_THRESHOLD,
    _collect_adjacency,
    _local_result_df,
    _pick_strategy,
    hash_partitioned_on,
)

CHECKPOINT_EVERY = 4

RANK_SCHEMA = StructType(
    [StructField("id", LongType(), False), StructField("rank", DoubleType(), False)]
)
COMP_SCHEMA = StructType(
    [StructField("id", LongType(), False), StructField("comp", LongType(), False)]
)
LABEL_SCHEMA = StructType(
    [StructField("id", LongType(), False), StructField("label", LongType(), False)]
)
CORE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("core_degree", LongType(), False),
    ]
)


def _edges(graph: PropertyGraph | DataFrame) -> DataFrame:
    df = graph.edges if isinstance(graph, PropertyGraph) else graph
    return df.select("src", "dst")


def _vertices_from(graph: PropertyGraph | DataFrame, edges: DataFrame) -> DataFrame:
    if isinstance(graph, PropertyGraph):
        return graph.vertices.select("id")
    return edges.select(F.explode(F.array("src", "dst")).alias("id")).distinct()


def _spark_of(df: DataFrame) -> SparkSession:
    return df.sparkSession


def _vertices_local(
    graph: PropertyGraph | DataFrame, adj: dict[int, list[int]]
) -> list[int]:
    """Driver-side vertex id list matching ``_vertices_from`` semantics."""
    if isinstance(graph, PropertyGraph):
        pdf = graph.vertices.select("id").toPandas()
        return [int(i) for i in pdf["id"]]
    ids = set(adj)
    for vs in adj.values():
        ids.update(vs)
    return sorted(ids)


def _pagerank_local(
    graph, edges: DataFrame, num_iters: int, damping: float
) -> DataFrame:
    """Driver-side power iteration — identical recurrence to the
    distributed loop (r0=1/N, dangling mass decays)."""
    spark = _spark_of(edges)
    adj = _collect_adjacency(edges)
    vertices = _vertices_local(graph, adj)
    n = len(vertices)
    if n == 0:
        return _local_result_df(spark, [], RANK_SCHEMA)
    base = (1.0 - damping) / n
    rank = {v: 1.0 / n for v in vertices}
    for _ in range(num_iters):
        msg: dict[int, float] = {}
        for u, vs in adj.items():
            share = rank[u] / len(vs)
            for v in vs:
                msg[v] = msg.get(v, 0.0) + share
        rank = {v: base + damping * msg.get(v, 0.0) for v in vertices}
    return _local_result_df(
        spark, [(v, rank[v]) for v in sorted(rank)], RANK_SCHEMA
    )


def pagerank(
    graph: PropertyGraph | DataFrame,
    num_iters: int = 10,
    damping: float = 0.85,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """PageRank with fixed iteration count.

    Semantics (documented so the DuckDB recursive-CTE oracle can mirror
    them exactly): r0 = 1/N; r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) /
    outdeg(u). Dangling-node mass is NOT redistributed (it decays), the
    same simplification GraphX's default makes.

    Returns DataFrame(id BIGINT, rank DOUBLE). One shuffle per iteration
    (the groupBy(dst)); the edges⋈ranks join reuses the edge partitioning.
    Small edge sets (≤ ``local_threshold``) run the identical recurrence
    driver-side — an N-round distributed loop on a toy graph pays N job
    latencies for nothing (same adaptive policy as the traversal kernel).
    """
    edges = _edges(graph)
    if _pick_strategy(edges, strategy, local_threshold) == "local":
        return _pagerank_local(graph, edges, num_iters, damping)
    vertices = _vertices_from(graph, edges)
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # (src, dst, outdeg) — static over iterations: partition by src,
    # persist. The repartition is skipped when the plan already reports
    # hashpartitioning(src) — a src-bucketed edge table, or the SMJ
    # path of the outdeg join having exchanged on src already.
    links = edges.join(out_deg, edges.src == out_deg.id).select(
        "src", "dst", "outdeg"
    )
    if not hash_partitioned_on(links, "src"):
        links = links.repartition("src")
    links = links.persist(StorageLevel.MEMORY_AND_DISK)
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
        if num_iters % CHECKPOINT_EVERY != 0:
            # Truncate the tail lineage: the caller's first action would
            # otherwise recompute the last rounds from `links` AFTER the
            # finally below unpersists it.
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        links.unpersist()


def _ppr_local(
    graph, edges: DataFrame, sources: list[int], num_iters: int, damping: float
) -> DataFrame:
    """Driver-side PPR power iteration — identical recurrence to the
    distributed loop."""
    spark = _spark_of(edges)
    adj = _collect_adjacency(edges)
    vertices = _vertices_local(graph, adj)
    src_set = set(sources)
    base_w = (1.0 - damping) / len(src_set)
    rank = {v: (1.0 / len(src_set) if v in src_set else 0.0) for v in vertices}
    for _ in range(num_iters):
        msg: dict[int, float] = {}
        for u, vs in adj.items():
            share = rank[u] / len(vs)
            for v in vs:
                msg[v] = msg.get(v, 0.0) + share
        rank = {
            v: (base_w if v in src_set else 0.0) + damping * msg.get(v, 0.0)
            for v in vertices
        }
    return _local_result_df(
        spark, [(v, rank[v]) for v in sorted(rank)], RANK_SCHEMA
    )


def personalized_pagerank(
    graph: PropertyGraph | DataFrame,
    sources: list[int],
    num_iters: int = 10,
    damping: float = 0.85,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Personalized PageRank: random walk with restart into ``sources``
    — the "related entities" operator (recommendations, seed-set
    expansion) that plain PageRank's uniform teleport cannot express.

    Semantics (mirrored by the unrolled-CTE oracle): r0(v) = 1/|S| for
    v ∈ S else 0; r_{t+1}(v) = (1-d)/|S|·[v ∈ S] + d·Σ_{u→v}
    r_t(u)/outdeg(u). Dangling mass decays, exactly like ``pagerank``.
    Teleport-source nodes therefore keep probability mass even with no
    in-edges — the loop rebuilds each round from the FULL vertex set,
    not just message receivers.

    Same scale shape as ``pagerank``: the (src, dst, outdeg) relation
    shuffles once (skipped when the edge scan is already
    hash-partitioned on src — the bucketed 100-TB layout) and each
    round is one join + one keyed aggregation.

    Returns DataFrame(id BIGINT, rank DOUBLE).
    """
    if not sources:
        raise ValueError("personalized_pagerank needs at least one source")
    src_set = sorted(set(int(s) for s in sources))
    edges = _edges(graph)
    if _pick_strategy(edges, strategy, local_threshold) == "local":
        return _ppr_local(graph, edges, src_set, num_iters, damping)
    spark = _spark_of(edges)
    vertices = _vertices_from(graph, edges)

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    links = edges.join(out_deg, edges.src == out_deg.id).select(
        "src", "dst", "outdeg"
    )
    if not hash_partitioned_on(links, "src"):
        links = links.repartition("src")
    links = links.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        is_src = F.col("id").isin(src_set)
        r0 = F.when(is_src, F.lit(1.0 / len(src_set))).otherwise(0.0)
        base = F.when(
            is_src, F.lit((1.0 - damping) / len(src_set))
        ).otherwise(0.0)
        ranks = vertices.withColumn("rank", r0)
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
            ranks = vertices.join(contribs, "id", "left").select(
                "id",
                (
                    base
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("rank"),
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                ranks = ranks.localCheckpoint(eager=True)
        if num_iters % CHECKPOINT_EVERY != 0:
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        links.unpersist()


SEED_RANK_SCHEMA = StructType(
    [
        StructField("seed", LongType(), False),
        StructField("id", LongType(), False),
        StructField("rank", DoubleType(), False),
    ]
)


def _ppr_batch_local(
    graph, edges: DataFrame, seeds: list[int], num_iters: int, damping: float
) -> DataFrame:
    """Driver-side per-seed PPR — identical sparse recurrence to the
    distributed loop (only touched vertices carry state)."""
    spark = _spark_of(edges)
    adj = _collect_adjacency(edges)
    rows: list[tuple[int, int, float]] = []
    for s in seeds:
        rank = {s: 1.0}
        for _ in range(num_iters):
            msg: dict[int, float] = {}
            for u, r in rank.items():
                vs = adj.get(u)
                if not vs:
                    continue
                share = r / len(vs)
                for v in vs:
                    msg[v] = msg.get(v, 0.0) + share
            rank = {v: damping * m for v, m in msg.items()}
            rank[s] = rank.get(s, 0.0) + (1.0 - damping)
        rows.extend((s, v, rank[v]) for v in sorted(rank))
    return _local_result_df(spark, rows, SEED_RANK_SCHEMA)


def personalized_pagerank_batch(
    graph: PropertyGraph | DataFrame,
    seeds: list[int],
    num_iters: int = 10,
    damping: float = 0.85,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Per-seed personalized PageRank for a seed BATCH — the "related
    items for every seed in one pass" shape (batch recommendations,
    seed-set expansion serving). Unlike ``personalized_pagerank``,
    which spreads one normalized restart distribution over the whole
    seed set, each seed here gets its OWN unit restart mass, so rank
    vectors are per-seed normalized and directly comparable across
    seeds: r0(s, v) = [v = s]; r_{t+1}(s, v) = (1-d)·[v = s] +
    d·Σ_{u→v} r_t(s, u)/outdeg(u).

    Scale shape: the state is SPARSE — DataFrame(seed, id, rank) holds
    only vertices the walk has touched (per-seed PPR mass is confined
    to the k-hop neighborhood after k rounds), never |V|×|S| rows. The
    (src, dst, outdeg) relation shuffles once (skipped when the edge
    scan is already hash-partitioned on src — the bucketed 100-TB
    layout); each round is one join plus one (seed, dst) keyed
    aggregation whose width tracks the frontier, not the graph.

    Returns DataFrame(seed BIGINT, id BIGINT, rank DOUBLE) with only
    rank > 0 rows (exactly the vertices whose dense rank is nonzero).
    """
    if not seeds:
        raise ValueError("personalized_pagerank_batch needs at least one seed")
    seed_list = sorted(set(int(s) for s in seeds))
    edges = _edges(graph)
    if _pick_strategy(edges, strategy, local_threshold) == "local":
        return _ppr_batch_local(graph, edges, seed_list, num_iters, damping)
    spark = _spark_of(edges)

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    links = edges.join(out_deg, edges.src == out_deg.id).select(
        "src", "dst", "outdeg"
    )
    if not hash_partitioned_on(links, "src"):
        links = links.repartition("src")
    links = links.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        seed_keys = spark.createDataFrame(
            [(s, s) for s in seed_list], "seed BIGINT, id BIGINT"
        )
        ranks = spark.createDataFrame(
            [(s, s, 1.0) for s in seed_list], SEED_RANK_SCHEMA
        )
        base = F.when(
            F.col("id") == F.col("seed"), F.lit(1.0 - damping)
        ).otherwise(F.lit(0.0))
        for i in range(num_iters):
            msgs = (
                links.join(ranks, links.src == ranks.id)
                .select(
                    "seed",
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("outdeg")).alias("contrib"),
                )
                .groupBy("seed", "id")
                .agg(F.sum("contrib").alias("msg"))
            )
            # Sparse rebuild: message receivers ∪ the |S| teleport keys
            # (full outer on the tiny key frame) — vertices with
            # neither stay implicit zeros instead of materializing
            # |V|×|S| state. The value expression mirrors the dense
            # recurrence term-for-term (base + d·Σ, the Σ aggregated
            # FIRST) so the unrolled-CTE oracle is bit-identical.
            ranks = msgs.join(seed_keys, ["seed", "id"], "full_outer").select(
                "seed",
                "id",
                (
                    base + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("rank"),
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                ranks = ranks.localCheckpoint(eager=True)
        if num_iters % CHECKPOINT_EVERY != 0:
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        links.unpersist()


def personalized_pagerank_batch_units(
    graph: PropertyGraph | DataFrame,
    seeds: list[int],
    num_iters: int = 3,
    damping_pct: int = 85,
    unit_scale: int = 10**12,
) -> DataFrame:
    """FIXED-POINT per-seed personalized PageRank: the integer variant
    of ``personalized_pagerank_batch`` for graphs whose in-degree makes
    double message sums accumulation-order-dependent (any real entity
    graph — a popular item sums thousands of contributions, and float
    addition order varies with partitioning).

    Ranks are BIGINT micro-units (seed starts at ``unit_scale``); each
    round is contrib = units div outdeg (truncating integer division),
    msg = Σ contrib (exact integer sum — associative and commutative,
    so ANY partitioning, shuffle order, or aggregation tree yields the
    same bits), new = (100-damping_pct)%·unit_scale at the seed +
    damping_pct·msg div 100. The deliberate truncation bias (< 1 unit
    per division, i.e. < 1e-12 of the walk) buys ENGINE-EXACT
    reproducibility — the same discipline as the catalog's DECIMAL
    money sums and integer log2 surprise scores. Same sparse state and
    scale shape as the double kernel; no local fast path is needed
    because integer ops remove the only cross-strategy divergence.

    Returns DataFrame(seed BIGINT, id BIGINT, rank_units BIGINT) with
    the walk's touched vertices (rank_units may be 0 where truncation
    consumed the mass — filter > 0 for the support set).
    """
    if not seeds:
        raise ValueError("personalized_pagerank_batch_units needs at least one seed")
    seed_list = sorted(set(int(s) for s in seeds))
    edges = _edges(graph)
    spark = _spark_of(edges)

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    links = edges.join(out_deg, edges.src == out_deg.id).select(
        "src", "dst", "outdeg"
    )
    if not hash_partitioned_on(links, "src"):
        links = links.repartition("src")
    links = links.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        base_units = ((100 - damping_pct) * unit_scale) // 100
        seed_keys = spark.createDataFrame(
            [(s, s) for s in seed_list], "seed BIGINT, id BIGINT"
        )
        ranks = spark.createDataFrame(
            [(s, s, unit_scale) for s in seed_list],
            "seed BIGINT, id BIGINT, rank_units BIGINT",
        )
        base = F.when(
            F.col("id") == F.col("seed"), F.lit(base_units)
        ).otherwise(F.lit(0))
        for i in range(num_iters):
            msgs = (
                links.join(ranks, links.src == ranks.id)
                .select(
                    "seed",
                    F.col("dst").alias("id"),
                    F.expr("rank_units div outdeg").alias("contrib"),
                )
                .groupBy("seed", "id")
                .agg(F.sum("contrib").alias("msg"))
            )
            ranks = msgs.join(seed_keys, ["seed", "id"], "full_outer").select(
                "seed",
                "id",
                (
                    base
                    + F.expr(
                        f"({damping_pct} * coalesce(msg, 0)) div 100"
                    )
                ).cast("long").alias("rank_units"),
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                ranks = ranks.localCheckpoint(eager=True)
        if num_iters % CHECKPOINT_EVERY != 0:
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        links.unpersist()


def pagerank_units(
    graph: PropertyGraph | DataFrame,
    num_iters: int = 10,
    damping_pct: int = 85,
    unit_scale: int = 10**12,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """GLOBAL fixed-point PageRank with an optional WARM START — the
    whole-graph sibling of ``personalized_pagerank_batch_units`` and
    the kernel behind incremental rank maintenance: after appending an
    edge batch, restart power iteration from the previous fixed point
    (``init_ranks``) instead of from uniform, and the walk re-contracts
    from the perturbation size rather than from scratch.

    Arithmetic (mirrors the per-seed units kernel so unrolled-CTE
    oracles replay it bit-for-bit): every vertex starts at
    ``unit_scale`` units (or its ``init_ranks`` value; vertices the
    batch introduced that have no prior rank fall back to
    ``unit_scale``, the cold-start value); each round is
    contrib = units div outdeg (truncating), msg = Σ contrib (exact
    integer sum — associative/commutative, so ANY partitioning yields
    the same bits), new = (100-damping_pct)%·unit_scale +
    damping_pct·msg div 100 at EVERY vertex. Dangling mass decays.
    The truncated integer map is deterministic, so cold and warm
    trajectories that meet once stay equal — the basis of the
    rounds_warm < rounds_cold / identical-fixed-point pin in
    ``tests/test_round11_graph.py``.

    Scale shape: the (src, dst, outdeg) relation shuffles once and is
    reused every round; each round is one join (reusing the edge
    partitioning) plus one dst-keyed aggregation; state is one BIGINT
    per vertex; lineage truncated every ``CHECKPOINT_EVERY`` rounds.
    No local fast path is needed: integer ops remove the only
    cross-strategy divergence (same policy as the per-seed kernel).

    Returns DataFrame(id BIGINT, rank_units BIGINT) over the graph's
    full vertex set.
    """
    from graphdatabases_spark.graph.traversal import FRONTIER_BROADCAST_MAX

    edges = _edges(graph)
    # The vertex frame re-enters the plan EVERY round (the left join
    # that hands each vertex its base units) — materialize it once;
    # without this each round re-runs the edge scan + explode-distinct
    # (measured 3.6× the whole entry's wall at sf0.1).
    vertices = (
        _vertices_from(graph, edges)
        .select(F.col("id").cast("long"))
        .localCheckpoint(eager=True)
    )
    # Size-switched per-round broadcasts (round 14): a rank/msg row is
    # 16 B, so below the frontier cap the per-vertex state broadcasts
    # (~4 MB at 186k vertices) and BOTH per-round joins become
    # broadcast-hash — the cached links relation streams with ZERO
    # exchange, and only the dst-keyed partial-agg output shuffles.
    # Above the cap the pre-r14 shuffle-join shape is unchanged.
    n_vertices = vertices.count()
    small = n_vertices <= FRONTIER_BROADCAST_MAX

    def _side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    links = edges.join(out_deg, edges.src == out_deg.id).select(
        "src", "dst", "outdeg"
    )
    if not small and not hash_partitioned_on(links, "src"):
        links = links.repartition("src")
    links = links.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        base_units = ((100 - damping_pct) * unit_scale) // 100
        if init_ranks is None:
            ranks = vertices.select(
                "id", F.lit(unit_scale).cast("long").alias("rank_units")
            )
        else:
            prev = init_ranks.select(
                F.col("id").cast("long").alias("id"),
                F.col("rank_units").cast("long").alias("prev_units"),
            )
            ranks = vertices.join(prev, "id", "left").select(
                "id",
                F.coalesce("prev_units", F.lit(unit_scale))
                .cast("long")
                .alias("rank_units"),
            )
        ranks = ranks.localCheckpoint(eager=True)
        for i in range(num_iters):
            msgs = (
                links.join(_side(ranks), links.src == ranks.id)
                .select(
                    F.col("dst").alias("id"),
                    F.expr("rank_units div outdeg").alias("contrib"),
                )
                .groupBy("id")
                .agg(F.sum("contrib").alias("msg"))
            )
            ranks = vertices.join(_side(msgs), "id", "left").select(
                "id",
                (
                    F.lit(base_units)
                    + F.expr(f"({damping_pct} * coalesce(msg, 0)) div 100")
                )
                .cast("long")
                .alias("rank_units"),
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                ranks = ranks.localCheckpoint(eager=True)
        if num_iters % CHECKPOINT_EVERY != 0:
            ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        links.unpersist()


def _connected_components_local(graph, edges: DataFrame) -> DataFrame:
    """Union-find — the converged fixpoint of min-id propagation."""
    spark = _spark_of(edges)
    adj = _collect_adjacency(edges)
    vertices = _vertices_local(graph, adj)
    parent = {v: v for v in vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, vs in adj.items():
        for v in vs:
            ru, rv = find(u), find(v)
            if ru != rv:
                # Union by min id so the root IS the component label.
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    return _local_result_df(
        spark, [(v, find(v)) for v in sorted(vertices)], COMP_SCHEMA
    )


def connected_components(
    graph: PropertyGraph | DataFrame,
    max_iters: int = 50,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
    strict: bool = False,
) -> DataFrame:
    """Undirected connected components by iterative min-id propagation.

    comp(v) starts at v; each round takes the min of comp over v and its
    neighbors; converges in O(component diameter) rounds (the large-star/
    small-star optimization halves that but needs the same kernel).
    Small edge sets run union-find on the driver — the same converged
    answer without O(diameter) job rounds.
    Returns DataFrame(id BIGINT, comp BIGINT).
    """
    if max_iters < 1:
        # Zero propagation rounds would silently return every vertex as
        # its own component (same hazard class as the kcore guard).
        raise ValueError(f"connected_components needs max_iters >= 1, got {max_iters}")
    from graphdatabases_spark.graph.traversal import FRONTIER_BROADCAST_MAX

    e = _edges(graph)
    if _pick_strategy(e, strategy, local_threshold) == "local":
        return _connected_components_local(graph, e)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    vertices = _vertices_from(graph, e)
    # Size-switched per-round broadcasts (round 14, the pagerank_units
    # pattern): below the frontier cap the per-vertex label state
    # broadcasts and the cached sym streams with no setup repartition
    # and no per-round exchange of the label side; only the keyed min
    # aggregate shuffles.  Above the cap the shuffle shape is unchanged.
    n_vertices = vertices.count()
    small = n_vertices <= FRONTIER_BROADCAST_MAX

    def _side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    if not small:
        sym = sym.repartition("src")
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    prev_cached: DataFrame | None = None
    try:
        comp = vertices.select("id", F.col("id").alias("comp"))
        for i in range(max_iters):
            nbr_min = (
                sym.join(_side(comp), sym.src == comp.id)
                .select(F.col("dst").alias("id"), F.col("comp"))
                .groupBy("id")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_comp = (
                comp.join(_side(nbr_min), "id", "left")
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
            # Full-pass convergence check (no limit): one job that both
            # materializes new_comp's cache and counts changed labels, so
            # the previous round's cache can be released immediately —
            # cached blocks no longer accumulate across rounds.
            changed = (
                new_comp.alias("n")
                .join(_side(comp.alias("o")), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = new_comp if (i + 1) % CHECKPOINT_EVERY != 0 else None
            comp = new_comp
            if changed == 0:
                break
        else:
            # Min-id propagation converges in O(component diameter)
            # rounds; a caller-supplied max_iters can cut a long-path
            # component short, leaving split component ids. Same
            # surfacing contract as kcore: warn, or raise under strict.
            if changed > 0:
                msg = (
                    f"connected_components: max_iters={max_iters} "
                    f"exhausted before the fixpoint ({changed} labels "
                    "still changing); components may be split — raise "
                    "max_iters"
                )
                if strict:
                    raise RuntimeError(msg)
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
        if prev_cached is not None:
            # Detach the result from the cache we are about to release.
            comp = comp.localCheckpoint(eager=True)
        return comp
    finally:
        if prev_cached is not None:
            prev_cached.unpersist()
        sym.unpersist()


def _triangle_count_local(edges: DataFrame) -> int:
    adj = _collect_adjacency(edges)
    canon: set[tuple[int, int]] = set()
    for u, vs in adj.items():
        for v in vs:
            if u != v:
                canon.add((u, v) if u < v else (v, u))
    fwd: dict[int, set[int]] = {}
    for a, b in canon:
        fwd.setdefault(a, set()).add(b)
    # Each triangle a<b<c counted once, at its lowest edge (a,b).
    return sum(
        len(fwd.get(a, set()) & fwd.get(b, set())) for a, b in canon
    )


def triangle_count(
    graph: PropertyGraph | DataFrame,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> int:
    """Global triangle count on the undirected simple graph.

    Canonicalize edges to a<b, then count paths a<b<c closed by (a,c):
    two self-joins — the standard distributed formulation. At scale the
    first join shuffles on b; degree-skew is mitigated by AQE skew
    splitting (and classically by degree-ordering, which a<b<c gives).
    """
    e = _edges(graph)
    if _pick_strategy(e, strategy, local_threshold) == "local":
        return _triangle_count_local(e)
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


def _label_propagation_local(graph, edges: DataFrame, num_iters: int) -> DataFrame:
    """Synchronous LPA on the driver — mirrors the distributed rounds
    exactly, including per-edge multiplicity in the neighbor counts."""
    spark = _spark_of(edges)
    adj = _collect_adjacency(edges)
    vertices = _vertices_local(graph, adj)
    # Symmetric neighbor multiset, duplicates preserved (matches the
    # distributed union of forward + reversed edges without distinct).
    nbrs: dict[int, list[int]] = {v: [] for v in vertices}
    for u, vs in adj.items():
        for v in vs:
            nbrs.setdefault(v, []).append(u)
            nbrs.setdefault(u, []).append(v)
    labels = {v: v for v in vertices}
    for _ in range(num_iters):
        new_labels = {}
        for v in vertices:
            counts = Counter(labels[u] for u in nbrs.get(v, ()))
            if counts:
                # Max count, ties → smallest label (deterministic mode).
                new_labels[v] = min((-c, l) for l, c in counts.items())[1]
            else:
                new_labels[v] = labels[v]
        labels = new_labels
    return _local_result_df(
        spark, [(v, labels[v]) for v in sorted(labels)], LABEL_SCHEMA
    )


def label_propagation(
    graph: PropertyGraph | DataFrame,
    num_iters: int = 5,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Synchronous label propagation for community detection.

    label(v) starts at v; each round v adopts the most frequent label
    among in+out neighbors (ties → smallest label — deterministic).
    Returns DataFrame(id BIGINT, label BIGINT).
    """
    from graphdatabases_spark.graph.traversal import FRONTIER_BROADCAST_MAX

    e = _edges(graph)
    if _pick_strategy(e, strategy, local_threshold) == "local":
        return _label_propagation_local(graph, e, num_iters)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # Materialize the vertex set once: the per-round label rebuild
    # left-joins `vertices`, and without this the endpoint-distinct
    # (an O(edges) shuffle) re-executes every round.
    vertices = _vertices_from(graph, e).localCheckpoint(eager=True)
    # Size-switched per-round broadcasts (round 14, the pagerank_units
    # pattern): below the frontier cap the per-vertex label state
    # broadcasts and both per-round joins are broadcast-hash — sym
    # streams with no setup repartition and no per-round exchange of
    # the label side; only the keyed count aggregate shuffles.  Above
    # the cap the pre-r14 shuffle-join shape (src-clustered sym copy)
    # is unchanged.
    n_vertices = vertices.count()
    small = n_vertices <= FRONTIER_BROADCAST_MAX

    def _side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    if not small:
        sym = sym.repartition("src")
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        labels = vertices.select("id", F.col("id").alias("label"))
        for i in range(num_iters):
            counts = (
                sym.join(_side(labels), sym.src == labels.id)
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
            # Rebuild WITHOUT re-joining the previous labels: a vertex
            # missing from `best` has no neighbor (isolated), and an
            # isolated vertex's label never moves off its initial id —
            # so coalesce(new_label, id) is exact. This keeps each
            # round's lineage a SINGLE-reference chain; the old
            # two-reference rebuild (best ⋈ labels_old both derived
            # from labels_prev) doubled the un-checkpointed plan per
            # round — measured 131→272→551 MB shuffle for 1→2→3
            # rounds on the 3M-edge sf1 co-purchase graph before the
            # round-9 fix, ~linear after.
            labels = vertices.join(_side(best), "id", "left").select(
                "id",
                F.coalesce("new_label", F.col("id")).alias("label"),
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                labels = labels.localCheckpoint(eager=True)
        if num_iters % CHECKPOINT_EVERY != 0:
            # Truncate tail lineage: the caller's first action would
            # otherwise recompute every round from `sym` AFTER the
            # finally below unpersists it (same fix as pagerank).
            labels = labels.localCheckpoint(eager=True)
        return labels
    finally:
        sym.unpersist()


def _kcore_local(graph, edges: DataFrame, k: int) -> DataFrame:
    """Driver-side peel: repeatedly delete nodes of degree < k."""
    spark = _spark_of(edges)
    adj = _collect_adjacency(edges)
    # Undirected neighbor sets (dedup parallel edges; drop self-loops).
    nbrs: dict[int, set[int]] = {}
    for u, vs in adj.items():
        for v in vs:
            if u == v:
                continue
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
    alive = set(nbrs)
    queue = [v for v in alive if len(nbrs[v]) < k]
    while queue:
        v = queue.pop()
        if v not in alive:
            continue
        alive.discard(v)
        for u in nbrs[v]:
            if u in alive:
                nbrs[u].discard(v)
                if len(nbrs[u]) < k:
                    queue.append(u)
    return _local_result_df(
        spark,
        [(v, len(nbrs[v])) for v in sorted(alive)],
        CORE_SCHEMA,
    )


def kcore(
    graph: PropertyGraph | DataFrame,
    k: int = 2,
    max_iters: int = 50,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
    strict: bool = False,
) -> DataFrame:
    """Nodes of the k-core (maximal subgraph with min degree ≥ k) and
    their within-core degrees. Returns DataFrame(id, core_degree).

    Distributed form is synchronous peeling: each round computes degrees
    over the surviving subgraph and drops nodes under k; converges in
    O(peel depth) rounds (typically ≪ |V|). Each round is one shuffle
    keyed on node id; the edge set is filtered by two semi-joins against
    the shrinking survivor set, so work decreases monotonically — the
    100-TB shape. Small graphs peel on the driver (same fixpoint,
    no per-round job overhead).
    """
    if max_iters < 1:
        # The for/else warning below reads the loop's `dropped`; a
        # zero-round "peel" would also silently return unpeeled degrees.
        raise ValueError(f"kcore needs max_iters >= 1, got {max_iters}")
    e = _edges(graph)
    if _pick_strategy(e, strategy, local_threshold) == "local":
        return _kcore_local(graph, e, k)
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    sym = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    prev_cached: DataFrame | None = None
    try:
        cur = sym
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        for i in range(max_iters):
            survivors = deg.filter(F.col("deg") >= k).select("src")
            cur = cur.join(survivors, "src", "semi").join(
                survivors.select(F.col("src").alias("dst")), "dst", "semi"
            )
            new_deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
            if (i + 1) % CHECKPOINT_EVERY == 0:
                new_deg = new_deg.localCheckpoint(eager=True)
            else:
                new_deg = new_deg.persist(StorageLevel.MEMORY_AND_DISK)
            # One job materializes new_deg and checks the fixpoint (any
            # surviving node still under k?), then the previous round's
            # cache is released — same cache discipline as
            # connected_components above.
            dropped = new_deg.filter(F.col("deg") < k).count()
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = new_deg if (i + 1) % CHECKPOINT_EVERY != 0 else None
            deg = new_deg
            # Re-anchor the edge filter on the materialized degree frame
            # rather than the growing semi-join lineage.
            cur = sym.join(deg.select("src"), "src", "semi").join(
                deg.select(F.col("src").alias("dst")), "dst", "semi"
            )
            if dropped == 0:
                break
        else:
            # Each round strictly shrinks the survivor set, so peel depth
            # is bounded by |V| — but a caller-supplied max_iters can
            # still cut a deep peel (long path appendages) short.  A
            # silent return would contain nodes below k; surface it.
            if dropped > 0:
                msg = (
                    f"kcore: max_iters={max_iters} exhausted before the "
                    f"peel fixpoint ({dropped} nodes still under k={k}); "
                    "result is the partially-peeled subgraph — raise "
                    "max_iters"
                )
                if strict:
                    raise RuntimeError(msg)
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
        out = deg.select(F.col("src").alias("id"), F.col("deg").alias("core_degree"))
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        if prev_cached is not None:
            prev_cached.unpersist()
        sym.unpersist()


def _weighted_sssp_local(
    wedges: DataFrame, src: int
) -> DataFrame:
    """Driver-side Dijkstra over a collected (src, dst, w) edge list —
    the bounded fast path (same threshold contract as the other
    kernels: only below LOCAL_EDGE_THRESHOLD edges)."""
    import heapq

    spark = _spark_of(wedges)
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in wedges.collect():
        if r["w"] < 0:
            raise ValueError("weighted_sssp requires non-negative weights")
        adj.setdefault(int(r["src"]), []).append((int(r["dst"]), int(r["w"])))
    dist: dict[int, int] = {src: 0}
    heap = [(0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    rows = [(int(i), int(d)) for i, d in sorted(dist.items())]
    return spark.createDataFrame(rows, "id bigint, dist bigint")


def weighted_sssp(
    edges: DataFrame,
    src: int,
    weight_col: str = "w",
    max_iters: int = 30,
    strategy: str = "auto",
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
    strict: bool = False,
) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford / min-plus
    relaxation) — the weighted sibling of ``traversal.ssp``'s
    hop-count BFS.

    Each round relaxes every edge once: dist' = min(dist, min over
    in-edges of dist(src) + w). Converges in O(longest minimal-weight
    path hop count) rounds; early-exits on the first round with zero
    improvements (full-pass check, no LIMIT sampling), warns — or
    raises under ``strict`` — if ``max_iters`` cuts the fixpoint
    short. Negative weights are rejected (min-plus with negatives
    cannot certify convergence without |V| rounds and cycle checks).

    Scale shape: dist is hash-partitioned by id; each round is one
    equi-join dist⋈edges on the edge source + one min-aggregation on
    the destination — the same two-exchange round as PageRank/CC, with
    ``localCheckpoint`` every ``CHECKPOINT_EVERY`` rounds to truncate
    lineage. Small edge sets run driver-side Dijkstra instead (same
    converged answer, no per-round job overhead).

    Returns DataFrame(id BIGINT, dist BIGINT) over reachable nodes,
    including the source at distance 0.
    """
    if max_iters < 1:
        raise ValueError(f"weighted_sssp needs max_iters >= 1, got {max_iters}")
    wedges = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col(weight_col).cast("long").alias("w"),
    )
    # Negative weights are validated INSIDE each path (local: during
    # the adjacency collect; distributed: on the persisted, already-
    # repartitioned copy) — a separate up-front action would re-execute
    # the caller's whole edge-derivation plan one extra time (measured:
    # the entity-graph distinct exchange ran twice at sf1).
    if _pick_strategy(edges, strategy, local_threshold) == "local":
        return _weighted_sssp_local(wedges, src)
    spark = _spark_of(edges)
    if not hash_partitioned_on(wedges, "src"):
        wedges = wedges.repartition("src")
    # else: src-bucketed edge table (SURVEY §1.2) — already clustered
    # on the relaxation join key, the one-time shuffle is free.
    wedges = wedges.persist(StorageLevel.MEMORY_AND_DISK)
    if wedges.filter(F.col("w") < 0).limit(1).count():
        wedges.unpersist()
        raise ValueError("weighted_sssp requires non-negative weights")
    prev_cached: DataFrame | None = None
    try:
        dist = spark.createDataFrame(
            [(int(src), 0)], "id bigint, dist bigint"
        )
        for i in range(max_iters):
            relaxed = (
                wedges.join(dist, wedges.src == dist.id)
                .select(
                    F.col("dst").alias("id"),
                    (F.col("dist") + F.col("w")).alias("cand"),
                )
                .groupBy("id")
                .agg(F.min("cand").alias("cand"))
            )
            new_dist = (
                dist.join(relaxed, "id", "full")
                .select(
                    "id",
                    F.least(
                        F.coalesce("dist", F.lit(1 << 62)),
                        F.coalesce("cand", F.lit(1 << 62)),
                    ).alias("dist"),
                )
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                new_dist = new_dist.localCheckpoint(eager=True)
            else:
                new_dist = new_dist.persist(StorageLevel.MEMORY_AND_DISK)
            changed = (
                new_dist.alias("n")
                .join(dist.alias("o"), "id", "left")
                .filter(
                    F.col("o.dist").isNull()
                    | (F.col("n.dist") != F.col("o.dist"))
                )
                .count()
            )
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = (
                new_dist if (i + 1) % CHECKPOINT_EVERY != 0 else None
            )
            dist = new_dist
            if changed == 0:
                break
        else:
            if changed > 0:
                msg = (
                    f"weighted_sssp: max_iters={max_iters} exhausted "
                    f"before the fixpoint ({changed} distances still "
                    "improving); results may be over-estimates — raise "
                    "max_iters"
                )
                if strict:
                    raise RuntimeError(msg)
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
        if prev_cached is not None:
            dist = dist.localCheckpoint(eager=True)
        return dist
    finally:
        if prev_cached is not None:
            prev_cached.unpersist()
        wedges.unpersist()
