"""Incremental repair of the symmetry-breaking kernels (SURVEY §2.2
graph analytics, the incremental family).

Pure-move split out of graph_symmetry_queries.py (round 13 — that
module was heading for the 2k bar with the b-matching addition): the
priority-DAG cascade repairs for MIS and maximal matching after an
edge-batch append, each with a sub-threshold driver-local cascade
(lazy adjacency fetches) and the distributed relaxation as the
above-threshold path.  Same entries, same oracles, registry unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.relational.catalog import register
from graphdatabases_spark.relational.graph_kernels import (
    _SYM_LOCAL_EDGE_MAX,
    _SYM_LOCAL_V_MAX,
    _mis_kernel,
    _mis_side,
    _sym_partition_key,
)
from graphdatabases_spark.relational.graph_queries import (
    ENTITY_EDGES_SQL,
    entity_edges,
)

# ---------------------------------------------------------------------------
# Incremental MIS repair after an edge-batch append (priority-DAG cascade)
# ---------------------------------------------------------------------------

_MI_MOD = 20      # (src + dst) % 20 == 0 -> the ~5% "appended" batch
                  # (the graph_pagerank_incremental split, symmetric in
                  # src/dst so it filters the symmetrized relation too)
_MI_ROUNDS = 8    # oracle unroll per phase (measured fixpoints below)


def _mi_round_sql(tag: str, k: int) -> str:
    """One fixed-priority MIS round over ``{tag}sym`` (graph_mis_luby's
    _mis_round_sql parameterized by relation prefix so the incremental
    oracle can unroll the base and appended graphs side by side)."""
    return f"""
    {tag}w{k} AS MATERIALIZED (
      SELECT u.id, u.h FROM {tag}u{k - 1} u
      WHERE NOT EXISTS (
        SELECT 1 FROM {tag}sym s JOIN {tag}u{k - 1} n ON n.id = s.dst
        WHERE s.src = u.id
          AND (n.h < u.h OR (n.h = u.h AND n.id < u.id))
      )
    ),
    {tag}u{k} AS MATERIALIZED (
      SELECT u.id, u.h FROM {tag}u{k - 1} u
      WHERE NOT EXISTS (SELECT 1 FROM {tag}w{k} w WHERE w.id = u.id)
        AND NOT EXISTS (
          SELECT 1 FROM {tag}sym s JOIN {tag}w{k} w ON w.id = s.dst
          WHERE s.src = u.id
        )
    )"""


def _mi_mis_union(tag: str) -> str:
    return " UNION ALL ".join(
        f"SELECT id FROM {tag}w{k}" for k in range(1, _MI_ROUNDS + 1)
    )




# Dirty-cone adjacency pruning (round 15, verdict item 3): once the
# cascade's dirty set is this small, its ids are collected (a ~ms Arrow
# pull of a checkpointed relation) and the round's two adjacency scans
# filter ``src IN (ids)`` FIRST — the adjacency is persisted sorted by
# src, so the InMemoryTableScan's per-batch min/max stats skip every
# cached batch outside the cone instead of streaming all of symf per
# round.  The literal list is capped so the filter expression stays
# trivial; above the cap (the seed round) the full scan is the honest
# cost.
_CONE_PRUNE_MAX = 1024


def _cone_ids(dirty: DataFrame, n_dirty: int) -> "list[int] | None":
    if not (0 < n_dirty <= _CONE_PRUNE_MAX):
        return None
    return [int(v) for v in dirty.select("id").toPandas()["id"]]


def _mis_warm_repair(spark, adj: DataFrame, dirty: DataFrame, n_dirty: int):
    """Shared warm-phase cascade for the vertex-side (MIS) repair
    entries: relax vertex statuses from the dirty seed until the
    unique priority-DAG fixpoint, returning the ``(delta, n_delta)``
    (id, s) status-override relation.  ``adj`` is the once-persisted
    (src-sorted-within-partitions) adjacency-with-neighbor-status
    relation (src, nid, nh, ns) over the POST-CHANGE graph (appended
    for the incremental entry, pruned for the decremental one);
    ``dirty`` carries (id, h, s) seed rows.  Extracted from
    graph_mis_incremental (round 14) so the edge-DELETION repair
    shares the loop.
    """
    delta = spark.createDataFrame([], "id long, s boolean")
    n_delta = 0
    # NOTE (round 13, measured): a driver-local cascade with lazy
    # adjacency fetches was tried here and REVERTED — MIS judging
    # needs each dirty vertex's neighbor list, and collecting hub
    # adjacency to the driver cost more than the distributed rounds
    # it saved (sf1 wall 48.6 -> 74.6 s).  Matching keeps its local
    # path because its judging reads only per-vertex matched-state.
    cone = _cone_ids(dirty, n_dirty)
    while n_dirty > 0:
        # The cascade cone: both of this round's adjacency consumers
        # (the blocked() probe over `dirty` and the propagation over
        # `changed` ⊆ `dirty`) read only rows with src in the dirty
        # set, so the batch-pruned slice is exact.
        adjr = (
            adj.filter(F.col("src").isin(cone)) if cone is not None else adj
        )
        # Recompute each dirty vertex from its strictly-higher-priority
        # neighbors' effective statuses (base overlaid with delta).
        nb = adjr.join(
            _mis_side(
                dirty.select(
                    F.col("id").alias("d"),
                    F.col("h").alias("dh"),
                    F.col("s").alias("dscur"),
                ),
                n_dirty,
            ),
            adj.src == F.col("d"),
        ).join(
            _mis_side(
                delta.select(
                    F.col("id").alias("nid"), F.col("s").alias("dls")
                ),
                n_delta,
            ),
            "nid",
            "left",
        )
        blocked = (
            nb.filter(
                F.coalesce(F.col("dls"), F.col("ns"))
                & (
                    F.struct(F.col("nh"), F.col("nid"))
                    < F.struct(F.col("dh"), F.col("d"))
                )
            )
            .select("d")
            .distinct()
        )
        changed = (
            dirty.join(
                _mis_side(blocked, n_dirty), dirty.id == blocked.d, "left"
            )
            .withColumn("s_new", F.col("d").isNull())
            .filter(F.col("s_new") != F.col("s"))
            .select("id", "h", F.col("s_new").alias("s"))
            .localCheckpoint(eager=True)
        )
        n_changed = changed.count()
        if n_changed == 0:
            break
        # The overlay is referenced twice per round (blocked + dirty
        # rebuild), so it stays eager-checkpointed — a lazy chain was
        # tried (round 14) and re-evaluated k nested broadcast builds
        # per reference, quadratic in rounds.  Only the per-round
        # delta.count() is dropped: n_delta becomes an upper BOUND
        # (sum of flip counts; a vertex flipping twice counts twice),
        # which is only ever used for the size-switched broadcast
        # decision — conservative is correct.
        delta = (
            delta.join(changed.select("id"), "id", "left_anti")
            .unionByName(changed.select("id", "s"))
            .localCheckpoint(eager=True)
        )
        n_delta += n_changed
        # Propagate: strictly-lower-priority neighbors of every flip
        # become the next dirty set (their dependency just changed).
        cand = (
            adjr.join(
                _mis_side(
                    changed.select(
                        F.col("id").alias("c"), F.col("h").alias("ch")
                    ),
                    n_changed,
                ),
                adjr.src == F.col("c"),
            )
            .filter(
                F.struct(F.col("nh"), F.col("nid"))
                > F.struct(F.col("ch"), F.col("c"))
            )
            .select(
                F.col("nid").alias("id"),
                F.col("nh").alias("h"),
                F.col("ns").alias("sb"),
            )
            .distinct()
        )
        dirty = (
            cand.join(
                _mis_side(
                    delta.select(F.col("id").alias("id"), F.col("s").alias("dls")),
                    n_delta,
                ),
                "id",
                "left",
            )
            .select(
                "id", "h", F.coalesce(F.col("dls"), F.col("sb")).alias("s")
            )
            .localCheckpoint(eager=True)
        )
        n_dirty = dirty.count()
        cone = _cone_ids(dirty, n_dirty)
    return delta, n_delta


@register(
    "graph_mis_incremental",
    oracle=f"""
    WITH {ENTITY_EDGES_SQL},
    fsym AS MATERIALIZED (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    bsym AS MATERIALIZED (
      SELECT src, dst FROM fsym WHERE (src + dst) % {_MI_MOD} <> 0
    ),
    fu0 AS MATERIALIZED (
      SELECT DISTINCT src AS id,
        ('0x' || substr(md5('mis' || src), 1, 12))::BIGINT AS h
      FROM fsym
    ),
    bu0 AS MATERIALIZED (
      SELECT DISTINCT src AS id,
        ('0x' || substr(md5('mis' || src), 1, 12))::BIGINT AS h
      FROM bsym
    ),
    {",".join(_mi_round_sql("b", k) for k in range(1, _MI_ROUNDS + 1))},
    {",".join(_mi_round_sql("f", k) for k in range(1, _MI_ROUNDS + 1))},
    bmis AS MATERIALIZED ({_mi_mis_union("b")}),
    fmis AS MATERIALIZED ({_mi_mis_union("f")}),
    flips AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT id FROM bmis WHERE id NOT IN (SELECT id FROM fmis)
        UNION ALL
        SELECT id FROM fmis WHERE id NOT IN (SELECT id FROM bmis)
      )
    ),
    indep AS (
      SELECT CAST(count(*) AS BIGINT) AS viol
      FROM fsym s JOIN fmis a ON a.id = s.src JOIN fmis b ON b.id = s.dst
    ),
    uncov AS (
      SELECT CAST(count(*) AS BIGINT) AS viol
      FROM fu0 v
      WHERE NOT EXISTS (SELECT 1 FROM fmis m WHERE m.id = v.id)
        AND NOT EXISTS (
          SELECT 1 FROM fsym s JOIN fmis m ON m.id = s.dst
          WHERE s.src = v.id
        )
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM fu0) AS n_vertices,
      (SELECT CAST(count(*) AS BIGINT) FROM edges
        WHERE (src + dst) % {_MI_MOD} <> 0) AS n_base_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM edges
        WHERE (src + dst) % {_MI_MOD} = 0) AS n_batch_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM bmis) AS base_mis_size,
      (SELECT CAST(sum(id) AS BIGINT) FROM bmis) AS base_sum_ids,
      (SELECT CAST(count(*) AS BIGINT) FROM fmis) AS warm_mis_size,
      (SELECT CAST(sum(id) AS BIGINT) FROM fmis) AS warm_sum_ids,
      (SELECT n FROM flips) AS n_flipped,
      (SELECT viol FROM indep) = 0 AS independent,
      (SELECT viol FROM uncov) = 0 AS maximal,
      (SELECT count(*) FROM bu{_MI_ROUNDS})
        + (SELECT count(*) FROM fu{_MI_ROUNDS}) = 0 AS converged
    """,
    doc="INCREMENTAL MIS REPAIR — the symmetry-breaking member of the "
    "incremental family (graph_cc_incremental, "
    "graph_pagerank_incremental, graph_triangle_delta, ivf_append): "
    f"split the entity graph into a base graph and the ~{100 // _MI_MOD}% "
    f"'appended' batch ((src + dst) % {_MI_MOD} == 0), run the "
    "fixed-priority MIS kernel cold on the base, then REPAIR after the "
    "append by priority-DAG cascade relaxation instead of recomputing: "
    "only vertices whose dependency set changed (batch endpoints, then "
    "lower-priority neighbors of every status flip) are ever "
    "recomputed, so per-round exchanged work is bounded by the "
    "batch's cascade cone, not |V|. The scope pin the general "
    "lexicographic-first result demands: the repaired fixpoint equals "
    "the COLD greedy MIS of the appended graph exactly — the cascade "
    "recomputation is evaluation-order-free because each vertex's "
    "status is a pure function of its strictly-higher-priority "
    "neighbors (a DAG), so chaotic relaxation converges to the unique "
    "fixpoint; the oracle VALUE-CHECKS this by computing the warm "
    "columns as the cold unrolled MIS of the appended graph. Output: "
    "base/warm sizes and membership checksums, the flip count "
    "(|base MIS symmetric-difference warm MIS| — the cascade's "
    "footprint), and the independence/maximality proofs on the "
    "appended graph, all computed on both engines. The repair-"
    "locality claim (dirty cone shrinks geometrically, warm rounds "
    "see a small fraction of |V|) is pinned by the pure-Python replay "
    "in tests/test_round13_graph.py. Scale shape: base phase is the "
    "shared kernel (once-partitioned sym, broadcast frontiers, "
    "driver-local tail); warm rounds scan the once-checkpointed "
    "src-partitioned adjacency-with-status relation against a "
    "broadcast dirty set — zero exchange in the broadcast regime "
    "beyond the cone-bounded distincts.",
)
def graph_mis_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T
    from graphdatabases_spark.relational.graph_kernels import _mis_side

    edges = entity_edges(spark, sf, dedup=True).localCheckpoint(eager=True)
    is_batch = ((F.col("src") + F.col("dst")) % _MI_MOD) == 0
    # One pass for both edge counts (round 14; was two full scans).
    ecounts = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(is_batch, 1)).alias("nb"),
    ).collect()[0]
    n_batch_edges = ecounts["nb"]
    n_base_edges = ecounts["n"] - n_batch_edges
    mis_h = lambda c: T.portable_hash64(  # noqa: E731
        F.concat(F.lit("mis"), c.cast("string"))
    )
    fverts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("h", mis_h(F.col("id")))
        .localCheckpoint(eager=True)
    )
    n_vertices = fverts.count()
    # persist, NOT localCheckpoint (round 14 — the _sym_und_build
    # finding applied here too): a checkpointed frame reports
    # UnknownPartitioning, so every kernel round's groupBy(src) would
    # plan a fresh full exchange of the symmetric relation; the cached
    # InMemoryRelation keeps hashpartitioning visible and those
    # exchanges vanish.  Unpersisted after the maximality proof (the
    # last consumer).
    symf = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(_sym_partition_key(n_vertices))
        .persist()
    )
    # Base phase: cold kernel on the pre-append graph (the persisted
    # prior result an incremental pipeline would read back).
    symb = symf.filter(((F.col("src") + F.col("dst")) % _MI_MOD) != 0)
    bverts = (
        symb.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("h", mis_h(F.col("id")))
        .localCheckpoint(eager=True)
    )
    n_bverts = bverts.count()
    base_mis = _mis_kernel(spark, symb, bverts, n_bverts, None)
    base_row = base_mis.agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum("id").cast("long").alias("cks"),
    ).collect()[0]
    # Warm phase: statuses = base MIS membership (batch-new vertices
    # start false), adjacency-with-neighbor-status checkpointed ONCE.
    fstat = (
        fverts.join(
            _mis_side(base_mis.withColumn("s0", F.lit(True)), base_row["sz"]),
            "id",
            "left",
        )
        .select("id", "h", F.coalesce(F.col("s0"), F.lit(False)).alias("s"))
        .localCheckpoint(eager=True)
    )
    # persist + src-sorted-within-partitions (round 15): the warm
    # cascade's late rounds filter src IN (cone) and the cached batch
    # min/max stats then skip everything outside the dirty cone — a
    # localCheckpoint would have no batch stats to prune with.
    adj = (
        symf.join(
            _mis_side(
                fstat.select(
                    F.col("id").alias("dst"),
                    F.col("h").alias("nh"),
                    F.col("s").alias("ns"),
                ),
                n_vertices,
            ),
            "dst",
        )
        .select("src", F.col("dst").alias("nid"), "nh", "ns")
        .sortWithinPartitions("src")
        .persist()
    )
    # Initial dirty set, filtered to endpoints whose VALUE can actually
    # move: a batch-NEW vertex (must compute its own status), or an
    # existing endpoint whose new batch neighbor is base-TRUE with
    # higher priority (only true higher-priority neighbors feed
    # blocked()) — seeding every batch endpoint re-judged ~all of the
    # hub neighborhoods for nothing.
    st = _mis_side(fstat, n_vertices)
    cand = (
        edges.filter(is_batch)
        .join(
            st.select(
                F.col("id").alias("src"),
                F.col("h").alias("sh"),
                F.col("s").alias("ssb"),
            ),
            "src",
        )
        .join(
            st.select(
                F.col("id").alias("dst"),
                F.col("h").alias("dh"),
                F.col("s").alias("dsb"),
            ),
            "dst",
        )
    )
    newv = fverts.select("id").join(
        _mis_side(bverts.select("id"), n_bverts), "id", "left_anti"
    )
    dirty_ids = (
        cand.filter(
            F.col("dsb")
            & (
                F.struct(F.col("dh"), F.col("dst"))
                < F.struct(F.col("sh"), F.col("src"))
            )
        )
        .select(F.col("src").alias("id"))
        .unionByName(
            cand.filter(
                F.col("ssb")
                & (
                    F.struct(F.col("sh"), F.col("src"))
                    < F.struct(F.col("dh"), F.col("dst"))
                )
            ).select(F.col("dst").alias("id"))
        )
        .unionByName(newv)
        .distinct()
    )
    dirty = fstat.join(
        _mis_side(dirty_ids, 2 * n_batch_edges), "id", "left_semi"
    ).localCheckpoint(eager=True)
    n_dirty = dirty.count()
    delta, n_delta = _mis_warm_repair(spark, adj, dirty, n_dirty)
    adj.unpersist()
    final = (
        fstat.join(
            _mis_side(
                delta.select(F.col("id").alias("id"), F.col("s").alias("dls")),
                n_delta,
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce(F.col("dls"), F.col("s")).alias("s"))
        .localCheckpoint(eager=True)
    )
    warm_mis = final.filter(F.col("s")).select("id").localCheckpoint(eager=True)
    warm_row = warm_mis.agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum("id").cast("long").alias("cks"),
    ).collect()[0]
    # Proof joins size-switch-broadcast the (known-count) MIS sides so
    # the persisted symf streams without a sort-merge exchange (r14).
    n_flipped = final.join(
        _mis_side(base_mis.withColumn("s0", F.lit(True)), base_row["sz"]),
        "id",
        "left",
    ).filter(F.col("s") != F.coalesce(F.col("s0"), F.lit(False))).count()
    m_a = warm_mis.select(F.col("id").alias("aid"))
    m_b = warm_mis.select(F.col("id").alias("bid"))
    indep_viol = (
        symf.join(_mis_side(m_a, warm_row["sz"]), symf.src == F.col("aid"))
        .join(_mis_side(m_b, warm_row["sz"]), symf.dst == F.col("bid"))
        .count()
    )
    covered = (
        symf.join(_mis_side(m_b, warm_row["sz"]), symf.dst == F.col("bid"))
        .select(F.col("src").alias("id"))
        .distinct()
    )
    uncov_viol = (
        fverts.select("id")
        .join(warm_mis, "id", "left_anti")
        .join(covered, "id", "left_anti")
        .count()
    )
    symf.unpersist()
    return spark.range(1).select(
        F.lit(n_vertices).cast("long").alias("n_vertices"),
        F.lit(n_base_edges).cast("long").alias("n_base_edges"),
        F.lit(n_batch_edges).cast("long").alias("n_batch_edges"),
        F.lit(base_row["sz"]).cast("long").alias("base_mis_size"),
        F.lit(base_row["cks"]).cast("long").alias("base_sum_ids"),
        F.lit(warm_row["sz"]).cast("long").alias("warm_mis_size"),
        F.lit(warm_row["cks"]).cast("long").alias("warm_sum_ids"),
        F.lit(n_flipped).cast("long").alias("n_flipped"),
        F.lit(indep_viol == 0).alias("independent"),
        F.lit(uncov_viol == 0).alias("maximal"),
        F.lit(True).alias("converged"),
    )


# ---------------------------------------------------------------------------
# Incremental maximal-matching repair (edge-priority cascade on the line graph)
# ---------------------------------------------------------------------------

_MMI_ROUNDS = 10  # oracle unroll per phase (cold fixpoint 5/5/6 measured)


def _mat_cascade_local(
    spark,
    x: DataFrame,
    vstat0: DataFrame,
    dirty_df: DataFrame,
    b: int = 1,
):
    """Driver-local matching cascade with LAZY adjacency fetches: the
    cascade's working state (batch edges, per-vertex true-h lists,
    status overrides) is cone-sized, so run the relaxation in-process
    and pull the endpoint index rows for newly-touched vertices one
    bounded Spark job per round — ~1 job/round instead of the
    distributed loop's ~8 actions/round of scheduling floor.  Exact
    same fixpoint (the pure-Python replay IS this algorithm).  Returns
    the (dsrc, ddst, dls) status-override relation, or ``None`` when a
    fetch would exceed the Arrow collect budget — the guard at the
    call site bounds batch size and base-matching size but NOT vertex
    degree, and a hub endpoint would otherwise pull its entire
    neighborhood to the driver (the same blowup the distributed warm
    path was redesigned to avoid).  Each fetch is therefore counted
    before collecting (as _induced_local does) against a cumulative
    _SYM_LOCAL_EDGE_MAX budget; on breach the caller falls back to the
    distributed relaxation, which reads only per-vertex matched-state
    and is hub-safe by construction.

    ``b`` (round 14): per-vertex capacity — blocked(e at v) is "at
    least b true adjacent edges with smaller h", which for b = 1 is
    exactly the maximal-matching rule; graph_bmatching_incremental
    passes its capacity and an EXPLODED vstat0 (one row per base-true
    h per endpoint), and the same cascade repairs the b-matching."""
    from graphdatabases_spark.relational.graph_kernels import (
        _SYM_LOCAL_EDGE_MAX,
        _ids_df,
    )

    fetched_rows = 0

    vtrue: dict[int, list[int]] = {}
    for r in vstat0.toPandas().itertuples(index=False):
        vtrue.setdefault(int(r.v), []).append(int(r.m1))
    status: dict[tuple[int, int], bool] = {}
    base_s: dict[tuple[int, int], bool] = {}
    hmap: dict[tuple[int, int], int] = {}
    dirty_set: set[tuple[int, int]] = set()
    for r in dirty_df.select("src", "dst", "h", "s").toPandas().itertuples(
        index=False
    ):
        e = (int(r.src), int(r.dst))
        base_s[e] = bool(r.s)
        hmap[e] = int(r.h)
        dirty_set.add(e)
    adj: dict[int, list[tuple[tuple[int, int], int]]] = {}
    fetched: set[int] = set()

    def stat(e):
        return status.get(e, base_s.get(e, False))

    while dirty_set:
        changed = []
        for e in dirty_set:
            he = hmap[e]
            blocked = any(
                sum(1 for hh in vtrue.get(v, ()) if hh < he) >= b for v in e
            )
            ns = not blocked
            if ns != stat(e):
                changed.append((e, ns))
        dirty_set = set()
        if not changed:
            break
        av = set()
        for e, ns in changed:
            status[e] = ns
            av.add(e[0])
            av.add(e[1])
        new_verts = [v for v in av if v not in fetched]
        if new_verts:
            sel = x.join(
                F.broadcast(
                    _ids_df(spark, new_verts).withColumnRenamed("id", "v")
                ),
                "v",
                "left_semi",
            )
            # Degree guard: count before collecting.  The broadcast
            # semi costs no exchange; a rejected probe wastes one scan
            # of the checkpointed index, an accepted one recomputes it
            # straight into Arrow.
            fetched_rows += sel.count()
            if fetched_rows > _SYM_LOCAL_EDGE_MAX:
                return None
            rows = sel.toPandas()
            for rr in rows.itertuples(index=False):
                e = (int(rr.fsrc), int(rr.fdst))
                hmap.setdefault(e, int(rr.fh))
                base_s.setdefault(e, bool(rr.fs))
                adj.setdefault(int(rr.v), []).append((e, hmap[e]))
            fetched.update(new_verts)
        for e, ns in changed:
            he = hmap[e]
            for v in e:
                hs = vtrue.setdefault(v, [])
                old = list(hs)
                if ns:
                    hs.append(he)
                elif he in hs:
                    hs.remove(he)
                for f, hf in adj.get(v, ()):
                    if f == e:
                        continue
                    po = sum(1 for hh in old if hh < hf) >= b
                    pn = sum(1 for hh in hs if hh < hf) >= b
                    if po != pn:
                        # Refined propagation (round 14, fuzz-pinned):
                        # skip f when its VALUE provably cannot change
                        # — f false & newly blocked at v stays false;
                        # f false & unblocked at v but still blocked
                        # at its other endpoint stays false (a later
                        # state change there re-fires po != pn).  All
                        # of this round's status flips were applied
                        # above, so stat(f) is round-consistent — the
                        # pending-read hazard the fuzz caught.  Cut
                        # measured recompute ~5x on the hub-heavy
                        # deletion cascade (SCALE.md round 14).
                        if not stat(f):
                            if pn:
                                continue
                            u = f[0] + f[1] - v
                            if (
                                sum(1 for hh in vtrue.get(u, ()) if hh < hf)
                                >= b
                            ):
                                continue
                        dirty_set.add(f)
    import pandas as pd

    overrides = [
        (e[0], e[1], s)
        for e, s in status.items()
        if s != base_s.get(e, False)
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "dsrc": pd.Series([o[0] for o in overrides], dtype="int64"),
                "ddst": pd.Series([o[1] for o in overrides], dtype="int64"),
                "dls": pd.Series([o[2] for o in overrides], dtype="bool"),
            }
        )
        if overrides
        else pd.DataFrame(
            {"dsrc": pd.Series([], dtype="int64"),
             "ddst": pd.Series([], dtype="int64"),
             "dls": pd.Series([], dtype="bool")}
        )
    ).localCheckpoint(eager=True), len(overrides)


def _line_warm_repair(
    spark,
    x: DataFrame,
    vstat0: DataFrame,
    dirty: DataFrame,
    n_dirty: int,
    n_vstat0: int,
    b: int = 1,
):
    """Shared warm-phase cascade for the line-graph repair entries
    (graph_matching_incremental b = 1, graph_bmatching_incremental
    b = capacity): relax edge statuses from the dirty seed until the
    unique priority-DAG fixpoint, returning the ``(delta, n_delta)``
    status-override relation.  blocked(e at v) = "at least b true
    adjacent edges with smaller h" — a pure function of the strictly-
    higher-priority adjacent edges, so chaotic relaxation converges to
    the cold greedy fixpoint for ANY capacity.  Inputs: ``x`` the
    endpoint index (v, fsrc, fdst, fh, fs), ``vstat0`` the EXPLODED
    base vertex state (one (v, m1) row per base-true h per endpoint —
    <= b rows per vertex at a fixpoint), ``dirty`` the seed edges
    (src, dst, h, s).  Tries the driver-local cascade below the Arrow
    bounds (hub-degree-guarded — bails back here on breach), then the
    distributed relaxation whose per-round joins broadcast the
    cascade-cone-sized side only."""
    delta = spark.createDataFrame([], "dsrc long, ddst long, dls boolean")
    n_delta = 0
    vdelta = spark.createDataFrame([], "v long, hs array<bigint>")
    n_vdelta = 0
    if (
        n_dirty > 0
        and n_dirty <= _SYM_LOCAL_EDGE_MAX
        and n_vstat0 <= _SYM_LOCAL_V_MAX
    ):
        # None = a lazy fetch breached the degree-aware edge budget
        # (hub endpoint); fall through to the distributed path.
        res = _mat_cascade_local(spark, x, vstat0, dirty, b=b)
        if res is not None:
            return res
    if n_dirty == 0:
        return delta, n_delta
    empty_arr = F.array().cast("array<bigint>")
    # Base state as per-vertex sorted arrays (b-safe: the exploded
    # form would fan the judged join out b-fold per endpoint).
    vstat0a = (
        vstat0.groupBy("v")
        .agg(F.array_sort(F.collect_list("m1")).alias("hs0"))
        .localCheckpoint(eager=True)
    )

    def _blocked_at(side: str):
        # blocked at an endpoint: at least b true edges there with
        # h < ours — strict <, so the edge itself never blocks.
        vd = _mis_side(
            vdelta.select(F.col("v").alias(f"{side}v"), F.col("hs").alias(f"{side}hs")),
            n_vdelta,
        )
        v0 = _mis_side(
            vstat0a.select(
                F.col("v").alias(f"{side}v0"), F.col("hs0").alias(f"{side}hs0")
            ),
            n_vstat0,
        )
        return vd, v0

    def _blk(side: str):
        eff = F.coalesce(
            F.col(f"{side}hs"), F.col(f"{side}hs0"), empty_arr
        )
        return F.size(F.filter(eff, lambda hh: hh < F.col("h"))) >= b

    while n_dirty > 0:
        svd, sv0 = _blocked_at("s")
        dvd, dv0 = _blocked_at("d")
        judged = (
            dirty.join(svd, dirty.src == F.col("sv"), "left")
            .join(sv0, dirty.src == F.col("sv0"), "left")
            .join(dvd, dirty.dst == F.col("dv"), "left")
            .join(dv0, dirty.dst == F.col("dv0"), "left")
            .withColumn("blk_s", _blk("s"))
            .withColumn("blk_d", _blk("d"))
            .withColumn("s_new", ~(F.col("blk_s") | F.col("blk_d")))
        )
        changed = (
            judged.filter(F.col("s_new") != F.col("s"))
            .select("src", "dst", "h", F.col("s_new").alias("s"))
            .localCheckpoint(eager=True)
        )
        n_changed = changed.count()
        if n_changed == 0:
            break
        delta = (
            delta.join(
                changed.select(
                    F.col("src").alias("dsrc"), F.col("dst").alias("ddst")
                ),
                ["dsrc", "ddst"],
                "left_anti",
            )
            .unionByName(
                changed.select(
                    F.col("src").alias("dsrc"),
                    F.col("dst").alias("ddst"),
                    F.col("s").alias("dls"),
                )
            )
            .localCheckpoint(eager=True)
        )
        n_delta = delta.count()
        # Vertices whose state changed: recompute their true-edge
        # h-lists from the endpoint index (one broadcast-filtered scan;
        # group sizes are the handful of true edges per vertex), and
        # keep the OLD list alongside for the propagation filter.
        av = (
            changed.select(F.col("src").alias("v"))
            .unionByName(changed.select(F.col("dst").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_av = av.count()
        trues = (
            x.join(_mis_side(av, n_av), "v")
            .join(
                _mis_side(delta, n_delta),
                (F.col("fsrc") == F.col("dsrc"))
                & (F.col("fdst") == F.col("ddst")),
                "left",
            )
            .filter(F.coalesce(F.col("dls"), F.col("fs")))
            .groupBy("v")
            .agg(F.array_sort(F.collect_list("fh")).alias("hs"))
        )
        av_states = (
            av.join(trues, "v", "left")
            .join(_mis_side(vdelta.withColumnRenamed("hs", "ohs"), n_vdelta), "v", "left")
            .join(
                _mis_side(
                    vstat0a.select(F.col("v").alias("v"), F.col("hs0").alias("ohs0")),
                    n_vstat0,
                ),
                "v",
                "left",
            )
            .select(
                "v",
                F.coalesce(F.col("hs"), empty_arr).alias("nhs"),
                F.coalesce(F.col("ohs"), F.col("ohs0"), empty_arr).alias("ohs"),
            )
            .localCheckpoint(eager=True)
        )
        vdelta = (
            vdelta.join(av_states.select("v"), "v", "left_anti")
            .unionByName(av_states.select("v", F.col("nhs").alias("hs")))
            .localCheckpoint(eager=True)
        )
        n_vdelta = vdelta.count()
        # Next dirty set: edges at a state-changed vertex whose
        # blocking predicate ACTUALLY flips there (count-below-b
        # against the old vs new true-h list differs) — without this
        # filter a hub's single state change re-dirtied its whole
        # neighborhood.  Refined further (round 14, fuzz-pinned +
        # replay-pinned): an edge whose VALUE provably cannot change
        # is skipped — currently-false f that became MORE blocked at
        # v stays false; currently-false f unblocked at v but still
        # blocked at its OTHER endpoint (under the post-round state)
        # stays false, and a later state change there re-fires
        # po != pn.  delta/vdelta already carry this round's flips,
        # so every predicate below reads a round-consistent snapshot.
        # Cut measured recompute from ~30% to ~4% of |E| on the
        # hub-heavy deletion cascade (SCALE.md round 14).
        dirty = (
            x.join(_mis_side(av_states, n_av), "v")
            .withColumn(
                "po",
                F.size(F.filter(F.col("ohs"), lambda hh: hh < F.col("fh"))) >= b,
            )
            .withColumn(
                "pn",
                F.size(F.filter(F.col("nhs"), lambda hh: hh < F.col("fh"))) >= b,
            )
            .filter(F.col("po") != F.col("pn"))
            .join(
                _mis_side(delta, n_delta),
                (F.col("fsrc") == F.col("dsrc"))
                & (F.col("fdst") == F.col("ddst")),
                "left",
            )
            .withColumn("scur", F.coalesce(F.col("dls"), F.col("fs")))
            .withColumn("ov", F.col("fsrc") + F.col("fdst") - F.col("v"))
            .join(
                _mis_side(
                    vdelta.select(
                        F.col("v").alias("ov"), F.col("hs").alias("uhs")
                    ),
                    n_vdelta,
                ),
                "ov",
                "left",
            )
            .join(
                _mis_side(
                    vstat0a.select(
                        F.col("v").alias("ov"), F.col("hs0").alias("uhs0")
                    ),
                    n_vstat0,
                ),
                "ov",
                "left",
            )
            .withColumn(
                "ublk",
                F.size(
                    F.filter(
                        F.coalesce(F.col("uhs"), F.col("uhs0"), empty_arr),
                        lambda hh: hh < F.col("fh"),
                    )
                )
                >= b,
            )
            .filter(F.col("scur") | (~F.col("pn") & ~F.col("ublk")))
            .select(
                F.col("fsrc").alias("src"),
                F.col("fdst").alias("dst"),
                F.col("fh").alias("h"),
                F.col("scur").alias("s"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_dirty = dirty.count()
    return delta, n_delta


def _mmi_round_sql(tag: str, k: int) -> str:
    """One fixed-priority matching round over ``{tag}g{k-1}``
    (graph_matching_greedy's _mm_round_sql parameterized by prefix for
    the base/appended side-by-side unroll)."""
    return f"""
    {tag}vm{k} AS MATERIALIZED (
      SELECT v, min(h) AS mh FROM (
        SELECT src AS v, h FROM {tag}g{k - 1}
        UNION ALL SELECT dst, h FROM {tag}g{k - 1}
      ) GROUP BY v
    ),
    {tag}m{k} AS MATERIALIZED (
      SELECT e.src, e.dst, e.h FROM {tag}g{k - 1} e
      JOIN {tag}vm{k} a ON a.v = e.src AND a.mh = e.h
      JOIN {tag}vm{k} b ON b.v = e.dst AND b.mh = e.h
    ),
    {tag}mv{k} AS MATERIALIZED (
      SELECT src AS v FROM {tag}m{k} UNION SELECT dst FROM {tag}m{k}
    ),
    {tag}g{k} AS MATERIALIZED (
      SELECT e.src, e.dst, e.h FROM {tag}g{k - 1} e
      WHERE NOT EXISTS (SELECT 1 FROM {tag}mv{k} x WHERE x.v = e.src)
        AND NOT EXISTS (SELECT 1 FROM {tag}mv{k} x WHERE x.v = e.dst)
    )"""


def _mmi_mat_union(tag: str) -> str:
    return " UNION ALL ".join(
        f"SELECT src, dst FROM {tag}m{k}" for k in range(1, _MMI_ROUNDS + 1)
    )


@register(
    "graph_matching_incremental",
    oracle=f"""
    WITH {ENTITY_EDGES_SQL},
    fg0 AS MATERIALIZED (
      SELECT src, dst,
        ('0x' || substr(md5('mat' || src || ':' || dst), 1, 12))::BIGINT
          * 32768 + (src * 31 + dst) % 32768 AS h
      FROM edges
    ),
    bg0 AS MATERIALIZED (
      SELECT src, dst, h FROM fg0 WHERE (src + dst) % {_MI_MOD} <> 0
    ),
    {",".join(_mmi_round_sql("b", k) for k in range(1, _MMI_ROUNDS + 1))},
    {",".join(_mmi_round_sql("f", k) for k in range(1, _MMI_ROUNDS + 1))},
    bmat AS MATERIALIZED ({_mmi_mat_union("b")}),
    fmat AS MATERIALIZED ({_mmi_mat_union("f")}),
    changes AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT src, dst FROM bmat
        EXCEPT SELECT src, dst FROM fmat
        UNION ALL
        (SELECT src, dst FROM fmat EXCEPT SELECT src, dst FROM bmat)
      )
    ),
    conflict AS (
      SELECT CAST(count(*) AS BIGINT) AS viol FROM (
        SELECT v FROM (
          SELECT src AS v FROM fmat UNION ALL SELECT dst FROM fmat
        ) GROUP BY v HAVING count(*) > 1
      )
    ),
    fmv AS MATERIALIZED (
      SELECT src AS v FROM fmat UNION SELECT dst FROM fmat
    ),
    freeedge AS (
      SELECT CAST(count(*) AS BIGINT) AS viol FROM fg0 e
      WHERE NOT EXISTS (SELECT 1 FROM fmv x WHERE x.v = e.src)
        AND NOT EXISTS (SELECT 1 FROM fmv x WHERE x.v = e.dst)
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM fg0) AS n_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM bg0) AS n_base_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM fg0
        WHERE (src + dst) % {_MI_MOD} = 0) AS n_batch_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM bmat) AS base_matching_size,
      (SELECT CAST(sum(src + dst) AS BIGINT) FROM bmat) AS base_sum_ids,
      (SELECT CAST(count(*) AS BIGINT) FROM fmat) AS warm_matching_size,
      (SELECT CAST(sum(src + dst) AS BIGINT) FROM fmat) AS warm_sum_ids,
      (SELECT n FROM changes) AS n_changed_edges,
      (SELECT viol FROM conflict) = 0 AS is_matching,
      (SELECT viol FROM freeedge) = 0 AS maximal,
      (SELECT count(*) FROM bg{_MMI_ROUNDS})
        + (SELECT count(*) FROM fg{_MMI_ROUNDS}) = 0 AS converged
    """,
    doc="INCREMENTAL MAXIMAL-MATCHING REPAIR — graph_mis_incremental's "
    "edge-side sibling, completing the incremental family on both "
    "symmetry-breaking kernels: same base/batch split "
    f"((src + dst) % {_MI_MOD} == 0, ~{100 // _MI_MOD}%), cold "
    "fixed-priority greedy matching on the base graph, then repair by "
    "cascade relaxation on the LINE graph: an edge's membership is a "
    "pure function of its strictly-higher-priority adjacent edges (a "
    "DAG on the unique (h, src, dst) priorities), so recomputing only "
    "edges whose dependency changed — batch edges and edges at their "
    "endpoints first, then lower-priority adjacent edges of every "
    "membership flip — converges to the unique cold fixpoint of the "
    "appended graph, which the oracle value-checks by unrolling the "
    "cold rounds on both graphs. The kicked-match cascade (an "
    "appended edge steals an endpoint, freeing a vertex whose next "
    "edge re-matches, possibly stealing again) is exactly the flip "
    "propagation. Output: base/warm sizes and endpoint checksums, "
    "|base symmetric-difference warm| as the cascade footprint, and "
    "the matching + maximality proofs on the appended graph. Scale "
    "shape: base phase is the shared argmin-edge kernel; the warm "
    "rounds never expand adjacency — blocked(e) reads a per-VERTEX "
    "matched-state (the sorted h-list of currently-true edges at the "
    "endpoint: <= 1 at any fixpoint, a few transiently), joined as a "
    "size-switched broadcast, so per-round exchanged rows are the "
    "cascade cone's edges, not its degree sum (the audit-caught hub "
    "blowup of the naive line-graph recompute).",
)
def graph_matching_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T
    from graphdatabases_spark.relational.graph_kernels import (
        _matching_kernel,
        _mis_side,
    )

    g = (
        entity_edges(spark, sf, dedup=True)
        .withColumn(
            "h",
            T.portable_hash64(
                F.concat(
                    F.lit("mat"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                )
            )
            * F.lit(32768)
            + (F.col("src") * 31 + F.col("dst")) % 32768,
        )
        .localCheckpoint(eager=True)
    )
    is_batch = ((F.col("src") + F.col("dst")) % _MI_MOD) == 0
    # One pass for both edge counts (round 14; was two full scans).
    _gc = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(is_batch, 1)).alias("nb"),
    ).collect()[0]
    n_edges, n_batch_edges = _gc["n"], _gc["nb"]
    g_base = g.filter(~is_batch).localCheckpoint(eager=True)
    mat_base = _matching_kernel(spark, g_base, n_edges - n_batch_edges)
    base_row = mat_base.agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum(F.col("src") + F.col("dst")).cast("long").alias("cks"),
    ).collect()[0]
    # Edge-status relation (s = base membership; batch edges false) and
    # its endpoint index, checkpointed once.  The base matching is a
    # size-switched broadcast (<= |V|/2 rows, count known) so the
    # status join never exchanges g; the endpoint index skips the
    # v-repartition entirely — every per-round consumer broadcasts the
    # dirty side, so a 2|E| exchange would buy nothing (audit catch:
    # it was 850 MB of the entry's sf1 shuffle).
    estat = (
        g.join(
            _mis_side(mat_base.withColumn("s0", F.lit(True)), base_row["sz"]),
            ["src", "dst"],
            "left",
        )
        .select(
            "src", "dst", "h", F.coalesce(F.col("s0"), F.lit(False)).alias("s")
        )
        .localCheckpoint(eager=True)
    )
    x = (
        estat.select(
            F.col("src").alias("v"),
            F.col("src").alias("fsrc"),
            F.col("dst").alias("fdst"),
            F.col("h").alias("fh"),
            F.col("s").alias("fs"),
        )
        .unionByName(
            estat.select(
                F.col("dst").alias("v"),
                F.col("src").alias("fsrc"),
                F.col("dst").alias("fdst"),
                F.col("h").alias("fh"),
                F.col("s").alias("fs"),
            )
        )
        .localCheckpoint(eager=True)
    )
    # Initial dirty set: the BATCH EDGES ONLY.  A new edge enters with
    # status false, and blocked() reads only TRUE adjacent edges — so
    # existing edges stay consistent until some flip actually reaches
    # them (the first version seeded every edge at a batch endpoint
    # and the hub degrees made that ~all of the graph).
    dirty = estat.filter(is_batch).localCheckpoint(eager=True)
    n_dirty = dirty.count()
    # Per-VERTEX matched-state instead of per-edge adjacency scans
    # (second audit catch: the line-graph recompute join emitted
    # sum-of-degrees rows over the dirty set — hub degrees made that
    # 2.9 GB of sf1 shuffle).  blocked(e) only needs, per endpoint,
    # whether some OTHER matched edge there has smaller h, i.e. the
    # sorted h-list of currently-true edges at the vertex: <= 1 at any
    # fixpoint (it's a matching), <= a few transiently.  vstat0 is the
    # base state (one row per base-matched endpoint); vdelta overlays
    # the vertices the cascade touched.  All recompute joins broadcast
    # the vertex-state side — no adjacency expansion anywhere.
    vstat0 = (
        estat.filter(F.col("s"))
        .select(F.col("src").alias("v"), F.col("h").alias("m1"))
        .unionByName(
            estat.filter(F.col("s")).select(
                F.col("dst").alias("v"), F.col("h").alias("m1")
            )
        )
        .localCheckpoint(eager=True)
    )
    n_vstat0 = 2 * base_row["sz"]
    # Warm phase: the shared line-graph cascade (b = 1 is the
    # maximal-matching rule) — driver-local below the Arrow bounds
    # with the hub-degree bail, distributed relaxation above.
    delta, n_delta = _line_warm_repair(
        spark, x, vstat0, dirty, n_dirty, n_vstat0, b=1
    )
    final = (
        estat.join(
            _mis_side(delta, n_delta),
            (estat.src == F.col("dsrc")) & (estat.dst == F.col("ddst")),
            "left",
        )
        .select(
            "src", "dst",
            F.coalesce(F.col("dls"), F.col("s")).alias("sf"),
            F.col("s").alias("sb"),
        )
        .localCheckpoint(eager=True)
    )
    warm_mat = final.filter(F.col("sf")).select("src", "dst").localCheckpoint(
        eager=True
    )
    warm_row = warm_mat.agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum(F.col("src") + F.col("dst")).cast("long").alias("cks"),
    ).collect()[0]
    n_changed_edges = final.filter(F.col("sf") != F.col("sb")).count()
    mv = (
        warm_mat.select(F.col("src").alias("v"))
        .unionByName(warm_mat.select(F.col("dst").alias("v")))
        .localCheckpoint(eager=True)
    )
    conflict = mv.groupBy("v").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") > 1
    ).count()
    n_mv = 2 * warm_row["sz"]
    free_viol = (
        g.join(
            _mis_side(mv, n_mv).withColumnRenamed("v", "xsrc"),
            g.src == F.col("xsrc"),
            "left_anti",
        )
        .join(
            _mis_side(mv, n_mv).withColumnRenamed("v", "xdst"),
            F.col("dst") == F.col("xdst"),
            "left_anti",
        )
        .count()
    )
    return spark.range(1).select(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(n_edges - n_batch_edges).cast("long").alias("n_base_edges"),
        F.lit(n_batch_edges).cast("long").alias("n_batch_edges"),
        F.lit(base_row["sz"]).cast("long").alias("base_matching_size"),
        F.lit(base_row["cks"]).cast("long").alias("base_sum_ids"),
        F.lit(warm_row["sz"]).cast("long").alias("warm_matching_size"),
        F.lit(warm_row["cks"]).cast("long").alias("warm_sum_ids"),
        F.lit(n_changed_edges).cast("long").alias("n_changed_edges"),
        F.lit(conflict == 0).alias("is_matching"),
        F.lit(free_viol == 0).alias("maximal"),
        F.lit(True).alias("converged"),
    )


# ---------------------------------------------------------------------------
# Incremental b-matching repair (capacity cascade on the line graph)
# ---------------------------------------------------------------------------

_BMI_ROUNDS = 8  # oracle unroll per phase (converged guard; the cold
                 # b-matching fixpoint measured 3/4/5 rounds at the 3
                 # sfs — the base split shifts it by at most one)


def _bmi_round_sql(tag: str, k: int) -> str:
    """One b-matching round over ``{tag}g{k-1}`` / ``{tag}cap{k-1}``
    (graph_bmatching_greedy's _bm_round_sql parameterized by prefix for
    the base/appended side-by-side unroll)."""
    return f"""
    {tag}ex{k} AS MATERIALIZED (
      SELECT v, src, dst, p,
        row_number() OVER (PARTITION BY v ORDER BY p, src, dst) AS rk
      FROM (
        SELECT src AS v, src, dst, p FROM {tag}g{k - 1}
        UNION ALL SELECT dst, src, dst, p FROM {tag}g{k - 1}
      )
    ),
    {tag}w{k} AS MATERIALIZED (
      SELECT e.src, e.dst, e.p, e.w FROM {tag}g{k - 1} e
      JOIN {tag}ex{k} a ON a.v = e.src AND a.src = e.src AND a.dst = e.dst
      JOIN {tag}cap{k - 1} ca ON ca.v = e.src AND a.rk <= ca.c
      JOIN {tag}ex{k} b ON b.v = e.dst AND b.src = e.src AND b.dst = e.dst
      JOIN {tag}cap{k - 1} cb ON cb.v = e.dst AND b.rk <= cb.c
    ),
    {tag}cap{k} AS MATERIALIZED (
      SELECT c.v, c.c - coalesce(wn.n, 0) AS c FROM {tag}cap{k - 1} c
      LEFT JOIN (
        SELECT v, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT src AS v FROM {tag}w{k} UNION ALL SELECT dst FROM {tag}w{k}
        ) GROUP BY v
      ) wn ON wn.v = c.v
    ),
    {tag}g{k} AS MATERIALIZED (
      SELECT e.src, e.dst, e.p, e.w FROM {tag}g{k - 1} e
      JOIN {tag}cap{k} cs ON cs.v = e.src AND cs.c > 0
      JOIN {tag}cap{k} cd ON cd.v = e.dst AND cd.c > 0
      WHERE NOT EXISTS (
        SELECT 1 FROM {tag}w{k} x WHERE x.src = e.src AND x.dst = e.dst
      )
    )"""


def _bmi_mat_union(tag: str) -> str:
    return " UNION ALL ".join(
        f"SELECT src, dst, w FROM {tag}w{k}" for k in range(1, _BMI_ROUNDS + 1)
    )


def _bmi_oracle() -> str:
    from graphdatabases_spark.relational.graph_symmetry_queries import (
        _BM_B,
        _BM_P48,
    )

    return f"""
    WITH {ENTITY_EDGES_SQL},
    fug0 AS MATERIALIZED (
      SELECT src, dst,
        (100 - ((src * 7 + dst * 13) % 100 + 1)) * {_BM_P48}
          + ('0x' || substr(md5('bmat' || src || ':' || dst), 1, 12))::BIGINT
          AS p,
        (src * 7 + dst * 13) % 100 + 1 AS w
      FROM edges
    ),
    bag0 AS MATERIALIZED (
      SELECT src, dst, p, w FROM fug0 WHERE (src + dst) % {_MI_MOD} <> 0
    ),
    fucap0 AS MATERIALIZED (
      SELECT DISTINCT v, CAST({_BM_B} AS BIGINT) AS c FROM (
        SELECT src AS v FROM fug0 UNION ALL SELECT dst FROM fug0
      )
    ),
    bacap0 AS MATERIALIZED (
      SELECT DISTINCT v, CAST({_BM_B} AS BIGINT) AS c FROM (
        SELECT src AS v FROM bag0 UNION ALL SELECT dst FROM bag0
      )
    ),
    {",".join(_bmi_round_sql("ba", k) for k in range(1, _BMI_ROUNDS + 1))},
    {",".join(_bmi_round_sql("fu", k) for k in range(1, _BMI_ROUNDS + 1))},
    bamat AS MATERIALIZED ({_bmi_mat_union("ba")}),
    fumat AS MATERIALIZED ({_bmi_mat_union("fu")}),
    changes AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT src, dst FROM bamat
        EXCEPT SELECT src, dst FROM fumat
        UNION ALL
        (SELECT src, dst FROM fumat EXCEPT SELECT src, dst FROM bamat)
      )
    ),
    fudeg AS MATERIALIZED (
      SELECT v, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT src AS v FROM fumat UNION ALL SELECT dst FROM fumat
      ) GROUP BY v
    ),
    overcap AS (
      SELECT CAST(count(*) AS BIGINT) AS viol FROM fudeg WHERE n > {_BM_B}
    ),
    maxviol AS (
      SELECT CAST(count(*) AS BIGINT) AS viol FROM fug0 e
      WHERE NOT EXISTS (
          SELECT 1 FROM fumat x WHERE x.src = e.src AND x.dst = e.dst
        )
        AND coalesce((SELECT n FROM fudeg WHERE v = e.src), 0) < {_BM_B}
        AND coalesce((SELECT n FROM fudeg WHERE v = e.dst), 0) < {_BM_B}
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM fug0) AS n_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM bag0) AS n_base_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM fug0
        WHERE (src + dst) % {_MI_MOD} = 0) AS n_batch_edges,
      CAST({_BM_B} AS INT) AS b,
      (SELECT CAST(count(*) AS BIGINT) FROM bamat) AS base_bmatch_size,
      (SELECT CAST(sum(w) AS BIGINT) FROM bamat) AS base_total_weight,
      (SELECT CAST(sum(src + dst) AS BIGINT) FROM bamat) AS base_sum_ids,
      (SELECT CAST(count(*) AS BIGINT) FROM fumat) AS warm_bmatch_size,
      (SELECT CAST(sum(w) AS BIGINT) FROM fumat) AS warm_total_weight,
      (SELECT CAST(sum(src + dst) AS BIGINT) FROM fumat) AS warm_sum_ids,
      (SELECT n FROM changes) AS n_changed_edges,
      (SELECT viol FROM overcap) = 0 AS feasible,
      (SELECT viol FROM maxviol) = 0 AS maximal,
      (SELECT count(*) FROM bag{_BMI_ROUNDS})
        + (SELECT count(*) FROM fug{_BMI_ROUNDS}) = 0 AS converged
    """


@register(
    "graph_bmatching_incremental",
    oracle=_bmi_oracle(),
    doc="INCREMENTAL b-MATCHING REPAIR — the CAPACITY member of the "
    "incremental family (round-14 queue #1), generalizing "
    "graph_matching_incremental's line-graph cascade from a single "
    "matched-h per endpoint to per-vertex capacity b: an edge is "
    "accepted iff at BOTH endpoints fewer than b accepted edges have "
    "smaller (weight-majored) priority — a pure function of the "
    "strictly-higher-priority adjacent edges, so the same priority-DAG "
    "chaotic relaxation converges to the unique cold fixpoint of the "
    "appended graph, which the oracle value-checks by unrolling the "
    "cold b-suitor rounds on base and appended graphs side by side. "
    "Same base/batch split ((src + dst) % 20 == 0, ~5%), cold phase = "
    "the shared _bmatching_kernel on the base edges, warm phase = the "
    "shared _line_warm_repair cascade with b = 3: dirty seed is the "
    "BATCH EDGES ONLY (they enter with no capacity claim — the "
    "round-13 93%-dirty lesson applied from day one), flips propagate "
    "only to adjacent edges whose count-below-b predicate actually "
    "changes. Output: base/warm sizes, total weights and endpoint "
    "checksums, the changed-edge count (|base Δ warm| — the cascade's "
    "footprint), and the b-FEASIBILITY (no vertex over capacity) and "
    "MAXIMALITY (no rejected edge with spare capacity at both ends) "
    "proofs on the appended graph, computed independently on both "
    "engines. Scale shape: cold phase is the rank<=cap round kernel "
    "(per-round one 2|g|-row map-side-combinable window over the "
    "shrinking undecided set); warm rounds broadcast only the "
    "cascade-cone-sized dirty/state sides against the once-"
    "checkpointed endpoint index — per-vertex state is the <= b "
    "true-h array, never hub adjacency; the driver-local cascade is "
    "degree-guarded (counts each lazy fetch against the Arrow budget "
    "and bails to the distributed path on a hub breach).",
)
def graph_bmatching_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T
    from graphdatabases_spark.relational.graph_kernels import (
        _bmatching_kernel,
    )
    from graphdatabases_spark.relational.graph_symmetry_queries import (
        _BM_B,
        _BM_P48,
    )

    w_expr = (F.col("src") * 7 + F.col("dst") * 13) % 100 + 1
    g = (
        entity_edges(spark, sf, dedup=True)
        .withColumn("w", w_expr.cast("long"))
        .withColumn(
            "h",
            (100 - F.col("w")) * F.lit(_BM_P48)
            + T.portable_hash64(
                F.concat(
                    F.lit("bmat"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                )
            ),
        )
        .localCheckpoint(eager=True)
    )
    is_batch = ((F.col("src") + F.col("dst")) % _MI_MOD) == 0
    # One pass for both edge counts (round 14; was two full scans).
    _gc = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(is_batch, 1)).alias("nb"),
    ).collect()[0]
    n_edges, n_batch_edges = _gc["n"], _gc["nb"]
    g_base = (
        g.filter(~is_batch)
        .select("src", "dst", F.col("h").alias("p"), "w")
        .localCheckpoint(eager=True)
    )
    caps = (
        g_base.select(F.col("src").alias("v"))
        .unionByName(g_base.select(F.col("dst").alias("v")))
        .distinct()
        .withColumn("c", F.lit(_BM_B).cast("long"))
        .localCheckpoint(eager=True)
    )
    n_caps = caps.count()
    bmat_base = _bmatching_kernel(
        spark, g_base, n_edges - n_batch_edges, caps, n_caps
    )
    base_row = bmat_base.agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum("w").cast("long").alias("tw"),
        F.sum(F.col("src") + F.col("dst")).cast("long").alias("cks"),
    ).collect()[0]
    # Edge-status relation (s = base acceptance; batch edges false)
    # and its endpoint index, checkpointed once — the matching
    # repair's shapes with the weight column along for the ride.
    estat = (
        g.join(
            _mis_side(
                bmat_base.select("src", "dst").withColumn("s0", F.lit(True)),
                base_row["sz"],
            ),
            ["src", "dst"],
            "left",
        )
        .select(
            "src", "dst", "h", "w",
            F.coalesce(F.col("s0"), F.lit(False)).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    x = (
        estat.select(
            F.col("src").alias("v"),
            F.col("src").alias("fsrc"),
            F.col("dst").alias("fdst"),
            F.col("h").alias("fh"),
            F.col("s").alias("fs"),
        )
        .unionByName(
            estat.select(
                F.col("dst").alias("v"),
                F.col("src").alias("fsrc"),
                F.col("dst").alias("fdst"),
                F.col("h").alias("fh"),
                F.col("s").alias("fs"),
            )
        )
        .localCheckpoint(eager=True)
    )
    # Per-vertex base state, EXPLODED (one row per base-true h per
    # endpoint, <= b rows per vertex — the capacity analogue of the
    # matched-h broadcast; never hub adjacency).
    vstat0 = (
        estat.filter(F.col("s"))
        .select(F.col("src").alias("v"), F.col("h").alias("m1"))
        .unionByName(
            estat.filter(F.col("s")).select(
                F.col("dst").alias("v"), F.col("h").alias("m1")
            )
        )
        .localCheckpoint(eager=True)
    )
    n_vstat0 = 2 * base_row["sz"]
    # Dirty seed: the batch edges only — they enter with status false
    # and no capacity claim, so no existing edge's dependency changes
    # until a batch edge actually flips true.
    dirty = (
        estat.filter(is_batch)
        .select("src", "dst", "h", "s")
        .localCheckpoint(eager=True)
    )
    n_dirty = dirty.count()
    delta, n_delta = _line_warm_repair(
        spark, x, vstat0, dirty, n_dirty, n_vstat0, b=_BM_B
    )
    final = (
        estat.join(
            _mis_side(delta, n_delta),
            (estat.src == F.col("dsrc")) & (estat.dst == F.col("ddst")),
            "left",
        )
        .select(
            "src", "dst", "w",
            F.coalesce(F.col("dls"), F.col("s")).alias("sf"),
            F.col("s").alias("sb"),
        )
        .localCheckpoint(eager=True)
    )
    warm_mat = final.filter(F.col("sf")).select("src", "dst", "w").localCheckpoint(
        eager=True
    )
    warm_row = warm_mat.agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum("w").cast("long").alias("tw"),
        F.sum(F.col("src") + F.col("dst")).cast("long").alias("cks"),
    ).collect()[0]
    n_changed_edges = final.filter(F.col("sf") != F.col("sb")).count()
    # b-feasibility + maximality proofs over RESULT degrees.
    wdeg = (
        warm_mat.select(F.col("src").alias("v"))
        .unionByName(warm_mat.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    n_wdeg = 2 * warm_row["sz"]
    overcap = wdeg.filter(F.col("n") > _BM_B).count()
    deg_s = wdeg.select(F.col("v").alias("src"), F.col("n").alias("ns"))
    deg_d = wdeg.select(F.col("v").alias("dst"), F.col("n").alias("nd"))
    maxviol = (
        final.filter(~F.col("sf"))
        .join(_mis_side(deg_s, n_wdeg), "src", "left")
        .join(_mis_side(deg_d, n_wdeg), "dst", "left")
        .filter(
            (F.coalesce(F.col("ns"), F.lit(0)) < _BM_B)
            & (F.coalesce(F.col("nd"), F.lit(0)) < _BM_B)
        )
        .count()
    )
    return spark.range(1).select(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(n_edges - n_batch_edges).cast("long").alias("n_base_edges"),
        F.lit(n_batch_edges).cast("long").alias("n_batch_edges"),
        F.lit(_BM_B).cast("int").alias("b"),
        F.lit(base_row["sz"]).cast("long").alias("base_bmatch_size"),
        F.lit(base_row["tw"]).cast("long").alias("base_total_weight"),
        F.lit(base_row["cks"]).cast("long").alias("base_sum_ids"),
        F.lit(warm_row["sz"]).cast("long").alias("warm_bmatch_size"),
        F.lit(warm_row["tw"]).cast("long").alias("warm_total_weight"),
        F.lit(warm_row["cks"]).cast("long").alias("warm_sum_ids"),
        F.lit(n_changed_edges).cast("long").alias("n_changed_edges"),
        F.lit(overcap == 0).alias("feasible"),
        F.lit(maxviol == 0).alias("maximal"),
        F.lit(True).alias("converged"),
    )
