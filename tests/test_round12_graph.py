"""Round-12 graph entries: incremental connected components.

Pins for ``graph_cc_incremental`` (its DuckDB oracle hash-checks the
values at the gate; these check the SEMANTICS the oracle can't see):

* warm == cold: the quotient-contraction warm restart produces labels
  bit-identical to a cold full-graph min-label solve (labels are
  canonical min-vertex-ids, so ANY correct algorithm agrees — this is
  the correctness proof of the contraction);
* rounds_warm << rounds_cold: distributed propagation rounds on the
  quotient graph (components collapsed to distance 0) vs on the full
  graph — the convergence-shape claim the entry exists for, the
  label-propagation sibling of graph_pagerank_incremental's
  rounds_warm < rounds_cold fixed-point pin;
* the fixture BRIDGES: the layered-ingest split (base = dimension-side
  layers, batch = order→part fact edges) must actually merge
  components — n_base_comps == |customers with orders| + 1 (the
  part↔supplier web) collapsing to n_warm_comps == 1. The
  (src+dst)%MOD split of the pagerank sibling merges nothing here
  (probed round 12: the entity giant component survives a 5% edge
  deletion at every sf), which is WHY this entry uses the layer split.

A pure-Python union-find replay cross-checks the Spark kernel's labels
end-to-end at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdatabases_spark.relational import queries
from graphdatabases_spark.relational.graph_queries import (
    ORDER_BASE,
    PART_BASE,
    entity_edges,
)


def _split(spark, sf_dir):
    edges = entity_edges(spark, sf_dir, dedup=True).localCheckpoint(eager=True)
    is_batch = (F.col("src") >= ORDER_BASE) & (F.col("src") < PART_BASE)
    return edges, edges.filter(~is_batch), edges.filter(is_batch)


def _propagate_rounds(spark, edge_df):
    """Distributed min-label propagation to fixpoint; returns
    (labels_dict, effective_rounds) — rounds that CHANGED a label."""
    sym = edge_df.union(
        edge_df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    lab = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        nbr = (
            sym.join(F.broadcast(lab), sym.src == lab.id)
            .select(F.col("dst").alias("id"), "comp")
            .groupBy("id")
            .agg(F.min("comp").alias("mn"))
        )
        new = (
            lab.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("mn", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        lab = new
        if changed == 0:
            break
        rounds += 1
    return {r["id"]: r["comp"] for r in lab.collect()}, rounds


def _union_find(pairs):
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


class TestCcIncremental:
    def test_warm_equals_cold_and_rounds(self, spark, sf_dir):
        """The headline pin: quotient warm restart reaches the cold
        labels exactly, in far fewer propagation rounds."""
        edges, base_e, batch_e = _split(spark, sf_dir)

        cold_lab, rounds_cold = _propagate_rounds(spark, edges)

        # Warm phase exactly as the entry: base labels persisted, batch
        # contracted through them, propagation only on the quotient.
        base_lab, _ = _propagate_rounds(spark, base_e)
        bl = spark.createDataFrame(
            list(base_lab.items()), "id BIGINT, comp BIGINT"
        )
        qe = (
            batch_e.join(
                bl.select(F.col("id").alias("src"), F.col("comp").alias("sc")),
                "src",
                "left",
            )
            .join(
                bl.select(F.col("id").alias("dst"), F.col("comp").alias("dc")),
                "dst",
                "left",
            )
            .select(
                F.coalesce("sc", F.col("src")).alias("src"),
                F.coalesce("dc", F.col("dst")).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        qlab, rounds_warm = _propagate_rounds(spark, qe)

        warm_lab = {
            v: qlab.get(c, c) for v, c in base_lab.items()
        }
        assert warm_lab == cold_lab
        # Contraction collapses every solved component to distance 0:
        # the quotient (a star of customer components around the
        # part↔supplier web) solves in 2 effective rounds; the full
        # graph needs its diameter (7-8 at the test sfs).
        assert rounds_warm < rounds_cold
        assert rounds_warm <= 3
        assert rounds_cold >= 5

    def test_union_find_replay(self, spark, sf_dir):
        """Pure-Python union-find over the collected edge list must
        reproduce the distributed kernel's canonical labels."""
        edges, _, _ = _split(spark, sf_dir)
        pairs = [(r["src"], r["dst"]) for r in edges.collect()]
        expect = _union_find(pairs)
        got, _ = _propagate_rounds(spark, edges)
        assert got == expect

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_fixture_bridges(self, spark, sf):
        """The layered-ingest split genuinely merges: one base
        component per customer plus the part↔supplier web, all
        collapsing to a single warm component."""
        rows = queries()["graph_cc_incremental"](spark, sf).collect()
        assert len(rows) > 0
        r0 = rows[0]
        n_cust = (
            spark.read.parquet(f"{sf}/orders.parquet")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert r0["n_base_comps"] == n_cust + 1
        assert r0["n_warm_comps"] == 1
        assert r0["base_converged"] and r0["q_converged"]
        # top-1 base component by size is the part↔supplier web; it
        # keeps the global min label only if it contains it (it does
        # not — customer ids are smaller), so it must show as merged.
        assert r0["merged"]
        assert all(r["n_base_comps"] == r0["n_base_comps"] for r in rows)

    def test_entry_output_contract(self, spark, sf_dir):
        df = queries()["graph_cc_incremental"](spark, sf_dir)
        rows = df.collect()
        assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
        # comp_warm is the global min vertex id across the merged set —
        # the smallest customer key present.
        min_cust = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .agg(F.min("o_custkey"))
            .collect()[0][0]
        )
        merged_rows = [r for r in rows if r["merged"]]
        assert merged_rows
        assert all(r["comp_warm"] == min_cust for r in merged_rows)


# ---------------------------------------------------------------------------
# Node2vec biased walks (graph_node2vec_walks)
# ---------------------------------------------------------------------------

import hashlib
from collections import defaultdict

_N2V_STEPS = 8
_W_RET, _W_IN, _W_OUT = 1, 2, 4


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _sym_adj(spark, sf_dir):
    edges, _, _ = _split(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    nbrs = defaultdict(list)
    eset = set()
    for u, v in pairs:
        nbrs[u].append(v)
        nbrs[v].append(u)
        eset.add((u, v))
        eset.add((v, u))
    for u in nbrs:
        nbrs[u].sort()
    return nbrs, eset


def _n2v_replay(nbrs, eset, seeds, steps):
    rows = []
    for s in seeds:
        node, prev = s, -1
        rows.append((s, 0, node, prev))
        for k in range(1, steps + 1):
            cands = nbrs[node]
            wts = [
                _W_RET if x == prev
                else _W_IN if (prev, x) in eset
                else _W_OUT
                for x in cands
            ]
            tot = sum(wts)
            pick = _h48(f"n2v{s}:{k}:{node}:{prev}") % tot + 1
            cum = 0
            for x, w in zip(cands, wts):
                cum += w
                if pick <= cum:
                    node, prev = x, node
                    break
            rows.append((s, k, node, prev))
    return rows


class TestNode2vecWalks:
    def test_python_replay_bit_exact(self, spark, sf_dir):
        """Pure-Python replay of the second-order class-weighted pick
        chain reproduces the engine's biased corpus exactly."""
        nbrs, eset = _sym_adj(spark, sf_dir)
        expect = sorted(_n2v_replay(nbrs, eset, range(1, 11), _N2V_STEPS))
        got = sorted(
            (r["seed"], r["step"], r["node"], r["prev"])
            for r in queries()["graph_node2vec_walks"](spark, sf_dir).collect()
        )
        assert got == expect

    def test_bias_is_non_vacuous(self, spark, sf_dir):
        """The (p, q) kernel must actually change the corpus relative
        to the uniform walker (else the class weights are dead code),
        while sharing seeds, steps, and the adjacency."""
        biased = {
            (r["seed"], r["step"], r["node"])
            for r in queries()["graph_node2vec_walks"](spark, sf_dir).collect()
        }
        uniform = {
            (r["seed"], r["step"], r["node"])
            for r in queries()["graph_random_walks"](spark, sf_dir).collect()
        }
        assert biased != uniform
        # same walker count and length
        assert len(biased) == len(uniform)

    def test_step0_uniform_convention(self, spark, sf_dir):
        """prev = -1 at step 0; every step-k row's prev equals the
        step-(k-1) node of the same walker (the chain is coherent)."""
        rows = queries()["graph_node2vec_walks"](spark, sf_dir).collect()
        by_walker = defaultdict(dict)
        for r in rows:
            by_walker[r["seed"]][r["step"]] = (r["node"], r["prev"])
        for s, steps in by_walker.items():
            assert steps[0] == (s, -1)
            for k in range(1, _N2V_STEPS + 1):
                assert steps[k][1] == steps[k - 1][0]

    def test_skipgrams_rederive(self, spark, sf_dir):
        """The skip-gram entry's counts match a direct recount over
        the engine's own walk corpus (window 2, symmetrized)."""
        walk = sorted(
            (r["seed"], r["step"], r["node"])
            for r in queries()["graph_node2vec_walks"](spark, sf_dir).collect()
        )
        from collections import Counter

        by_seed = defaultdict(list)
        for s, k, n in walk:
            by_seed[s].append((k, n))
        cnt = Counter()
        for s, seq in by_seed.items():
            seq.sort()
            for i, (ka, na) in enumerate(seq):
                for kb, nb in seq[i + 1:]:
                    if kb - ka <= 2:
                        cnt[(na, nb)] += 1
                        cnt[(nb, na)] += 1
        expect = sorted(
            ((-c, a, b) for (a, b), c in cnt.items())
        )[:30]
        got = [
            (-r["cnt"], r["center"], r["context"])
            for r in queries()["graph_node2vec_skipgrams"](spark, sf_dir).collect()
        ]
        assert got == expect


# ---------------------------------------------------------------------------
# Incremental triangle count (graph_triangle_delta)
# ---------------------------------------------------------------------------


class TestTriangleDelta:
    def _edges(self, sf_dir):
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT a.l_partkey, b.l_partkey
            FROM read_parquet('{sf_dir}/lineitem.parquet') a
            JOIN read_parquet('{sf_dir}/lineitem.parquet') b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            WHERE a.l_orderkey % 2 = 0
            GROUP BY 1, 2 HAVING count(*) >= 2
            """
        ).fetchall()
        con.close()
        return [(int(a), int(b)) for a, b in rows]

    def test_python_replay_and_identity(self, spark, sf_dir):
        from itertools import combinations

        edges = self._edges(sf_dir)
        eset = set(edges)
        nbrs = defaultdict(set)
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)
        is_b = lambda a, b: (a + b) % 5 == 0

        def count(pred):
            n = 0
            for a, b in edges:
                if not pred(a, b):
                    continue
                for c in nbrs[a] & nbrs[b]:
                    if c > b:
                        ab, ac, bc = (a, b), (a, c), (b, c)
                        if pred(*ac) and pred(*bc):
                            n += 1
            return n

        full = count(lambda a, b: True)
        base = count(lambda a, b: not is_b(a, b))
        cls = defaultdict(int)
        for a, b, c in (
            (a, b, c)
            for a, b in edges
            for c in nbrs[a] & nbrs[b]
            if c > b
        ):
            nb = is_b(a, b) + is_b(min(a, c), max(a, c)) + is_b(
                min(b, c), max(b, c)
            )
            if nb:
                cls[nb] += 1
        r = queries()["graph_triangle_delta"](spark, sf_dir).collect()[0]
        assert (r["n_tri_base"], r["n_tri_full"]) == (base, full)
        assert (r["tri_1batch"], r["tri_2batch"], r["tri_3batch"]) == (
            cls[1], cls[2], cls[3],
        )
        assert r["identity_ok"]
        assert r["delta_incremental"] == full - base

    def test_delta_non_trivial(self, spark):
        r = queries()["graph_triangle_delta"](
            spark, "/root/testdata/sf0.01"
        ).collect()[0]
        assert r["n_tri_full"] > r["n_tri_base"] > 0
        assert r["identity_ok"]


# ---------------------------------------------------------------------------
# Maximal independent set (graph_mis_luby)
# ---------------------------------------------------------------------------


class TestMisLuby:
    def test_sequential_greedy_equals_parallel_rounds(self, spark, sf_dir):
        """The fixed-priority parallel rounds must produce EXACTLY the
        lexicographically-first-by-priority MIS, i.e. the sequential
        greedy over (h, id)-sorted vertices — two very different
        algorithms, one answer."""
        edges, _, _ = _split(spark, sf_dir)
        pairs = [(r["src"], r["dst"]) for r in edges.collect()]
        nbrs = defaultdict(set)
        for u, v in pairs:
            nbrs[u].add(v)
            nbrs[v].add(u)
        verts = sorted(
            nbrs, key=lambda v: (_h48(f"mis{v}"), v)
        )
        mis, blocked = set(), set()
        for v in verts:
            if v not in blocked:
                mis.add(v)
                blocked |= nbrs[v]
        r = queries()["graph_mis_luby"](spark, sf_dir).collect()[0]
        assert r["mis_size"] == len(mis)
        assert r["sum_ids"] == sum(mis)
        assert r["independent"] and r["maximal"] and r["converged"]
        assert r["n_vertices"] == len(nbrs)


# ---------------------------------------------------------------------------
# Maximal matching (graph_matching_greedy)
# ---------------------------------------------------------------------------

_MM_SCALE = 32768


class TestMatchingGreedy:
    def test_sequential_greedy_equals_parallel_rounds(self, spark, sf_dir):
        """The fixed-priority parallel rounds must produce EXACTLY the
        sequential greedy matching over priority-sorted edges — the
        lexicographically-first maximal matching."""
        edges, _, _ = _split(spark, sf_dir)
        pairs = [(r["src"], r["dst"]) for r in edges.collect()]

        def h(u, v):
            return _h48(f"mat{u}:{v}") * _MM_SCALE + (u * 31 + v) % _MM_SCALE

        mat, used = [], set()
        for u, v in sorted(pairs, key=lambda e: (h(*e), e)):
            if u not in used and v not in used:
                mat.append((u, v))
                used.add(u)
                used.add(v)
        r = queries()["graph_matching_greedy"](spark, sf_dir).collect()[0]
        assert r["matching_size"] == len(mat)
        assert r["sum_ids"] == sum(u + v for u, v in mat)
        assert r["is_matching"] and r["maximal_and_converged"]
        assert r["n_edges"] == len(pairs)


# ---------------------------------------------------------------------------
# Iterated-MIS coloring (graph_coloring_mis)
# ---------------------------------------------------------------------------


class TestColoringMis:
    def test_python_replay_and_first_class_is_mis(self, spark, sf_dir):
        """Greedy replay of iterated lexicographic-MIS extraction must
        match per-class sizes/checksums; color 1 must be EXACTLY
        graph_mis_luby's set (same priorities, same residual = whole
        graph) — a cross-entry structural identity."""
        edges, _, _ = _split(spark, sf_dir)
        pairs = [(r["src"], r["dst"]) for r in edges.collect()]
        nbrs = defaultdict(set)
        for u, v in pairs:
            nbrs[u].add(v)
            nbrs[v].add(u)
        remaining = set(nbrs)
        expect = {}
        color = 0
        while remaining:
            color += 1
            mis, blocked = set(), set()
            for v in sorted(remaining, key=lambda x: (_h48(f"mis{x}"), x)):
                if v not in blocked:
                    mis.add(v)
                    blocked |= nbrs[v] & remaining
            expect[color] = (len(mis), sum(mis))
            remaining -= mis
        rows = queries()["graph_coloring_mis"](spark, sf_dir).collect()
        got = {r["color"]: (r["n_vertices"], r["sum_ids"]) for r in rows}
        assert got == expect
        assert all(r["proper"] and r["converged"] for r in rows)
        assert rows[0]["n_colors"] == color
        mis_row = queries()["graph_mis_luby"](spark, sf_dir).collect()[0]
        assert got[1] == (mis_row["mis_size"], mis_row["sum_ids"])
