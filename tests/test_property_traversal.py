"""Property-based spot checks (SURVEY §5.2.5): random seeded digraphs,
BFS/SSSP/khop vs a DuckDB bounded-recursive-CTE oracle.

The hypothesis strategy generates only the SEED; the graph derives
deterministically from it, so failures replay exactly. Graphs are small
(the local kernel answers in ms) — the distributed kernel's equivalence
to the local one is pinned separately in test_traversal.py and here by
one distributed example per run.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphdatabases_spark.graph.traversal import bfs_distances, khop, ssp


def _random_edges(seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    n = rng.randint(5, 40)
    m = rng.randint(n, 4 * n)
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    # Self-loops allowed — the kernel must tolerate them (cycle check).
    return sorted(edges)


def _oracle(edges: list[tuple[int, int]], src: int, max_hops: int) -> dict[int, int]:
    con = duckdb.connect()
    con.register("edf", pd.DataFrame(edges, columns=["src", "dst"]))
    rows = con.sql(
        f"""
        WITH RECURSIVE walk(id, d) AS (
          SELECT CAST({src} AS BIGINT), 0
          UNION
          -- UNION (not ALL) dedups (id, d) states: on cyclic graphs
          -- UNION ALL enumerates every walk — exponential in depth.
          SELECT e.dst, w.d + 1 FROM walk w JOIN edf e ON e.src = w.id
          WHERE w.d < {max_hops}
        )
        SELECT id, CAST(min(d) AS INT) FROM walk GROUP BY id
        """
    ).fetchall()
    con.close()
    return {int(i): int(d) for i, d in rows}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_bfs_distances_match_oracle(spark, seed):
    edges = _random_edges(seed)
    src = edges[0][0]
    oracle = _oracle(edges, src, max_hops=5)
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(_edges_df(spark, edges), src, max_hops=5).collect()
    }
    assert got == oracle, f"seed={seed}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_khop_root_exclusion_semantics(spark, seed):
    """khop = oracle nodes at 1..h, minus the root unless a ≤h cycle
    re-reaches it (reference quirk 2 — Neo4j/Arango semantics)."""
    edges = _random_edges(seed)
    src = edges[0][0]
    h = 3
    oracle = _oracle(edges, src, max_hops=h)
    expect = {i for i, d in oracle.items() if d >= 1}
    # The oracle returns dist 0 for the root; it belongs in the result
    # only if some reached node (dist ≤ h-1) has an edge back to it.
    back = {u for u, v in edges if v == src}
    if any(u in back for u, d in oracle.items() if d <= h - 1):
        expect.add(src)
    else:
        expect.discard(src)
    got = {r["id"] for r in khop(_edges_df(spark, edges), src, h).collect()}
    assert got == expect, f"seed={seed}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_ssp_dist_matches_oracle_min(spark, seed):
    edges = _random_edges(seed)
    src, dst = edges[0][0], edges[-1][1]
    oracle = _oracle(edges, src, max_hops=40)
    rows = ssp(_edges_df(spark, edges), src, dst).collect()
    if dst not in oracle:
        assert rows == [], f"seed={seed}: path found where oracle sees none"
    else:
        assert rows, f"seed={seed}: no path found (oracle dist {oracle[dst]})"
        assert rows[0]["dist"] == oracle[dst], f"seed={seed}"
        path = rows[0]["path"]
        # The returned path must be a real path of that length.
        assert len(path) == rows[0]["dist"] + 1
        assert path[0] == src and path[-1] == dst
        eset = set(edges)
        assert all((a, b) in eset for a, b in zip(path, path[1:]))


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_ssp_numpy_equals_reference_python_bfs(seed):
    """The vectorized SSP kernel must return the IDENTICAL (dist, path)
    as the queue-BFS reference implementation — including the
    lexicographic tie-break — on random digraphs. Pure driver-side, no
    Spark session needed."""
    import numpy as np

    from graphdatabases_spark.graph.traversal import (
        _AdjIndex,
        _ssp_local,
        _ssp_numpy,
    )

    edges = _random_edges(seed)
    rng = random.Random(seed + 1)
    src = rng.choice(edges)[0]
    dst = rng.choice(edges)[1]
    idx = _AdjIndex(
        np.array([a for a, _ in edges], dtype=np.int64),
        np.array([b for _, b in edges], dtype=np.int64),
    )
    want = _ssp_local(idx.adj, src, dst, max_hops=None)
    got = _ssp_numpy(idx, src, dst, max_hops=None)
    assert got == want, f"seed={seed} src={src} dst={dst}"
    # Bounded-hop variant too.
    want_b = _ssp_local(idx.adj, src, dst, max_hops=3)
    got_b = _ssp_numpy(idx, src, dst, max_hops=3)
    assert got_b == want_b, f"seed={seed} bounded"


def _random_edges_big(seed: int) -> list[tuple[int, int]]:
    """Bigger digraphs (n ≤ 200) for the iterative-algorithm properties
    — deep enough peels/label cascades to exercise multiple rounds."""
    rng = random.Random(seed)
    n = rng.randint(20, 200)
    m = rng.randint(n, 5 * n)
    return sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def _kcore_oracle(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Synchronous-round peel (independent of the kernel's queue-based
    peel — the k-core is unique, so both must converge to it). Returns
    {id: within-core degree}."""
    from collections import Counter

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    alive = {u for uv in und for u in uv}
    while True:
        deg: Counter = Counter()
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        new = {v for v in alive if deg[v] >= k}
        if new == alive:
            return {v: deg[v] for v in alive}
        alive = new


def _lpa_oracle(edges: list[tuple[int, int]], num_iters: int) -> dict[int, int]:
    """Definition-level synchronous LPA: each round every node adopts
    the most frequent label among its symmetric neighbor MULTISET
    (each directed edge contributes both directions; a self-loop
    contributes the node's own label twice), ties → smallest label."""
    from collections import Counter, defaultdict

    nodes = sorted({u for uv in edges for u in uv})
    nbrs: dict[int, list[int]] = defaultdict(list)
    for a, b in edges:
        nbrs[b].append(a)
        nbrs[a].append(b)
    labels = {v: v for v in nodes}
    for _ in range(num_iters):
        labels = {
            v: min((-c, l) for l, c in Counter(labels[u] for u in nbrs[v]).items())[1]
            for v in nodes
        }
    return labels


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), k=st.integers(2, 3))
def test_kcore_matches_synchronous_peel_oracle(spark, seed, k):
    from graphdatabases_spark.graph.algorithms import kcore

    edges = _random_edges_big(seed)
    got = {
        r["id"]: r["core_degree"]
        for r in kcore(_edges_df(spark, edges), k=k).collect()
    }
    assert got == _kcore_oracle(edges, k), f"seed={seed} k={k}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000))
def test_label_propagation_matches_definition_oracle(spark, seed):
    from graphdatabases_spark.graph.algorithms import label_propagation

    edges = _random_edges_big(seed)
    got = {
        r["id"]: r["label"]
        for r in label_propagation(_edges_df(spark, edges), num_iters=3).collect()
    }
    assert got == _lpa_oracle(edges, 3), f"seed={seed}"


@pytest.mark.parametrize("seed", [77, 4242, 9001])
def test_distributed_kcore_matches_oracle(spark, seed):
    """The distributed peel loop must reach the same fixpoint as the
    synchronous oracle (3 fixed seeds; auto-strategy runs local)."""
    from graphdatabases_spark.graph.algorithms import kcore

    edges = _random_edges_big(seed)
    got = {
        r["id"]: r["core_degree"]
        for r in kcore(_edges_df(spark, edges), k=2, strategy="distributed").collect()
    }
    assert got == _kcore_oracle(edges, 2), f"seed={seed}"


@pytest.mark.parametrize("seed", [77, 4242, 9001])
def test_distributed_lpa_matches_oracle(spark, seed):
    from graphdatabases_spark.graph.algorithms import label_propagation

    edges = _random_edges_big(seed)
    got = {
        r["id"]: r["label"]
        for r in label_propagation(
            _edges_df(spark, edges), num_iters=2, strategy="distributed"
        ).collect()
    }
    assert got == _lpa_oracle(edges, 2), f"seed={seed}"


def test_one_distributed_example_matches_oracle(spark):
    edges = _random_edges(seed=1234)
    src = edges[0][0]
    oracle = _oracle(edges, src, max_hops=4)
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            _edges_df(spark, edges), src, max_hops=4, strategy="distributed"
        ).collect()
    }
    assert got == oracle
