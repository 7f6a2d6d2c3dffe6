"""Round-10 graph entries: Louvain one-pass refinement.

Two pins for ``graph_louvain_onepass`` (its DuckDB oracle hash-checks
the values; these check the SEMANTICS):

* a pure-Python integer replay of the whole pipeline — LPA rounds,
  exact 2m²-scaled gains, the community-disjoint selection cascade,
  and the ppm modularity identity — must reproduce the entry's row
  bit-for-bit at sf0.001;
* the improvement invariant the selection was designed for:
  Q_after >= Q_before always, with strictly positive total gain
  whenever any move applies (the disjointness argument in the entry's
  docstring is what makes simultaneous application sound).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pytest

from graphdatabases_spark.relational import queries

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _e0_edges(sf_dir: str) -> list[tuple[int, int]]:
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM read_parquet('{sf_dir}/lineitem.parquet') a
            JOIN read_parquet('{sf_dir}/lineitem.parquet') b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            WHERE a.l_orderkey % 4 = 0
            """
        ).fetchall()
    finally:
        con.close()
    return [(int(a), int(b)) for a, b in rows]


def _lpa(edges, iters=3):
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    label = {v: v for v in nbrs}
    for _ in range(iters):
        new = {}
        for v in nbrs:
            cnt = Counter(label[u] for u in nbrs[v])
            best = min((-c, lab) for lab, c in cnt.items())[1]
            new[v] = best
        label = new
    return label, nbrs


def _q_ppm(edges, label, deg):
    m = len(edges)
    intra = sum(1 for a, b in edges if label[a] == label[b])
    sig = Counter()
    for v, d in deg.items():
        sig[label[v]] += d
    sum_d2 = sum(s * s for s in sig.values())
    return (
        1_000_000 * (4 * m * m + 4 * m * intra - sum_d2) // (4 * m * m)
        - 1_000_000
    )


def _replay(sf_dir: str) -> dict:
    edges = _e0_edges(sf_dir)
    label, nbrs = _lpa(edges)
    deg = {v: len(us) for v, us in nbrs.items()}
    m = len(edges)
    sig = Counter()
    for v, d in deg.items():
        sig[label[v]] += d
    # Per-vertex neighbor-community edge counts and best positive move.
    cand1 = {}
    for v in nbrs:
        kvc = Counter(label[u] for u in nbrs[v])
        s = label[v]
        k_own = kvc.get(s, 0)
        best = None
        for c, k in kvc.items():
            if c == s:
                continue
            gain = 2 * m * (k - k_own) - deg[v] * (sig[c] - sig[s] + deg[v])
            if gain <= 0:
                continue
            key = (-gain, c)
            if best is None or key < best[0]:
                best = (key, (v, s, c, gain))
        if best is not None:
            cand1[v] = best[1]
    # One mover per source community, then per target community.
    by_s = {}
    for v, s, c, gain in cand1.values():
        key = (-gain, v)
        if s not in by_s or key < by_s[s][0]:
            by_s[s] = (key, (v, s, c, gain))
    by_c = {}
    for _key, (v, s, c, gain) in by_s.values():
        key = (-gain, v)
        if c not in by_c or key < by_c[c][0]:
            by_c[c] = (key, (v, s, c, gain))
    cand3 = [mv for _, mv in by_c.values()]
    srcs = {s for _, s, _, _ in cand3}
    dsts = {c for _, _, c, _ in cand3}
    movers = [
        (v, s, c, gain)
        for v, s, c, gain in cand3
        if s not in dsts and c not in srcs
    ]
    # Disjointness invariant of the selection itself.
    touched = [x for _, s, c, _ in movers for x in (s, c)]
    assert len(touched) == len(set(touched)), "communities not disjoint"
    l4 = dict(label)
    for v, _, c, _ in movers:
        l4[v] = c
    return {
        "n_nodes": len(nbrs),
        "n_edges": m,
        "n_comm_before": len(set(label.values())),
        "n_comm_after": len(set(l4.values())),
        "n_moves": len(movers),
        "gain_2m2": sum(g for _, _, _, g in movers),
        "q_before_ppm": _q_ppm(edges, label, deg),
        "q_after_ppm": _q_ppm(edges, l4, deg),
    }


class TestLouvainOnepass:
    @pytest.fixture(scope="class")
    def row(self, spark, sf_dir):
        qs = queries()
        return qs["graph_louvain_onepass"](spark, sf_dir).collect()[0]

    def test_python_integer_replay_matches(self, row, sf_dir):
        expect = _replay(sf_dir)
        got = {k: row[k] for k in expect}
        assert got == expect

    def test_improvement_invariant(self, row):
        assert row["q_after_ppm"] >= row["q_before_ppm"]
        if row["n_moves"] >= 1:
            assert row["gain_2m2"] > 0
        else:
            assert row["gain_2m2"] == 0
            assert row["q_after_ppm"] == row["q_before_ppm"]

    def test_improvement_invariant_sf001(self, spark):
        qs = queries()
        row = qs["graph_louvain_onepass"](
            spark, "/root/testdata/sf0.01"
        ).collect()[0]
        assert row["q_after_ppm"] >= row["q_before_ppm"]
        assert row["n_moves"] >= 1  # the fixture does move at sf0.01
        expect = _replay("/root/testdata/sf0.01")
        assert {k: row[k] for k in expect} == expect
