"""Round-11 graph entries: multilevel Louvain.

Pins for ``graph_louvain_multilevel`` (its DuckDB oracle hash-checks
the values; these check the SEMANTICS):

* a pure-Python integer replay of the whole multilevel pipeline — LPA
  init, the weighted 2m²-scaled local-move pass at every level, the
  community-disjoint selection cascade, contraction to the weighted
  super-graph, and the ppm modularity identity — must reproduce all
  level rows bit-for-bit at sf0.001 and sf0.01;
* the monotonicity chain the coarsening is FOR: within every level
  q_after >= q_before (strict when any move applies), and across
  levels q_before(L) == q_after(L-1) EXACTLY, because contraction
  conserves total weight, strengths, and intra weight, so the
  floor-div ppm identity evaluates on identical integers.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from graphdatabases_spark.relational import queries

from tests.test_round10_graph import _e0_edges, _lpa

_LEVELS = 3


def _wlm_pass(wg, lab, m):
    """One weighted local-move pass on wg: {(u,v) u<=v: w} with labels
    lab: {node: community}. Returns (post_labels, stats_dict)."""
    k = Counter()
    adj = defaultdict(Counter)
    for (u, v), w in wg.items():
        if u == v:
            k[u] += 2 * w
        else:
            k[u] += w
            k[v] += w
            adj[u][v] += w
            adj[v][u] += w
    nodes = set(lab)
    sig = Counter()
    for vtx in nodes:
        sig[lab[vtx]] += k[vtx]
    cand1 = {}
    for vtx in nodes:
        kvc = Counter()
        for u, w in adj[vtx].items():
            kvc[lab[u]] += w
        s = lab[vtx]
        k_own = kvc.get(s, 0)
        best = None
        for c, kk in kvc.items():
            if c == s:
                continue
            gain = 2 * m * (kk - k_own) - k[vtx] * (sig[c] - sig[s] + k[vtx])
            if gain <= 0:
                continue
            key = (-gain, c)
            if best is None or key < best[0]:
                best = (key, (vtx, s, c, gain))
        if best is not None:
            cand1[vtx] = best[1]
    by_s = {}
    for vtx, s, c, gain in cand1.values():
        key = (-gain, vtx)
        if s not in by_s or key < by_s[s][0]:
            by_s[s] = (key, (vtx, s, c, gain))
    by_c = {}
    for _key, (vtx, s, c, gain) in by_s.values():
        key = (-gain, vtx)
        if c not in by_c or key < by_c[c][0]:
            by_c[c] = (key, (vtx, s, c, gain))
    cand3 = [mv for _, mv in by_c.values()]
    srcs = {s for _, s, _, _ in cand3}
    dsts = {c for _, _, c, _ in cand3}
    movers = [
        (vtx, s, c, gain)
        for vtx, s, c, gain in cand3
        if s not in dsts and c not in srcs
    ]
    touched = [x for _, s, c, _ in movers for x in (s, c)]
    assert len(touched) == len(set(touched)), "communities not disjoint"
    post = dict(lab)
    for vtx, _, c, _ in movers:
        post[vtx] = c

    def _q_ppm(labels):
        intra = sum(
            w for (u, v), w in wg.items() if labels[u] == labels[v]
        )
        sg = Counter()
        for vtx in nodes:
            sg[labels[vtx]] += k[vtx]
        sum_d2 = sum(s * s for s in sg.values())
        return (
            1_000_000
            * (4 * m * m + 4 * m * intra - sum_d2)
            // (4 * m * m)
            - 1_000_000
        )

    stats = {
        "n_nodes": len(nodes),
        "n_comm_before": len(set(lab.values())),
        "n_comm_after": len(set(post.values())),
        "n_moves": len(movers),
        "gain_2m2": sum(g for _, _, _, g in movers),
        "q_before_ppm": _q_ppm(lab),
        "q_after_ppm": _q_ppm(post),
    }
    return post, stats


def _contract(wg, post):
    out = Counter()
    for (u, v), w in wg.items():
        cu, cv = post[u], post[v]
        out[(min(cu, cv), max(cu, cv))] += w
    return dict(out)


def _replay_multilevel(sf_dir: str) -> list[dict]:
    edges = _e0_edges(sf_dir)
    label, _nbrs = _lpa(edges)
    m = len(edges)
    wg = dict(Counter(((min(a, b), max(a, b)) for a, b in edges)))
    lab = dict(label)
    rows = []
    for lvl in range(_LEVELS):
        post, stats = _wlm_pass(wg, lab, m)
        rows.append({"level": lvl, **stats})
        if lvl < _LEVELS - 1:
            wg = _contract(wg, post)
            lab = {c: c for c in set(post.values())}
    return rows


class TestLouvainMultilevel:
    @pytest.fixture(scope="class")
    def rows(self, spark, sf_dir):
        qs = queries()
        return (
            qs["graph_louvain_multilevel"](spark, sf_dir)
            .orderBy("level")
            .collect()
        )

    def test_python_integer_replay_matches(self, rows, sf_dir):
        expect = _replay_multilevel(sf_dir)
        assert len(rows) == len(expect) == _LEVELS
        for row, exp in zip(rows, expect):
            assert {c: row[c] for c in exp} == exp, exp["level"]

    def test_monotone_chain(self, rows):
        for row in rows:
            assert row["q_after_ppm"] >= row["q_before_ppm"]
            if row["n_moves"] >= 1:
                assert row["gain_2m2"] > 0
            else:
                assert row["gain_2m2"] == 0
                assert row["q_after_ppm"] == row["q_before_ppm"]
        for prev, cur in zip(rows, rows[1:]):
            # contraction preserves modularity EXACTLY (same integers
            # through the floor-div identity)
            assert cur["q_before_ppm"] == prev["q_after_ppm"]
            # contraction is partition-preserving: level L starts from
            # level L-1's communities
            assert cur["n_nodes"] == prev["n_comm_after"]
            assert cur["n_comm_before"] == prev["n_comm_after"]

    def test_moves_at_sf001(self, spark):
        """The sf0.01 fixture does move at every level (8/4/2 movers) —
        the coarsened levels find gains the flat pass cannot see."""
        qs = queries()
        rows = (
            qs["graph_louvain_multilevel"](spark, "/root/testdata/sf0.01")
            .orderBy("level")
            .collect()
        )
        assert [r["n_moves"] for r in rows] == [8, 4, 2]
        assert rows[-1]["q_after_ppm"] > rows[0]["q_before_ppm"]
        expect = _replay_multilevel("/root/testdata/sf0.01")
        for row, exp in zip(rows, expect):
            assert {c: row[c] for c in exp} == exp
