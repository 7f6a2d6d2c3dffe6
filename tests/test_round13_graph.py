"""Round-13 pins: incremental MIS / matching repair (priority-DAG
cascade relaxation) against pure-Python replays.

The DuckDB differential proves warm == cold VALUES (the oracle
computes the warm columns as the cold unrolled fixpoint of the
appended graph).  These tests pin the two claims the differential
cannot see:

1. REPLAY EQUALITY — an independent pure-Python implementation of the
   cascade repair (dict/set arithmetic, no Spark, no SQL) reaches the
   exact cold greedy result, vertex for vertex / edge for edge, so
   the repair ALGORITHM (not just its summary row) is right.
2. REPAIR LOCALITY — the cascade recomputes a small fraction of the
   graph (the scope pin from the round-12 verdict: "repair touches
   only the batch's cascade cone"), and converges in few rounds.
"""

from __future__ import annotations

import hashlib

import pytest

from graphdatabases_spark.relational.graph_queries import ENTITY_EDGES_SQL
from graphdatabases_spark.relational.graph_incremental_queries import _MI_MOD

from tests.oracle_utils import duckdb_connection

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def _edges(sf_dir):
    con = duckdb_connection(sf_dir)
    try:
        rows = con.execute(
            f"WITH {ENTITY_EDGES_SQL} SELECT src, dst FROM edges"
        ).fetchall()
    finally:
        con.close()
    return [(int(s), int(d)) for s, d in rows]


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _vh(vid: int) -> int:
    return _h48(f"mis{vid}")


def _eh(s: int, d: int) -> int:
    return _h48(f"mat{s}:{d}") * 32768 + (s * 31 + d) % 32768


# ---------------------------------------------------------------------------
# MIS: cold greedy + cascade repair
# ---------------------------------------------------------------------------


def _mis_cold(edges):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    mis: set[int] = set()
    for _h, v in sorted((_vh(v), v) for v in adj):
        if not (adj[v] & mis):
            mis.add(v)
    return mis, adj


def _mis_repair(base_edges, batch_edges):
    """Cascade relaxation starting from the base MIS; returns the
    repaired MIS plus (recomputed vertex count, round count)."""
    base_mis, _ = _mis_cold(base_edges)
    adj: dict[int, set[int]] = {}
    for s, d in base_edges + batch_edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    prio = {v: (_vh(v), v) for v in adj}
    status = {v: v in base_mis for v in adj}
    # Seed only endpoints whose value can move (mirrors the entry):
    # batch-new vertices, or endpoints whose new neighbor is base-TRUE
    # with higher priority.
    base_vs = set()
    for s, d in base_edges:
        base_vs.add(s)
        base_vs.add(d)
    dirty = set()
    for s, d in batch_edges:
        for a, b in ((s, d), (d, s)):
            if a not in base_vs:
                dirty.add(a)
            elif status[b] and prio[b] < prio[a]:
                dirty.add(a)
    rounds = 0
    recomputed: set[int] = set()
    while dirty:
        rounds += 1
        recomputed |= dirty
        changed = set()
        new_vals = {}
        for v in dirty:
            new_s = not any(
                status[n] for n in adj[v] if prio[n] < prio[v]
            )
            if new_s != status[v]:
                new_vals[v] = new_s
                changed.add(v)
        for v, sv in new_vals.items():
            status[v] = sv
        dirty = set()
        for c in changed:
            for n in adj[c]:
                if prio[n] > prio[c]:
                    dirty.add(n)
    return {v for v, s in status.items() if s}, len(recomputed), rounds


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MID])
def test_mis_repair_replay_equals_cold(sf_dir):
    edges = _edges(sf_dir)
    base = [(s, d) for s, d in edges if (s + d) % _MI_MOD != 0]
    batch = [(s, d) for s, d in edges if (s + d) % _MI_MOD == 0]
    assert batch, "fixture must produce a non-empty batch"
    cold, adj = _mis_cold(edges)
    warm, n_recomputed, rounds = _mis_repair(base, batch)
    assert warm == cold
    # Locality: measured 9.2% / 9.8% / 10% of |V| recompute work and
    # 3/4/6 rounds at sf0.001/0.01/0.1 — bounds at ~2x headroom.
    assert n_recomputed <= 0.25 * len(adj)
    assert rounds <= 12


def test_mis_incremental_entry_matches_replay(spark):
    from graphdatabases_spark.relational import queries

    edges = _edges(SF_SMALL)
    base = [(s, d) for s, d in edges if (s + d) % _MI_MOD != 0]
    batch = [(s, d) for s, d in edges if (s + d) % _MI_MOD == 0]
    base_mis, _ = _mis_cold(base)
    warm, _, _ = _mis_repair(base, batch)
    row = queries()["graph_mis_incremental"](spark, SF_SMALL).collect()[0]
    assert row["base_mis_size"] == len(base_mis)
    assert row["base_sum_ids"] == sum(base_mis)
    assert row["warm_mis_size"] == len(warm)
    assert row["warm_sum_ids"] == sum(warm)
    assert row["n_flipped"] == len(base_mis ^ warm)
    assert row["independent"] and row["maximal"] and row["converged"]


# ---------------------------------------------------------------------------
# Matching: cold greedy + cascade repair on the line graph
# ---------------------------------------------------------------------------


def _mat_cold(edges):
    mat: set[tuple[int, int]] = set()
    used: set[int] = set()
    for _h, s, d in sorted((_eh(s, d), s, d) for s, d in edges):
        if s not in used and d not in used:
            mat.add((s, d))
            used.add(s)
            used.add(d)
    return mat


def _mat_repair(base_edges, batch_edges):
    """Mirror of the entry's warm loop: batch-only initial dirty set
    (new edges enter FALSE, and blocked() reads only true adjacents,
    so nothing else is inconsistent yet), per-vertex true-h state,
    and dirt propagated only where the strict-< blocking predicate
    actually flips between the old and new state."""
    base_mat = _mat_cold(base_edges)
    all_edges = base_edges + batch_edges
    inc: dict[int, set[tuple[int, int]]] = {}
    for e in all_edges:
        inc.setdefault(e[0], set()).add(e)
        inc.setdefault(e[1], set()).add(e)
    H = {(s, d): _eh(s, d) for s, d in all_edges}
    status = {e: e in base_mat for e in all_edges}
    vtrue: dict[int, list[int]] = {}
    for e, st in status.items():
        if st:
            for v in e:
                vtrue.setdefault(v, []).append(H[e])
    dirty = set(batch_edges)
    rounds = 0
    recomputed = 0
    while dirty:
        rounds += 1
        recomputed += len(dirty)
        changed = []
        new_vals = {}
        for e in dirty:
            he = H[e]
            blocked = any(
                any(hh < he for hh in vtrue.get(v, ())) for v in e
            )
            new_s = not blocked
            if new_s != status[e]:
                new_vals[e] = new_s
                changed.append(e)
        dirty = set()
        for e in changed:
            he = H[e]
            status[e] = new_vals[e]
            for v in e:
                hs = vtrue.setdefault(v, [])
                old = list(hs)
                if new_vals[e]:
                    hs.append(he)
                else:
                    hs.remove(he)
                for f in inc[v]:
                    if f == e:
                        continue
                    hf = H[f]
                    po = any(hh < hf for hh in old)
                    pn = any(hh < hf for hh in hs)
                    if po != pn:
                        dirty.add(f)
    return {e for e, s in status.items() if s}, recomputed, rounds


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MID])
def test_matching_repair_replay_equals_cold(sf_dir):
    edges = _edges(sf_dir)
    base = [(s, d) for s, d in edges if (s + d) % _MI_MOD != 0]
    batch = [(s, d) for s, d in edges if (s + d) % _MI_MOD == 0]
    assert batch
    cold = _mat_cold(edges)
    warm, n_recomputed, rounds = _mat_repair(base, batch)
    assert warm == cold
    # Locality: measured 13% / 8.9% / 9.8% of |E| of total recompute
    # work at sf0.001/0.01/0.1, rounds 7/7/11 — bounds at ~2x headroom.
    assert n_recomputed <= 0.25 * len(edges)
    assert rounds <= 16


def test_matching_incremental_entry_matches_replay(spark):
    from graphdatabases_spark.relational import queries

    edges = _edges(SF_SMALL)
    base = [(s, d) for s, d in edges if (s + d) % _MI_MOD != 0]
    batch = [(s, d) for s, d in edges if (s + d) % _MI_MOD == 0]
    base_mat = _mat_cold(base)
    warm, _, _ = _mat_repair(base, batch)
    row = queries()["graph_matching_incremental"](spark, SF_SMALL).collect()[0]
    assert row["base_matching_size"] == len(base_mat)
    assert row["base_sum_ids"] == sum(s + d for s, d in base_mat)
    assert row["warm_matching_size"] == len(warm)
    assert row["warm_sum_ids"] == sum(s + d for s, d in warm)
    assert row["n_changed_edges"] == len(base_mat ^ warm)
    assert row["is_matching"] and row["maximal"] and row["converged"]


# ---------------------------------------------------------------------------
# Weighted b-matching: round kernel == sequential weight-greedy
# ---------------------------------------------------------------------------


def _bm_prio(s: int, d: int) -> tuple[int, int, int]:
    w = (s * 7 + d * 13) % 100 + 1
    return ((100 - w) * (1 << 48) + _h48(f"bmat{s}:{d}"), s, d)


def _bm_cold(edges, b=3):
    cap: dict[int, int] = {}
    taken = set()
    total_w = 0
    for _p, s, d in sorted(_bm_prio(s, d) for s, d in edges):
        if cap.get(s, b) > 0 and cap.get(d, b) > 0:
            taken.add((s, d))
            total_w += (s * 7 + d * 13) % 100 + 1
            cap[s] = cap.get(s, b) - 1
            cap[d] = cap.get(d, b) - 1
    return taken, total_w


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MID])
def test_bmatching_round_kernel_equals_sequential(sf_dir):
    """The round rule (rank <= remaining cap at BOTH endpoints) must
    reach exactly the sequential weight-greedy b-matching."""
    b = 3
    edges = _edges(sf_dir)
    seq, _ = _bm_cold(edges, b)
    caps: dict[int, int] = {}
    und = sorted(_bm_prio(s, d) + ((s * 7 + d * 13) % 100 + 1,)
                 for s, d in edges)
    taken = set()
    rounds = 0
    while und:
        rounds += 1
        rank: dict[tuple[int, int, int], int] = {}
        cnt: dict[int, int] = {}
        for _p, s, d, _w in und:
            for v in (s, d):
                cnt[v] = cnt.get(v, 0) + 1
                rank[(v, s, d)] = cnt[v]
        wins = [
            (p, s, d, w)
            for p, s, d, w in und
            if rank[(s, s, d)] <= caps.get(s, b)
            and rank[(d, s, d)] <= caps.get(d, b)
        ]
        assert wins, "round kernel stalled"
        for _p, s, d, _w in wins:
            taken.add((s, d))
            caps[s] = caps.get(s, b) - 1
            caps[d] = caps.get(d, b) - 1
        winset = {(s, d) for _p, s, d, _w in wins}
        und = [
            e
            for e in und
            if (e[1], e[2]) not in winset
            and caps.get(e[1], b) > 0
            and caps.get(e[2], b) > 0
        ]
    assert taken == seq
    assert rounds <= 8  # the oracle unroll bound (measured 3/4/5)


def test_bmatching_entry_matches_replay(spark):
    from graphdatabases_spark.relational import queries

    edges = _edges(SF_SMALL)
    seq, total_w = _bm_cold(edges, 3)
    row = queries()["graph_bmatching_greedy"](spark, SF_SMALL).collect()[0]
    assert row["bmatch_size"] == len(seq)
    assert row["total_weight"] == total_w
    assert row["sum_ids"] == sum(s + d for s, d in seq)
    assert row["feasible"] and row["maximal"] and row["converged"]
