"""Golden tests for the traversal kernel on deterministic graphs.

Closed-form ground truths from FIXTURES.md §A / SURVEY §5.2:
- grid(n): |V|=n², |E|=2n(n−1); k-hop from node 0 = h(h+3)/2 for h<n
  (root excluded); ssp distance node 1 → node (n+1)k = 2k−1.
- chain(n): khop(i,h) = {i+1..min(i+h,n−1)}; dist(a,b) = b−a.
"""

from __future__ import annotations

import pytest

from graphdatabases_spark.graph.generators import chain_graph, grid_graph, ring_graph
from graphdatabases_spark.graph.traversal import bfs_distances, khop, ssp


@pytest.mark.parametrize("strategy", ["local", "distributed"])
class TestKhop:
    def test_grid_counts(self, spark, strategy):
        n = 12
        g = grid_graph(spark, n)
        assert g.num_vertices() == n * n
        assert g.num_edges() == 2 * n * (n - 1)
        for h in (1, 2, 5):
            got = khop(g, 0, h, strategy=strategy).count()
            assert got == h * (h + 3) // 2, f"h={h}"

    def test_chain(self, spark, strategy):
        g = chain_graph(spark, 10)
        ids = sorted(r["id"] for r in khop(g, 3, 4, strategy=strategy).collect())
        assert ids == [4, 5, 6, 7]
        # Beyond the end of the chain: truncated.
        ids = sorted(r["id"] for r in khop(g, 7, 5, strategy=strategy).collect())
        assert ids == [8, 9]

    def test_root_excluded_acyclic(self, spark, strategy):
        g = chain_graph(spark, 5)
        ids = {r["id"] for r in khop(g, 0, 4, strategy=strategy).collect()}
        assert 0 not in ids

    def test_root_included_via_cycle(self, spark, strategy):
        # Ring 0→1→2→0: root re-reached at depth 3.
        g = ring_graph(spark, 3, skips=(1,))
        ids = {r["id"] for r in khop(g, 0, 3, strategy=strategy).collect()}
        assert ids == {0, 1, 2}
        ids = {r["id"] for r in khop(g, 0, 2, strategy=strategy).collect()}
        assert ids == {1, 2}

    def test_include_root_flag(self, spark, strategy):
        g = chain_graph(spark, 5)
        ids = {r["id"] for r in khop(g, 0, 2, include_root=True, strategy=strategy).collect()}
        assert ids == {0, 1, 2}


@pytest.mark.parametrize("strategy", ["local", "distributed"])
class TestSsp:
    def test_grid_diagonal(self, spark, strategy):
        # Reference bench_spp invariant (benchmark.py:181-190): on the n-grid,
        # dist(node 1 → node (n+1)k) = 2k−1.
        n = 12
        g = grid_graph(spark, n)
        for k in (1, 3, 5):
            rows = ssp(g, 1, (n + 1) * k, strategy=strategy).collect()
            assert len(rows) == 1
            assert rows[0]["dist"] == 2 * k - 1
            path = rows[0]["path"]
            assert len(path) == 2 * k
            assert path[0] == 1 and path[-1] == (n + 1) * k
            # Every step is a real grid edge (+1 or +n).
            for a, b in zip(path, path[1:]):
                assert b - a in (1, n)

    def test_chain_dist(self, spark, strategy):
        g = chain_graph(spark, 20)
        rows = ssp(g, 2, 15, strategy=strategy).collect()
        assert rows[0]["dist"] == 13
        assert rows[0]["path"] == list(range(2, 16))

    def test_unreachable(self, spark, strategy):
        g = chain_graph(spark, 5)
        assert ssp(g, 3, 0, strategy=strategy).count() == 0

    def test_same_node(self, spark, strategy):
        g = chain_graph(spark, 5)
        rows = ssp(g, 2, 2, strategy=strategy).collect()
        assert rows[0]["dist"] == 0 and rows[0]["path"] == [2]

    def test_lexicographic_path_deterministic(self, spark, strategy):
        # Grid has many shortest paths; both strategies must return the
        # lexicographically-smallest one.
        n = 8
        g = grid_graph(spark, n)
        rows = ssp(g, 0, n + 1, strategy=strategy).collect()
        assert rows[0]["dist"] == 2
        assert rows[0]["path"] == [0, 1, n + 1]


def test_strategies_agree(spark):
    g = grid_graph(spark, 9)
    a = sorted(r["id"] for r in khop(g, 0, 4, strategy="local").collect())
    b = sorted(r["id"] for r in khop(g, 0, 4, strategy="distributed").collect())
    assert a == b


def test_distributed_ssp_one_action_per_round(spark, monkeypatch):
    """Each distributed BFS round must issue exactly ONE explicit action
    (the fused count+destination-probe aggregate collect) — the earlier
    shape ran a count() AND a filtered collect() per hop, serializing
    two job launches. Pin the code shape by counting DataFrame.count /
    .collect invocations during the traversal (checkpoint/persist
    materializations are internal and not counted here)."""
    from pyspark.sql import DataFrame

    g = chain_graph(spark, 10)
    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = DataFrame.count, DataFrame.collect

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counting_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    monkeypatch.setattr(DataFrame, "count", counting_count)
    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    rows = ssp(g, 0, 8, strategy="distributed").collect()
    assert rows[0]["dist"] == 8
    # 8 rounds -> 8 probe collects; constant slack for setup
    # (edge-side materialization probe) and the final result collect.
    assert calls["collect"] <= 8 + 3, calls
    assert calls["count"] <= 2, calls


def test_bfs_distances(spark):
    g = chain_graph(spark, 6)
    rows = {r["id"]: r["dist"] for r in bfs_distances(g, 0, strategy="local").collect()}
    assert rows == {i: i for i in range(6)}


class TestLocalResultConstruction:
    """_local_result_df's three construction paths (SQL literal for
    tiny integral rows, Arrow batch, plain list) must be value-
    interchangeable — the round-8 literal fast path is an optimization,
    never a semantics change."""

    def test_literal_path_matches_arrow_path(self, spark):
        from graphdatabases_spark.graph.traversal import (
            PATH_SCHEMA,
            _local_result_df,
        )

        # Exactly ONE integral row → the SQL-literal path (ADVICE r8
        # narrowed it from <=4: a multi-row UNION ALL of literal
        # SELECTs has no contractual row order).
        one = [(259, list(range(260)))]
        lit = [
            (r["dist"], r["path"])
            for r in _local_result_df(spark, one, PATH_SCHEMA).collect()
        ]
        # Multi-row integral input → the Arrow path; same values.
        rows_big = [(7, [1, 2, 3]), (0, [9])] + one
        arrow = sorted(
            (r["dist"], r["path"])
            for r in _local_result_df(spark, rows_big, PATH_SCHEMA).collect()
        )
        assert lit == [t for t in arrow if t[0] == 259]
        df = _local_result_df(spark, one, PATH_SCHEMA)
        assert df.schema == PATH_SCHEMA or [
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        ] == [(f.name, f.dataType.simpleString()) for f in PATH_SCHEMA.fields]

    def test_literal_path_handles_empty_arrays(self, spark):
        from graphdatabases_spark.graph.traversal import (
            PATH_SCHEMA,
            _local_result_df,
        )

        rows = [(0, [])]  # split('') would yield [NULL]; must be []
        got = _local_result_df(spark, rows, PATH_SCHEMA).collect()
        assert got[0]["dist"] == 0 and got[0]["path"] == []

    def test_non_integral_rows_fall_back(self, spark):
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        from graphdatabases_spark.graph.traversal import _local_result_df

        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("xs", ArrayType(DoubleType()), False),
            ]
        )
        got = _local_result_df(spark, [(1, [0.5, 1.5])], schema).collect()
        assert got[0]["id"] == 1 and got[0]["xs"] == [0.5, 1.5]
