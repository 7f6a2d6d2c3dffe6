"""Golden tests on the reference's real dataset (SURVEY §5.2.1).

Wiki-Vote ships with the reference repo as the ingest benchmark fixture
(``data_sets/Wiki-VoteN.txt`` / ``Wiki-VoteE.txt``, loaded by
``databases.py:129-137``; |V| = 7,115, |E| = 103,689). These tests use
the published data files only (public SNAP dataset) — no reference code.

Covered here:
- O6 bulk load: exact node/edge counts.
- O8 node derivation (``conv.py`` semantics): distinct endpoints of the
  edge file reproduce the node file as a set.
- k-hop from node 30 (first id in the node file): counts frozen against
  a DuckDB bounded recursive-CTE oracle computed on the same TSV.
- ssp distance spot checks vs the same oracle.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from graphdatabases_spark.graph.io import (
    derive_nodes_from_edges,
    load_graph_files,
    read_edge_tsv,
    read_node_file,
)
from graphdatabases_spark.graph.traversal import bfs_distances, khop

NODES = "/root/reference/data_sets/Wiki-VoteN.txt"
EDGES = "/root/reference/data_sets/Wiki-VoteE.txt"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(NODES) and os.path.exists(EDGES)),
    reason="Wiki-Vote dataset not available",
)


@pytest.fixture(scope="module")
def wiki(spark):
    g = load_graph_files(spark, NODES, EDGES)
    g.edges.persist().count()
    yield g
    g.edges.unpersist()


def _oracle_dists(max_hops: int, src: int = 30) -> dict[int, int]:
    con = duckdb.connect()
    con.sql(
        f"""
        CREATE VIEW e AS
        SELECT src, dst
        FROM read_csv('{EDGES}', sep='\t', header=false,
                      names=['src','dst'], column_types={{'src':'BIGINT','dst':'BIGINT'}})
        """
    )
    rows = con.sql(
        f"""
        WITH RECURSIVE walk(id, d) AS (
          SELECT CAST({src} AS BIGINT), 0
          UNION ALL
          SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.id
          WHERE w.d < {max_hops}
        )
        SELECT id, min(d) FROM walk GROUP BY id
        """
    ).fetchall()
    return {int(i): int(d) for i, d in rows}


class TestWikiVoteIngest:
    def test_counts(self, wiki):
        assert wiki.vertices.count() == 7115
        assert wiki.edges.count() == 103689

    def test_node_derivation_matches_node_file(self, spark):
        derived = derive_nodes_from_edges(read_edge_tsv(spark, EDGES))
        from_file = read_node_file(spark, NODES)
        # conv.py derives the node file FROM the edge file, so the
        # distinct endpoint set must reproduce it exactly.
        assert derived.count() == from_file.distinct().count()
        assert derived.exceptAll(from_file).count() == 0
        assert from_file.exceptAll(derived).count() == 0

    def test_load_applies_reference_labels_and_props(self, wiki):
        row = wiki.vertices.limit(1).collect()[0]
        assert row["labels"] == ["test"]
        assert row["props"] == {"test": "test"}


class TestWikiVoteTraversal:
    def test_khop_from_first_node_vs_oracle(self, wiki):
        oracle = _oracle_dists(max_hops=2)
        expect = {i for i, d in oracle.items() if 1 <= d <= 2}
        got = {r["id"] for r in khop(wiki, 30, 2).collect()}
        assert got == expect

    def test_bfs_distance_histogram_vs_oracle(self, wiki):
        oracle = _oracle_dists(max_hops=3)
        got = {
            r["id"]: r["dist"]
            for r in bfs_distances(wiki, 30, max_hops=3).collect()
        }
        assert got == oracle

    def test_distributed_matches_local(self, wiki):
        loc = {r["id"] for r in khop(wiki, 30, 2, strategy="local").collect()}
        dist = {
            r["id"] for r in khop(wiki, 30, 2, strategy="distributed").collect()
        }
        assert loc == dist
