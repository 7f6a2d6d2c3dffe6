from graphdatabases_spark.graph.model import PropertyGraph, VERTEX_SCHEMA, EDGE_SCHEMA
from graphdatabases_spark.graph.generators import grid_graph, chain_graph, ring_graph
from graphdatabases_spark.graph.traversal import khop, bfs_distances, ssp
from graphdatabases_spark.graph.api import GraphEngine

__all__ = [
    "PropertyGraph",
    "VERTEX_SCHEMA",
    "EDGE_SCHEMA",
    "grid_graph",
    "chain_graph",
    "ring_graph",
    "khop",
    "bfs_distances",
    "ssp",
    "GraphEngine",
]
