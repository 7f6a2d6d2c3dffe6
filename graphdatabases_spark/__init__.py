"""graphdatabases_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the public
``eragon2404/GraphDatabases`` property-graph workload suite (graph CRUD,
k-hop traversal, shortest path, bulk load, benchmark harness — see
SURVEY.md) on idiomatic Spark: the property graph is a pair of typed
DataFrames, traversals are checkpointed iterative joins (GraphX/Pregel
spirit), and the engine adds a full relational/streaming surface plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.
"""

from graphdatabases_spark.session import get_spark
from graphdatabases_spark.graph.model import PropertyGraph, VERTEX_SCHEMA, EDGE_SCHEMA

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "PropertyGraph",
    "VERTEX_SCHEMA",
    "EDGE_SCHEMA",
]
