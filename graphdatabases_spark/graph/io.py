"""Graph ingest/egress: reference file formats + Parquet layout.

Reference ingest formats (``databases.py:129-137``, ``conv.py:6-16``):
node-id-per-line text file, tab-separated ``src\\tdst`` edge list with
``#``-prefixed comment lines. The reference loads these one INSERT
round-trip per line (16-26 min for Wiki-Vote, SURVEY §6); here each load
is a single distributed read + write.

Parquet layout for 100 TB (SURVEY §4.3.2): ``edges`` written
repartitioned+sorted by ``src`` so BFS expansion joins co-locate; an
optional mirror sorted by ``dst`` supports reverse traversal without a
shuffle. With a Hive metastore available, ``bucketBy('src')`` on a saved
table removes the shuffle entirely; path-based Parquet keeps the layout
benefit via repartition+sortWithinPartitions (min/max row-group skipping
on ``src``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.graph.model import EDGE_SCHEMA, VERTEX_SCHEMA, PropertyGraph


def read_edge_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``src\\tdst`` TSV edge list, skipping ``#`` comment lines."""
    return (
        spark.read.schema("src LONG, dst LONG")
        .options(sep="\t", comment="#")
        .csv(path)
    )


def read_node_file(spark: SparkSession, path: str) -> DataFrame:
    """Read a node-id-per-line file."""
    return spark.read.schema("id LONG").csv(path)


def load_graph_files(
    spark: SparkSession, path_nodes: str, path_edges: str
) -> PropertyGraph:
    """Bulk load (reference ``load_database``, ``databases.py:129-137``).

    Every row gets the reference's fixed ``labels=['test'],
    props={'test': 'test'}`` (``databases.py:133,137``); the per-line
    insert loop becomes one distributed job.
    """
    nodes = read_node_file(spark, path_nodes).select(
        F.col("id"),
        F.array(F.lit("test")).alias("labels"),
        F.create_map(F.lit("test"), F.lit("test")).alias("props"),
    )
    edges = read_edge_tsv(spark, path_edges).select(
        F.col("src"),
        F.col("dst"),
        F.array(F.lit("test")).alias("labels"),
        F.create_map(F.lit("test"), F.lit("test")).alias("props"),
    )
    return PropertyGraph(nodes, edges)


def derive_nodes_from_edges(edges: DataFrame) -> DataFrame:
    """Distinct endpoint ids of an edge list (reference ``conv.py:6-16``):
    project → explode → distinct."""
    return (
        edges.select(F.explode(F.array(F.col("src"), F.col("dst"))).alias("id"))
        .distinct()
    )


def write_graph(
    graph: PropertyGraph,
    path: str,
    mode: str = "overwrite",
    partitions: int | None = None,
    mirror_by_dst: bool = False,
) -> None:
    """Persist a graph as two Parquet tables under ``path``.

    Edges are clustered by ``src`` (repartition + sort-within-partitions)
    so traversal joins read co-located, ``src``-skippable row groups.
    """
    graph.vertices.write.mode(mode).parquet(f"{path}/vertices")
    e = graph.edges
    if partitions:
        e = e.repartition(partitions, "src")
    else:
        e = e.repartition("src")
    e.sortWithinPartitions("src").write.mode(mode).parquet(f"{path}/edges")
    if mirror_by_dst:
        m = graph.edges.repartition(partitions, "dst") if partitions else graph.edges.repartition("dst")
        m.sortWithinPartitions("dst").write.mode(mode).parquet(f"{path}/edges_by_dst")


def read_graph(spark: SparkSession, path: str) -> PropertyGraph:
    return PropertyGraph(
        vertices=spark.read.parquet(f"{path}/vertices"),
        edges=spark.read.parquet(f"{path}/edges"),
    )
