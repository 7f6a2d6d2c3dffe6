"""Deterministic graph generators as pure DataFrame expressions.

Spark-native forms of the reference's workload generators: the per-row
insert loops (``benchmark.py:103-165``) become single distributed jobs —
``spark.range`` + filtered projections, no driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.graph.model import PropertyGraph


def _default_vertices(ids: DataFrame) -> DataFrame:
    """Attach the reference's default labels/props (``labels=['test'],
    props={'name': 'test<i>'}`` — ``benchmark.py:111,157``)."""
    return ids.select(
        F.col("id"),
        F.array(F.lit("test")).alias("labels"),
        F.create_map(
            F.lit("name"), F.concat(F.lit("test"), F.col("id").cast("string"))
        ).alias("props"),
    )


def _default_edges(pairs: DataFrame) -> DataFrame:
    """Attach the reference's default edge labels/props (``benchmark.py:122,161-165``)."""
    return pairs.select(
        F.col("src"),
        F.col("dst"),
        F.array(F.lit("test")).alias("labels"),
        F.create_map(F.lit("test"), F.lit("test")).alias("props"),
    )


def grid_graph(spark: SparkSession, n: int = 150) -> PropertyGraph:
    """n×n directed grid (reference ``create_gird_graph``, ``benchmark.py:150-165``).

    Nodes ``0..n²-1``; edge ``i → i+1`` iff ``i % n != n-1`` (not right
    edge); edge ``i → i+n`` iff ``i < n²-n`` (not bottom row).
    |V| = n², |E| = 2n(n−1).
    """
    ids = spark.range(n * n).select(F.col("id"))
    right = (
        spark.range(n * n)
        .filter(F.col("id") % n != n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    down = (
        spark.range(n * n - n)
        .select(F.col("id").alias("src"), (F.col("id") + n).alias("dst"))
    )
    return PropertyGraph(_default_vertices(ids), _default_edges(right.union(down)))


def chain_graph(spark: SparkSession, n: int) -> PropertyGraph:
    """Chain 0 → 1 → … → n−1 (reference ``bench_add_single_edge``,
    ``benchmark.py:114-122``)."""
    ids = spark.range(n).select(F.col("id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return PropertyGraph(_default_vertices(ids), _default_edges(pairs))


def ring_graph(spark: SparkSession, n: int, skips: tuple[int, ...] = (1, 2)) -> PropertyGraph:
    """Ring with skip links: edge ``i → (i+s) % n`` for each s in ``skips``.

    With ``skips=(1, 2)`` every vertex closes a triangle (i, i+1, i+2) —
    the deterministic triangle-count fixture (SURVEY §5.2 analytics tests).
    """
    ids = spark.range(n).select(F.col("id"))
    pairs = None
    for s in skips:
        p = spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") + s) % n).alias("dst")
        )
        pairs = p if pairs is None else pairs.union(p)
    return PropertyGraph(_default_vertices(ids), _default_edges(pairs))
