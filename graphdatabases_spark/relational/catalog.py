"""Query catalog: the engine's declared query surface (SURVEY §2.2).

Every entry pairs a Spark DataFrame program with (where expressible) an
equivalent ANSI-SQL oracle that DuckDB runs on the same parquet tables —
the driver's correctness gate hash-compares the two at sf0.01.

Determinism discipline (FIXTURES.md §C):

- every query ends with a fully-specified ORDER BY over a unique key list
- doubles rounded via ``round(x, 6)`` (or coarser where noted)
- money aggregations sum as DECIMAL(18,4) then cast to double — double
  summation order differs between engines and across partitionings, so
  decimal sums are the only representation that hash-matches exactly AND
  stays deterministic on a 1000-executor cluster
- timestamps rendered as ``yyyy-MM-dd HH:mm:ss`` strings (UTC session)
- avg = decimal-sum cast to double / count (engine-identical division)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator adding a query to the catalog."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, doc)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet scan → Catalyst gets pushdown,
    pruning, and row-group skipping for free.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark reads only as
    a long (``spark.sql.legacy.parquet.nanosAsLong``); convert to a
    microsecond timestamp here so the schema matches FIXTURES.md.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
    return df


def _load_all() -> None:
    # Import side-effect modules that populate REGISTRY.
    from graphdatabases_spark.relational import (  # noqa: F401
        core_queries,
        tpch_queries,
        graph_queries,
        llm_queries,
        streaming_queries,
        udf_queries,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
