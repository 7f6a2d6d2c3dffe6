"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The query surface lives in ``graphdatabases_spark.relational`` — each
catalog entry pairs a Spark DataFrame program with its DuckDB oracle SQL
(see SURVEY.md §2.2 for the inventory).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from graphdatabases_spark import relational


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary on sf0.001."""
    qs = relational.queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return relational.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for ops whose
    values are engine-specific, e.g. HLL sketches — rows-only check)."""
    return relational.oracle_sql()
