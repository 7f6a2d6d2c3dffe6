"""Typed readers for every source format the engine ingests.

SURVEY §2.2 "Scans / sources / sinks": parquet, CSV/TSV (graph ingest,
O6/O8 — ``databases.py:129-137``, ``conv.py:6-16``), JSON lines, and
the streaming file source (streaming/windows.py). All readers take an
explicit schema — schema inference is a full extra pass over the data,
unacceptable at 100 TB and nondeterministic across samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    *,
    merge_schema: bool = False,
    ignore_corrupt: bool = False,
) -> DataFrame:
    """Parquet scan; pass ``columns`` to make the projection explicit at
    the source (Catalyst prunes anyway once a select appears downstream,
    but an explicit projection documents intent and survives refactors).

    ``merge_schema``: union the schemas of all footers instead of
    trusting the first file — the read side of schema evolution (a
    long-lived 100 TB table accretes columns; files written before a
    column existed surface it as null). Off by default because footer
    merging lists every file up front.

    ``ignore_corrupt``: skip unreadable files instead of failing the
    whole scan (per-task, via ``spark.sql.files.ignoreCorruptFiles``)
    — the operational posture for petabyte directories where one torn
    upload must not kill a full-table job. Off by default: silently
    dropping data is a per-job decision, never a library default."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    if ignore_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    df = reader.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    sep: str = ",",
    header: bool = False,
    comment: str | None = None,
) -> DataFrame:
    """CSV/TSV scan with mandatory schema. ``comment`` skips prefixed
    lines — the reference's ``#``-comment convention in edge TSVs
    (``conv.py:8``)."""
    reader = spark.read.schema(schema).option("sep", sep).option("header", header)
    if comment:
        reader = reader.option("comment", comment)
    return reader.csv(path)


def read_tsv_edges(spark: SparkSession, path: str) -> DataFrame:
    """Directed edge list ``src\\tdst`` with ``#`` comments — the
    Wiki-Vote format (``data_sets/Wiki-VoteE.txt``)."""
    return read_csv(spark, path, "src LONG, dst LONG", sep="\t", comment="#")


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC scan — like parquet, a columnar format with predicate
    pushdown and column pruning; common as the interchange format of
    Hive-era warehouses."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def parse_json_column(df: DataFrame, col: str, schema: str, out: str | None = None) -> DataFrame:
    """Promote an embedded JSON string column (e.g. ``events.props``)
    to a typed struct via ``from_json`` — stays JVM-side, no UDF."""
    return df.withColumn(out or col, F.from_json(F.col(col), schema))
