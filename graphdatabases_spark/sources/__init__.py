"""Source/sink surface: typed readers and layout-aware writers."""

from graphdatabases_spark.sources.readers import (
    parse_json_column,
    read_csv,
    read_jsonl,
    read_orc,
    read_parquet,
    read_tsv_edges,
)
from graphdatabases_spark.sources.writers import (
    compact_parquet,
    write_bucketed,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
    write_range_sorted,
    write_zordered,
)

__all__ = [
    "compact_parquet",
    "parse_json_column",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "read_parquet",
    "read_tsv_edges",
    "write_bucketed",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_parquet",
    "write_range_sorted",
    "write_zordered",
]
