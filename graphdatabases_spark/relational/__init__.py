from graphdatabases_spark.relational.catalog import (
    REGISTRY,
    QueryDef,
    queries,
    oracle_sql,
    register,
    table,
)

__all__ = ["REGISTRY", "QueryDef", "queries", "oracle_sql", "register", "table"]
