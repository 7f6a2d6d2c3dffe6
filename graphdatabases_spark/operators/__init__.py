from graphdatabases_spark.operators.asof import asof_join
from graphdatabases_spark.operators.skew import salted_join

__all__ = ["asof_join", "salted_join"]
